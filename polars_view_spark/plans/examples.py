"""Schema-driven SQL example generator — functional port of the
reference's generator (reference: src/sqls.rs:561-628 drivers, 62-72
nth-column-by-dtype, 15-49 generated-name filter).

Given the current schema it picks representative string / integer / float /
temporal columns (skipping names the app itself generates) and emits ~20
parametrized example statements demonstrating the supported dialect — the
de-facto spec of SURVEY.md §2C.
"""

from __future__ import annotations

from pyspark.sql import types as T

DEFAULT_QUERY = "-- Select all columns and rows\nSELECT *\nFROM {table};"

#: substrings of generated/aggregate column names to skip when picking
#: example source columns (reference: src/sqls.rs:15-31)
COLS_FILTER_OUT = (
    "Row Number",
    "Average",
    "Frequency",
    "Total",
    "As Float",
    "Category",
    "Calculation Result",
    "Row Count",
    "Unique Values",
    "Minimum",
    "Maximum",
    "New Name for",
    "+ 10%",
    "DMY (day/month/year)",
)


def _is_filtered(name: str) -> bool:
    trimmed = name.strip()
    return not trimmed or any(sub in trimmed for sub in COLS_FILTER_OUT)


def _nth_by_type(schema: T.StructType, n: int, pred) -> str | None:
    hits = [f.name for f in schema.fields if not _is_filtered(f.name) and pred(f.dataType)]
    return hits[n] if n < len(hits) else None


def _q(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def generate_sql_examples(schema: T.StructType, table: str = "AllData") -> list[str]:
    """Emit example statements tailored to ``schema`` (empty-safe: examples
    requiring a column type the schema lacks are skipped, like the
    reference)."""
    is_str = lambda dt: isinstance(dt, T.StringType)
    is_int = lambda dt: isinstance(
        dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    )
    is_float = lambda dt: isinstance(dt, (T.FloatType, T.DoubleType))
    is_date = lambda dt: isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType))
    any_type = lambda dt: True

    s1 = _nth_by_type(schema, 0, is_str)
    i1 = _nth_by_type(schema, 0, is_int)
    f1 = _nth_by_type(schema, 0, is_float)
    d1 = _nth_by_type(schema, 0, is_date)
    c1 = _nth_by_type(schema, 0, any_type)
    c2 = _nth_by_type(schema, 1, any_type)
    c3 = _nth_by_type(schema, 2, any_type)

    out: list[str] = [DEFAULT_QUERY.format(table=table)]

    def add(comment: str, sql: str) -> None:
        out.append(f"-- {comment}\n{sql}")

    add("Limit the number of returned rows", f"SELECT *\nFROM {table}\nLIMIT 100;")
    if c1 and c2:
        add(
            "Select specific columns (quote names with spaces)",
            f"SELECT\n    {_q(c1)},\n    {_q(c2)}\nFROM {table};",
        )
    if c1 and c3:
        add(
            "Select all columns EXCEPT specific ones",
            f"SELECT *\nEXCEPT (\n    {_q(c1)},\n    {_q(c3)}\n)\nFROM {table};",
        )
    if c1 and c2:
        add(
            "Rename columns while preserving order",
            f"SELECT *\nRENAME (\n    {_q(c1)} AS {_q('New Name for ' + c1)},\n"
            f"    {_q(c2)} AS {_q('New Name for ' + c2)}\n)\nFROM {table};",
        )
    if f1:
        add(
            "Replace values in a column with a calculation (increase by 10%)",
            f"SELECT *\nREPLACE (\n    {_q(f1)} * 1.1\n    AS\n    {_q(f1)}\n)\nFROM {table};",
        )
    if f1 and i1:
        add(
            "Add a NEW calculated column",
            f"SELECT *,\n       {_q(f1)} * {_q(i1)}\n       AS\n       "
            f"{_q('Calculation Result')}\nFROM {table};",
        )
    if c1 and c2 and f1:
        add(
            "Except, Replace and Rename combined",
            f"SELECT *\nEXCEPT ({_q(c1)})\nREPLACE (\n    {_q(f1)} * 1.1\n    AS\n    "
            f"{_q(f1)}\n)\nRENAME (\n    {_q(f1)} AS {_q(f1 + ' + 10%')}\n)\nFROM {table};",
        )
    if i1:
        add(
            "Explicitly CAST an integer column to FLOAT",
            f"SELECT *,\n    CAST({_q(i1)} AS DOUBLE) AS {_q(i1 + ' As Float')}\nFROM {table};",
        )
    if f1:
        add(
            "Categorize values with CASE WHEN",
            f"SELECT *,\n    CASE WHEN {_q(f1)} > 100 THEN 'High'\n"
            f"         WHEN {_q(f1)} > 10 THEN 'Medium'\n"
            f"         ELSE 'Low' END AS {_q('Category')}\nFROM {table};",
        )
    if s1:
        add(
            "Filter rows where a string column is NULL",
            f"SELECT *\nFROM {table}\nWHERE {_q(s1)} IS NULL;",
        )
        add(
            "Filter rows where a string column is NOT NULL",
            f"SELECT *\nFROM {table}\nWHERE {_q(s1)} IS NOT NULL;",
        )
        add(
            "Filter with LIKE (case-sensitive) and ILIKE (case-insensitive)",
            f"SELECT *\nFROM {table}\nWHERE {_q(s1)} LIKE 'Prefix%'\n"
            f"   OR {_q(s1)} ILIKE '%suffix';",
        )
        add(
            "Filter with IN over a list of values",
            f"SELECT *\nFROM {table}\nWHERE {_q(s1)} IN ('value1', 'value2');",
        )
    if f1:
        add(
            "Filter with comparison operators (=, >, <, >=, <=, !=) and BETWEEN",
            f"SELECT *\nFROM {table}\nWHERE {_q(f1)} BETWEEN 10 AND 1000;",
        )
    if f1 and s1:
        add(
            "Combine filters with AND / OR and parentheses",
            f"SELECT *\nFROM {table}\nWHERE ({_q(f1)} > 100 AND {_q(s1)} IS NOT NULL)\n"
            f"   OR {_q(f1)} < 0;",
        )
    if c1 and c2:
        add(
            "Sort by multiple columns with precedence",
            f"SELECT *\nFROM {table}\nORDER BY\n    {_q(c1)} ASC,\n    {_q(c2)} DESC;",
        )
    if s1:
        add(
            "Count rows per group",
            f"SELECT\n    {_q(s1)},\n    COUNT(*) AS {_q('Row Count')}\nFROM {table}\n"
            f"GROUP BY {_q(s1)}\nORDER BY {_q('Row Count')} DESC;",
        )
        add(
            "Count DISTINCT values",
            f"SELECT\n    COUNT(DISTINCT {_q(s1)}) AS {_q('Unique Values')}\nFROM {table};",
        )
        add("Unique values of a column", f"SELECT DISTINCT {_q(s1)}\nFROM {table};")
    if s1 and f1:
        add(
            "Sum per group",
            f"SELECT\n    {_q(s1)},\n    SUM({_q(f1)}) AS {_q('Total')}\nFROM {table}\n"
            f"GROUP BY {_q(s1)}\nORDER BY {_q('Total')} DESC;",
        )
        add(
            "All basic aggregations at once",
            f"SELECT\n    {_q(s1)},\n    COUNT(*) AS {_q('Frequency')},\n"
            f"    SUM({_q(f1)}) AS {_q('Total')},\n    AVG({_q(f1)}) AS {_q(f1 + ' Average')},\n"
            f"    MIN({_q(f1)}) AS {_q('Minimum')},\n    MAX({_q(f1)}) AS {_q('Maximum')}\n"
            f"FROM {table}\nGROUP BY {_q(s1)}\nORDER BY {_q('Frequency')} DESC;",
        )
        add(
            "Filter groups with HAVING on an aggregate alias",
            f"SELECT\n    {_q(s1)},\n    AVG({_q(f1)}) AS {_q(f1 + ' Average')}\n"
            f"FROM {table}\nGROUP BY {_q(s1)}\n"
            f"HAVING {_q(f1 + ' Average')} > 1000;",
        )
    if d1:
        add(
            "Format a date column as day/month/year with STRFTIME",
            f"SELECT *,\n    STRFTIME({_q(d1)}, '%d/%m/%Y') AS "
            f"{_q('DMY (day/month/year)')}\nFROM {table};",
        )
    return out
