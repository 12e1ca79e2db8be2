"""CLI surface — flag-for-flag parity with the reference
(reference: src/args.rs:52-175):

    polars-view-spark [FILE] -d DELIM -e -f REGEX -n NULLS -q SQL -r REGEX -t TABLE

Headless by design (the reference is a GUI viewer; this CLI prints the
table / writes the result), plus ``--save`` / ``--format`` / ``--limit``
for scripted use.
"""

from __future__ import annotations

import argparse
import sys

from polars_view_spark.config import (
    DEFAULT_CSV_DELIMITER,
    DEFAULT_TABLE_NAME,
    LoadConfig,
    validate_pattern,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="polars-view-spark",
        description="PySpark-native viewer/query engine with polars-view capabilities",
    )
    p.add_argument("path", nargs="?", help="Path to data file (CSV/JSON/NDJSON/Parquet)")
    p.add_argument(
        "-d",
        "--delimiter",
        default=DEFAULT_CSV_DELIMITER,
        help="CSV delimiter character (auto-sniffed if wrong)",
    )
    p.add_argument(
        "-e",
        "--exclude-null-cols",
        action="store_true",
        help="Exclude columns containing only null values",
    )
    p.add_argument(
        "-f",
        "--force-string-cols",
        metavar="REGEX",
        help="Regex matching columns to force read as String ('*' or '^…$')",
    )
    p.add_argument(
        "-n",
        "--null-values",
        default='"", <N/D>',
        help="Comma-separated values interpreted as NULL",
    )
    p.add_argument("-q", "--query", help="SQL query to apply to loaded data")
    p.add_argument(
        "-r",
        "--regex",
        metavar="REGEX",
        dest="normalize_regex",
        help="Normalize Euro-style number strings in matching columns to Double",
    )
    p.add_argument(
        "-t",
        "--table-name",
        default=DEFAULT_TABLE_NAME,
        help="Table name for SQL queries [default: AllData]",
    )
    p.add_argument("--drop", metavar="REGEX", help="Drop columns matching regex")
    p.add_argument("--row-index", action="store_true", help="Add a row index column")
    p.add_argument("--limit", type=int, default=50, help="Rows to print [default: 50]")
    p.add_argument("--save", metavar="PATH", help="Write the result to PATH (format by extension)")
    p.add_argument("--examples", action="store_true", help="Print generated SQL examples and exit")
    return p


def config_from_args(ns: argparse.Namespace) -> LoadConfig:
    for pat in (ns.force_string_cols, ns.normalize_regex, ns.drop):
        if pat:
            validate_pattern(pat)
    return LoadConfig(
        path=ns.path or "",
        table_name=ns.table_name,
        csv_delimiter=ns.delimiter,
        null_values=tuple(s.strip() for s in ns.null_values.split(",")),
        force_string_patterns=ns.force_string_cols,
        exclude_null_cols=ns.exclude_null_cols,
        apply_sql=bool(ns.query),
        query=ns.query or "SELECT * FROM AllData;",
        normalize=bool(ns.normalize_regex),
        normalize_regex=ns.normalize_regex,
        drop=bool(ns.drop),
        drop_regex=ns.drop,
        add_row_index=ns.row_index,
    )


def main(argv: list[str] | None = None) -> int:
    ns = build_parser().parse_args(argv)
    if not ns.path:
        build_parser().print_help()
        return 2

    from polars_view_spark.container import DataContainer
    from polars_view_spark.session import get_spark

    spark = get_spark("polars_view_spark_cli")
    cfg = config_from_args(ns)
    container = DataContainer.load_data(spark, cfg)

    if ns.examples:
        from polars_view_spark.plans.examples import generate_sql_examples

        for ex in generate_sql_examples(container.df.schema, cfg.table_name):
            print(ex)
            print()
        return 0

    rows, cols = container.shape()
    container.df.show(ns.limit, truncate=False)
    print(f"[{rows} rows x {cols} cols]", file=sys.stderr)

    if ns.save:
        from polars_view_spark.sources.writers import save_as

        fmt = save_as(container.df, ns.save, csv_delimiter=cfg.csv_delimiter)
        print(f"saved {ns.save} ({fmt})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
