"""End-to-end property fuzz of the dialect shim: hundreds of generated
EXCEPT / RENAME / REPLACE / STRFTIME / quoting combinations over a mixed
schema, each executed on Spark through ``rewrite_query`` and compared
value-for-value against DuckDB running an independently derived plain-SQL
projection.

The shim is the highest-traffic custom string code in the repo and its
failure mode — a silent mis-rewrite — is the worst kind: the query *runs*
and returns the wrong columns.  The oracle here re-implements the modifier
semantics directly in the generator (drop EXCEPT columns, substitute
REPLACE expressions, apply RENAME, preserve original column order), so a
rewriter bug and an oracle bug would have to coincide to pass.
"""

import random

import duckdb
import pandas as pd
import pytest

from tests.oracle_util import compare

#: (name, needs_quoting, kind) — mixed-case, space-bearing, and plain
COLUMNS = [
    ("k", False, "int"),
    ("a", False, "int"),
    ("b", False, "double"),
    ("c", False, "string"),
    ("Col D", True, "string"),
    ("e_ts", False, "ts"),
    ("F", False, "int"),
]

REPLACE_TEMPLATES = {
    "int": ["{q} + 1", "ABS({q})", "CAST({q} AS BIGINT) * 2"],
    "double": ["ROUND({q} * 2, 1)", "COALESCE({q}, 0.5)"],
    "string": ["UPPER({q})", "COALESCE({q}, 'zz')", "SUBSTR({q}, 1, 2)"],
    "ts": ["STRFTIME({q}, '%Y-%m-%d')", "STRFTIME({q}, '%d/%m/%Y %H:%M')"],
}

RENAME_POOL = ["r_one", "renamed col", "X2", "outcol"]

WHERE_POOL = [None, "k > 2", "a IS NOT NULL", "k % 2 = 0"]


def _fixture_frame() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "k": [1, 2, 3, 4, 5, 6],
            "a": pd.array([10, None, -3, 7, None, 0], dtype="Int64"),
            "b": [1.5, 2.25, None, -0.75, 3.125, None],
            "c": ["alpha", None, "Beta", "", "γmma", "delta"],
            "Col D": ["x", "y", None, "x y", "Z", "q"],
            "e_ts": pd.to_datetime(
                [
                    "2024-01-15 10:30:00",
                    "2024-06-01 00:00:00",
                    "2023-12-31 23:59:00",
                    "2024-02-29 12:00:00",
                    "2025-07-04 07:45:00",
                    "2024-11-05 18:05:00",
                ]
            ),
            "F": [100, 200, 300, 400, 500, 600],
        }
    )


def _ident(name: str, quoted: bool) -> str:
    return f'"{name}"' if quoted else name


def _gen_case(rng: random.Random):
    """One generated case: (dialect_query, expected_duckdb_sql)."""
    names = [c[0] for c in COLUMNS]
    kinds = {c[0]: c[2] for c in COLUMNS}
    must_quote = {c[0] for c in COLUMNS if c[1]}

    def q(name: str) -> str:
        # quote when required; otherwise quote at random to fuzz the lexer
        return _ident(name, name in must_quote or rng.random() < 0.4)

    candidates = [n for n in names if n != "k"]
    except_cols = rng.sample(candidates, rng.randint(0, 2))
    remaining = [n for n in candidates if n not in except_cols]
    replace_cols = rng.sample(remaining, rng.randint(0, min(2, len(remaining))))
    replace_exprs = {
        col: rng.choice(REPLACE_TEMPLATES[kinds[col]]).format(q=q(col))
        for col in replace_cols
    }
    rename_cols = rng.sample(remaining, rng.randint(0, min(2, len(remaining))))
    rename_map = {}
    for col, new in zip(rename_cols, rng.sample(RENAME_POOL, len(rename_cols))):
        rename_map[col] = new
    where = rng.choice(WHERE_POOL)

    parts = ["SELECT *"]
    if except_cols:
        parts.append(f"EXCEPT ({', '.join(q(cn) for cn in except_cols)})")
    if replace_exprs:
        parts.append(
            "REPLACE ("
            + ", ".join(f"{e} AS {q(cn)}" for cn, e in replace_exprs.items())
            + ")"
        )
    if rename_map:
        parts.append(
            "RENAME ("
            + ", ".join(
                f"{q(cn)} AS {_ident(new, True)}" for cn, new in rename_map.items()
            )
            + ")"
        )
    parts.append("FROM AllData")
    if where:
        parts.append(f"WHERE {where}")
    query = " ".join(parts)

    # independently derived expectation: original order, EXCEPT dropped,
    # REPLACE substituted, RENAME applied
    out_items = []
    for col in names:
        if col in except_cols:
            continue
        expr = replace_exprs.get(col, f'"{col}"')
        out = rename_map.get(col, col)
        out_items.append(f'{expr} AS "{out}"')
    expected = f"SELECT {', '.join(out_items)} FROM AllData"
    if where:
        expected += f" WHERE {where}"
    return query, expected


N_CASES = 240


def test_dialect_fuzz_end_to_end(spark):
    from polars_view_spark.plans.dialect import rewrite_query

    pdf = _fixture_frame()
    spark.createDataFrame(pdf).createOrReplaceTempView("AllData")
    con = duckdb.connect()
    con.register("AllData", pdf)

    rng = random.Random(20260814)
    failures = []
    for i in range(N_CASES):
        query, expected = _gen_case(rng)
        try:
            rewritten = rewrite_query(query, spark)
            got = spark.sql(rewritten)
            want = con.sql(expected).df()
            compare(got, want, f"case{i}")
        except AssertionError as exc:  # pragma: no cover - failure reporting
            failures.append(f"case {i}:\n  query: {query}\n  {exc}")
            if len(failures) >= 3:
                break
    con.close()
    assert not failures, "\n\n".join(failures)


@pytest.mark.parametrize(
    "query",
    [
        'SELECT * EXCEPT ("Col D") REPLACE (UPPER(c) AS c) RENAME (c AS "renamed col") FROM AllData',
        "SELECT * REPLACE (STRFTIME(e_ts, '%Y/%m') AS e_ts) FROM AllData WHERE k > 1",
    ],
)
def test_dialect_fuzz_pinned_shapes(spark, query):
    """Two fixed high-complexity shapes kept as fast regression anchors."""
    from polars_view_spark.plans.dialect import rewrite_query

    pdf = _fixture_frame()
    spark.createDataFrame(pdf).createOrReplaceTempView("AllData")
    out = spark.sql(rewrite_query(query, spark))
    assert out.count() > 0


def _gen_modifier_chain(rng: random.Random):
    """Shared star-modifier generator: returns (modifier_clause_sql,
    expanded_projection_items, kept_output_names) — the dialect text and
    the independently derived plain-SQL expansion."""
    names = [c[0] for c in COLUMNS]
    kinds = {c[0]: c[2] for c in COLUMNS}
    must_quote = {c[0] for c in COLUMNS if c[1]}

    def q(name: str) -> str:
        return _ident(name, name in must_quote or rng.random() < 0.4)

    candidates = [n for n in names if n != "k"]
    except_cols = rng.sample(candidates, rng.randint(0, 2))
    remaining = [n for n in candidates if n not in except_cols]
    replace_cols = rng.sample(remaining, rng.randint(0, min(2, len(remaining))))
    replace_exprs = {
        col: rng.choice(REPLACE_TEMPLATES[kinds[col]]).format(q=q(col))
        for col in replace_cols
    }
    rename_cols = rng.sample(remaining, rng.randint(0, min(2, len(remaining))))
    rename_map = dict(zip(rename_cols, rng.sample(RENAME_POOL, len(rename_cols))))

    parts = ["*"]
    if except_cols:
        parts.append(f"EXCEPT ({', '.join(q(cn) for cn in except_cols)})")
    if replace_exprs:
        parts.append(
            "REPLACE ("
            + ", ".join(f"{e} AS {q(cn)}" for cn, e in replace_exprs.items())
            + ")"
        )
    if rename_map:
        parts.append(
            "RENAME ("
            + ", ".join(
                f"{q(cn)} AS {_ident(new, True)}" for cn, new in rename_map.items()
            )
            + ")"
        )
    out_items, kept = [], []
    for col in names:
        if col in except_cols:
            continue
        expr = replace_exprs.get(col, f'"{col}"')
        out = rename_map.get(col, col)
        out_items.append(f'{expr} AS "{out}"')
        kept.append(out)
    return " ".join(parts), ", ".join(out_items), kept


def test_composed_fuzz_end_to_end(spark):
    """Composition fuzz (VERDICT r03 task 5): QUALIFY × star-modifiers ×
    CTEs × set-ops in ONE statement.  rewrite_query applies its passes in
    a fixed order (comments → quotes → strftime → qualify → star) and the
    passes interact — the QUALIFY wrap emits a Spark-native ``* EXCEPT``
    that the star pass must leave alone while rewriting the user's inner
    polars-style modifiers; a set-op EXCEPT keyword must not be read as a
    star modifier.  Three composed shapes, 120 generated cases, each
    value-compared against DuckDB running an independently derived
    statement (expanded projection + native QUALIFY)."""
    from polars_view_spark.plans.dialect import rewrite_query

    pdf = _fixture_frame()
    spark.createDataFrame(pdf).createOrReplaceTempView("AllData")
    con = duckdb.connect()
    con.register("AllData", pdf)

    rng = random.Random(20260816)
    failures = []
    for i in range(120):
        shape = rng.choice(["direct_qualify", "cte_qualify", "setop"])
        mods, expanded, kept = _gen_modifier_chain(rng)
        comment = "/* composed fuzz */ " if rng.random() < 0.3 else ""
        where = rng.choice(WHERE_POOL)
        wh = f" WHERE {where}" if where else ""
        fn = rng.choice(["ROW_NUMBER()", "RANK()", "DENSE_RANK()"])
        thr = rng.randint(1, 3)
        win = f'{fn} OVER (PARTITION BY "k" % 2 ORDER BY "k" DESC)'
        tail = rng.choice(["", ' ORDER BY "k"'])

        if shape == "direct_qualify":
            # raw-window predicate over k (never dropped/renamed), so the
            # window resolves over the modified projection on both engines
            q = (f"SELECT {comment}{mods} FROM AllData{wh} "
                 f"QUALIFY {win} <= {thr}{tail}")
            want_sql = (f"SELECT {expanded} FROM AllData{wh} "
                        f"QUALIFY {win} <= {thr}{tail}")
        elif shape == "cte_qualify":
            q = (f"WITH base AS (SELECT {comment}{mods} FROM AllData{wh}) "
                 f'SELECT *, {win} AS rk FROM base QUALIFY rk <= {thr}{tail}')
            want_sql = (f"WITH base AS (SELECT {expanded} FROM AllData{wh}) "
                        f"SELECT *, {win} AS rk FROM base QUALIFY rk <= {thr}{tail}")
        else:  # set-op: same modifier chain both branches, overlapping filters
            op = rng.choice(["UNION ALL", "UNION", "INTERSECT", "EXCEPT"])
            q = (f"SELECT {comment}{mods} FROM AllData WHERE k <= 4 "
                 f"{op} SELECT {mods} FROM AllData WHERE k >= 3")
            want_sql = (f"SELECT {expanded} FROM AllData WHERE k <= 4 "
                        f"{op} SELECT {expanded} FROM AllData WHERE k >= 3")
        try:
            got = spark.sql(rewrite_query(q, spark))
            want = con.sql(want_sql).df()
            compare(got, want, f"composed{i}:{shape}")
        except AssertionError as exc:  # pragma: no cover
            failures.append(f"case {i} ({shape}): {q}\n  {exc}")
            if len(failures) >= 3:
                break
        except Exception as exc:  # pragma: no cover
            failures.append(f"case {i} ({shape}) ERRORED: {q}\n  {type(exc).__name__}: {exc}")
            if len(failures) >= 3:
                break
    con.close()
    assert not failures, "\n\n".join(failures)


def test_qualify_fuzz_end_to_end(spark):
    """Generated QUALIFY shapes: Spark (through the shim's rewrite) must
    match DuckDB running the IDENTICAL statement natively — partitions,
    rank functions, thresholds, alias-vs-raw-window predicates, and
    ORDER BY/LIMIT tails all drawn at random."""
    from polars_view_spark.plans.dialect import rewrite_query

    pdf = _fixture_frame()
    spark.createDataFrame(pdf).createOrReplaceTempView("AllData")
    con = duckdb.connect()
    con.register("AllData", pdf)

    rng = random.Random(20260815)
    failures = []
    for i in range(60):
        part = rng.choice(['"k" % 2', '"F" % 3', "1"])
        fn = rng.choice(["ROW_NUMBER()", "RANK()", "DENSE_RANK()"])
        thr = rng.randint(1, 3)
        win = f'{fn} OVER (PARTITION BY {part} ORDER BY "F" DESC, "k")'
        tail = rng.choice(["", ' ORDER BY "k"', ' ORDER BY "k" LIMIT 4'])
        if rng.random() < 0.5:  # alias predicate
            q = (f'SELECT "k", "F", {win} AS rk FROM AllData '
                 f"QUALIFY rk <= {thr}{tail}")
        else:  # raw window predicate
            q = (f'SELECT "k", "F" FROM AllData '
                 f"QUALIFY {win} <= {thr}{tail}")
        try:
            got = spark.sql(rewrite_query(q, spark))
            want = con.sql(q).df()
            compare(got, want, f"qualify{i}")
        except AssertionError as exc:  # pragma: no cover
            failures.append(f"case {i}: {q}\n  {exc}")
            if len(failures) >= 3:
                break
    con.close()
    assert not failures, "\n\n".join(failures)


def test_cte_scope_star_fuzz_end_to_end(spark):
    """r04 fix fuzz: modifier stars INSIDE a CTE body or a FROM-subquery
    that reference an EARLIER CTE — the star's analysis text must carry a
    merged WITH prefix of every enclosing scope (`_enclosing_with_prefix`).
    60 generated cases across three nesting shapes, value-compared against
    DuckDB running the independently expanded plain-SQL statement."""
    from polars_view_spark.plans.dialect import rewrite_query

    pdf = _fixture_frame()
    spark.createDataFrame(pdf).createOrReplaceTempView("AllData")
    con = duckdb.connect()
    con.register("AllData", pdf)

    rng = random.Random(20260817)
    failures = []
    for i in range(80):
        shape = rng.choice(
            ["cte_body", "from_subquery", "two_deep", "cte_mods_qualify",
             "shadowed"]
        )
        mods, expanded, kept = _gen_modifier_chain(rng)
        where = rng.choice(WHERE_POOL)
        wh = f" WHERE {where}" if where else ""
        tail = rng.choice(["", ' ORDER BY "k"'])

        if shape == "cte_body":
            # star in the SECOND CTE's body, FROM the first CTE
            q = (f"WITH seed AS (SELECT * FROM AllData{wh}), "
                 f"base AS (SELECT {mods} FROM seed) SELECT * FROM base{tail}")
            want_sql = (f"WITH seed AS (SELECT * FROM AllData{wh}), "
                        f"base AS (SELECT {expanded} FROM seed) "
                        f"SELECT * FROM base{tail}")
        elif shape == "from_subquery":
            # star in a FROM-subquery of the main select, FROM the CTE
            q = (f"WITH seed AS (SELECT * FROM AllData{wh}) "
                 f"SELECT * FROM (SELECT {mods} FROM seed) s{tail}")
            want_sql = (f"WITH seed AS (SELECT * FROM AllData{wh}) "
                        f"SELECT * FROM (SELECT {expanded} FROM seed) s{tail}")
        elif shape == "two_deep":
            # star two scopes deep: subquery inside a CTE body, FROM the
            # first CTE
            q = (f"WITH seed AS (SELECT * FROM AllData{wh}), "
                 f"base AS (SELECT * FROM (SELECT {mods} FROM seed) t) "
                 f"SELECT * FROM base{tail}")
            want_sql = (f"WITH seed AS (SELECT * FROM AllData{wh}), "
                        f"base AS (SELECT * FROM (SELECT {expanded} FROM seed) t) "
                        f"SELECT * FROM base{tail}")
        elif shape == "shadowed":
            # r05 shadow-merge fix: the inner scope REDEFINES the outer
            # CTE name (sometimes quoted, exercising the backquoted-name
            # strip) and the star must resolve against the INNER
            # definition — the outer one is a poisoned decoy on BOTH
            # channels an outer-wins bug could flow through: rows (k > 99
            # → empty, poisons the executed query) and schema (extra
            # poison column, poisons the star-expansion probe, whose
            # block-local analysis only sees schemas)
            inner_name = rng.choice(["seed", '"seed"'])
            q = (f"WITH seed AS (SELECT *, 1 AS poison FROM AllData "
                 f"WHERE k > 99) "
                 f"SELECT * FROM (WITH {inner_name} AS "
                 f"(SELECT * FROM AllData{wh}) "
                 f"SELECT {mods} FROM {inner_name}) s{tail}")
            want_sql = (f"SELECT * FROM (WITH seed AS "
                        f"(SELECT * FROM AllData{wh}) "
                        f"SELECT {expanded} FROM seed) s{tail}")
        else:
            # the full composition: CTE prefix + modifier star in the main
            # select + QUALIFY.  The qualify wrap pushes the WITH inside
            # the __pvs_qsub parens, so the star resolves through the
            # merged enclosing-WITH prefix at depth 2 — the interaction of
            # all three rewrites in one statement
            fn = rng.choice(["ROW_NUMBER()", "RANK()"])
            thr = rng.randint(1, 3)
            win = f'{fn} OVER (PARTITION BY "k" % 2 ORDER BY "k" DESC)'
            q = (f"WITH seed AS (SELECT * FROM AllData{wh}) "
                 f"SELECT {mods} FROM seed QUALIFY {win} <= {thr}")
            want_sql = (f"WITH seed AS (SELECT * FROM AllData{wh}) "
                        f"SELECT {expanded} FROM seed QUALIFY {win} <= {thr}")
        try:
            got = spark.sql(rewrite_query(q, spark))
            want = con.sql(want_sql).df()
            compare(got, want, f"ctescope{i}:{shape}")
        except AssertionError as exc:  # pragma: no cover
            failures.append(f"case {i} ({shape}): {q}\n  {exc}")
            if len(failures) >= 3:
                break
        except Exception as exc:  # pragma: no cover
            failures.append(
                f"case {i} ({shape}) ERRORED: {q}\n  {type(exc).__name__}: {exc}"
            )
            if len(failures) >= 3:
                break
    con.close()
    assert not failures, "\n\n".join(failures)
