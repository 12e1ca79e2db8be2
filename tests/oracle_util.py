"""Local replica of the driver's correctness gate: run a catalog query on
Spark AND its oracle SQL on DuckDB over the same parquet tables, then compare
row count + values order-insensitively (columns sorted by name, rows sorted,
exact equality after normalization)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        kind = df[c].dtype.kind
        if kind in "iu":
            df[c] = df[c].astype("int64")
        elif kind == "f":
            df[c] = df[c].astype("float64")
        elif kind == "M":
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
        elif kind == "O":
            import datetime

            df[c] = df[c].map(
                lambda v: tuple(v)
                if isinstance(v, (list, tuple))
                else (
                    pd.Timestamp(v)
                    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime)
                    else v
                )
            )
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if pd.isna(a) is True and pd.isna(b) is True:
        return True
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    return a == b


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    got = _normalize(spark_df.toPandas())
    want = _normalize(oracle_pdf)
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        gv, wv = got[c].tolist(), want[c].tolist()
        bad = [
            (i, g, w) for i, (g, w) in enumerate(zip(gv, wv)) if not _values_equal(g, w)
        ][:5]
        assert not bad, f"{name}: column {c!r} first mismatches {bad}"
