"""10× scaling sweep — the repeatable form of SCALE.md's experiment.

Builds a synthetic 10× instance of the sf0.1 testdata under /tmp/sfbig
(dims kept verbatim; fact/corpus tables replicated with shifted keys so
joins stay consistent — nothing outside /tmp is written), then times every
catalog entry at sf0.1 and at 10× and prints the wall-clock ratio table.

Reading the ratios: ≤ ~10 on 10× rows is linear or better (fixed per-job
overhead amortizing shows up as ≪10).  Anything materially above 10 is a
super-linear shape — the round-3 sweep found and fixed/explained five
(SCALE.md "Expression-engine findings" and "10× scaling experiment").

Usage:
    python3 scripts/scale_sweep.py            # build (if absent) + sweep all
    python3 scripts/scale_sweep.py build      # just (re)build /tmp/sfbig
    python3 scripts/scale_sweep.py d_ e_      # sweep entries by prefix
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
BIG = "/tmp/sfbig"
STRIDE = 10_000_000  # key shift per replica; > any base key

# table -> comma-joined `col + STRIDE*r AS col` REPLACE list (None = copy dims)
REPLICATION = {
    "region": None,
    "nation": None,
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey, o_custkey",
    "lineitem": "l_orderkey, l_partkey, l_suppkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id, user_id",
}


def build() -> None:
    import duckdb

    os.makedirs(BIG, exist_ok=True)
    con = duckdb.connect()
    for t, keys in REPLICATION.items():
        src = f"read_parquet('{BASE}/{t}.parquet')"
        if keys is None:
            q = f"SELECT * FROM {src}"
        else:
            rep = ", ".join(
                f"{c.strip()} + {STRIDE}*r AS {c.strip()}" for c in keys.split(",")
            )
            q = f"SELECT * EXCLUDE (r) REPLACE ({rep}) FROM {src}, range(10) t(r)"
        con.execute(f"COPY ({q}) TO '{BIG}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{BIG}/{t}.parquet')").fetchone()[0]
        print(f"built {t}: {n} rows", file=sys.stderr)


def sweep(prefixes: list[str]) -> None:
    from polars_view_spark.catalog import entries
    from polars_view_spark.session import get_spark

    spark = get_spark("scale_sweep")
    cat = entries()
    rows = []
    for name, e in cat.items():
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        if name.startswith("t_"):  # file-format roundtrips: not scale subjects
            print(f"{name}: skipped (t_* roundtrips excluded by design)", file=sys.stderr)
            continue
        try:
            e.spark_fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
            t0 = time.perf_counter()
            e.spark_fn(spark, BASE).write.format("noop").mode("overwrite").save()
            small = time.perf_counter() - t0
            t0 = time.perf_counter()
            e.spark_fn(spark, BIG).write.format("noop").mode("overwrite").save()
            big = time.perf_counter() - t0
            rows.append((big / small, name, small, big))
        except Exception as ex:  # noqa: BLE001
            print(f"{name:32s} ERR {str(ex)[:80]}")
    for r, name, s, b in sorted(rows, reverse=True):
        flag = "  <<< super-linear" if r > 10 else ""
        print(f"{name:32s} sf0.1 {s:6.2f}s  10x {b:6.2f}s  ratio {r:5.1f}{flag}")


if __name__ == "__main__":
    args = sys.argv[1:]
    if args == ["build"]:
        build()
    else:
        if not os.path.exists(f"{BIG}/lineitem.parquet"):
            build()
        sweep(args)
