"""Dump ``explain("formatted")`` for catalog entries to plans/r<N>/.

Usage: python scripts/dump_plans.py <round> <before|after> [name ...]

Writes ``plans/r{round}/{name}_{tag}.txt`` for each requested entry (default:
the bench headliners).  The plan is captured from the ANALYZED/optimized
physical plan BEFORE execution (AdaptiveSparkPlan isFinalPlan=false) — the
shape evidence (Exchange count, join strategy, PushedFilters, ReadSchema,
Python eval nodes) the optimization round's claims are checked against.

Entries whose spark_fn runs side-effecting build steps (persisted indexes)
still execute those builds; only the returned query frame's plan is dumped.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rnd = int(sys.argv[1])
    tag = sys.argv[2]
    assert tag in ("before", "after"), tag
    names = sys.argv[3:]

    from polars_view_spark.catalog import entries
    from polars_view_spark.session import get_spark

    if not names:
        import bench

        names = bench.HEADLINE + bench.EXT_HEADLINE

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        f"r{rnd:02d}",
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("polars_view_spark_plandump")
    cat = entries()
    # widen plan metadata so PushedFilters/ReadSchema are not elided
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    for name in names:
        if name not in cat:
            print(f"skip (not in catalog): {name}")
            continue
        df = cat[name].spark_fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
