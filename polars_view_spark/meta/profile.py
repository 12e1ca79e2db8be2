"""Column profiler — the stats panel a viewer pairs with the schema panel
(extends the reference's shape/schema introspection, src/file_info.rs, with
per-column statistics).

One aggregate pass computes every column's non-null and distinct counts
simultaneously (Catalyst plans multi-distinct via EXPAND — one scan, n×
intermediate rows, map-side partials; for 100 TB dashboards swap the exact
distincts for ``approx_count_distinct`` — same shape, constant memory).
Output is long-form ``(column, n_rows, n_nulls, n_distinct)`` with
integer-exact values so it cross-engine-verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, approx: bool = False) -> DataFrame:
    """Per-column stats in one aggregate pass.

    ``approx=True`` uses HyperLogLog++ distinct counts (the 100 TB mode).
    """
    total = F.count(F.lit(1)).alias("__n")
    aggs = [total]
    for i, c in enumerate(df.columns):
        aggs.append(F.count(F.col(c)).alias(f"__nn_{i}"))
        if approx:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"__nd_{i}"))
        else:
            aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{i}"))
    row = df.agg(*aggs)

    # long-form via stack: (column, n_rows, n_nulls, n_distinct)
    stack_args = ", ".join(
        f"'{c}', __n - __nn_{i}, __nd_{i}" for i, c in enumerate(df.columns)
    )
    return row.selectExpr(
        f"stack({len(df.columns)}, {stack_args}) AS (column, n_nulls, n_distinct)",
        "__n AS n_rows",
    ).select("column", "n_rows", "n_nulls", "n_distinct")
