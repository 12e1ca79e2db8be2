"""Event-stream operators (batch form; streaming flavors in streaming/).

- tumbling-window aggregation
- sessionization (gap-based)
- as-of join (latest right row at or before each left timestamp)
- range join (value-in-bucket)

The as-of join is the interesting one at scale: the naive formulation is an
inequality join (quadratic blowup per key).  This implementation uses the
union-merge pattern — tag both sides, union, and carry the latest right row
forward with a window ``last(..., ignorenulls)`` over (key, time).  One
shuffle on (key), linear work, no range-join explosion.  DuckDB's native
``ASOF JOIN`` serves as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window counts/sums via the built-in ``window`` function —
    the same operator Structured Streaming uses, so batch and stream share
    semantics."""
    return (
        events.groupBy(F.window(F.col(ts_col), width).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value") + F.lit(1e-6), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the user is idle
    longer than ``gap_minutes``.

    Classic two-window formulation: lag → boundary flag → running sum =
    session index.  Both windows share the same (user, time) partitioning,
    so Catalyst plans ONE shuffle and two in-partition passes.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    gap_sec = gap_minutes * 60
    sessions = (
        events.withColumn("prev_ts", F.lag(ts_col).over(w))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_ts").isNull()
                | (
                    F.unix_timestamp(ts_col) - F.unix_timestamp("prev_ts")
                    > gap_sec
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("session_idx", F.sum("new_session").over(w))
    )
    return (
        sessions.groupBy(user_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            (F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))).alias(
                "duration_sec"
            ),
        )
        .withColumnRenamed("session_idx", "session_id")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` and matching key.  Left rows with no earlier
    right row keep NULLs (LEFT OUTER asof semantics).

    Union-merge plan: one shuffle on the key, one in-partition ordered pass —
    O(n log n) per partition, no inequality-join blowup.  Tie rule: a right
    row at exactly ``left_ts`` IS visible (<=), implemented by sorting right
    rows before left rows at equal timestamps.
    """
    lt = left.select(
        F.col(left_key).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_value_cols],
    )
    rt = right.select(
        F.col(right_key).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lt.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
    )
    merged = lt.unionByName(rt)
    # right rows (is_left=0) sort before left rows at the same timestamp →
    # last(ignorenulls) over the running frame sees them (<= semantics)
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__rv_{c}")
            for c in right_value_cols
        ],
    ).filter(F.col("__is_left") == 1)
    return carried.select(
        F.col("__left.*"),
        *[F.col(f"__rv_{c}").alias(c) for c in right_value_cols],
    )


def multi_granularity_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    granularities: tuple[str, ...] = ("hour", "day"),
) -> DataFrame:
    """Hypertable-style continuous-aggregate pyramid: counts/sums at
    several time granularities in ONE pass via GROUPING SETS over the
    truncated timestamps.

    The scan is read once; each grouping set gets its own partial
    aggregation sharing the same shuffle — at 100 TB this replaces N
    separate rollup jobs with one.  Output is long-form
    (granularity, bucket, group, n, sum) ready to serve dashboards or to be
    written as a partitioned rollup table.
    """
    truncs = [
        F.date_format(F.date_trunc(g, F.col(ts_col)), "yyyy-MM-dd HH:mm").alias(f"__b_{g}")
        for g in granularities
    ]
    base = events.select(*truncs, *group_cols, "value")
    sets = ", ".join(f"(__b_{g}, {', '.join(group_cols)})" for g in granularities)
    base.createOrReplaceTempView("__pvs_rollup_base")
    bucket_case = " ".join(
        f"WHEN __b_{g} IS NOT NULL THEN '{g}'" for g in granularities
    )
    bucket_val = "COALESCE(" + ", ".join(f"__b_{g}" for g in granularities) + ")"
    spark = events.sparkSession
    return spark.sql(
        f"""
        SELECT CASE {bucket_case} END AS granularity,
               {bucket_val} AS bucket,
               {', '.join(group_cols)},
               COUNT(*) AS n_events,
               ROUND(SUM(value) + 1e-6, 2) AS sum_value
        FROM __pvs_rollup_base
        GROUP BY GROUPING SETS ({sets})
        """
    )


def range_join(
    facts: DataFrame,
    buckets: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Join facts to [lo, hi) buckets.  The bucket table is broadcast
    (bucket tables are small by construction) — at scale this is a
    BroadcastNestedLoopJoin over a tiny side, which is the right plan;
    for large range tables, bucketize arithmetic replaces the join."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(buckets), cond, "left")
