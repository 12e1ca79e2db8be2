"""SparkSession factory.

Defaults chosen for the driver's environment (local[N] single JVM) but every
knob is what you'd set on a real cluster too: AQE on (runtime re-planning,
skew-join splitting, partition coalescing), Arrow on (fast pandas/Python
boundary), shuffle partitions sized to the parallelism instead of the
200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 4


def get_spark(app_name: str = "polars_view_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the SparkSession.

    Configuration rationale for 100 TB scale (the settings are the same; only
    master/memory change on a cluster):

    - ``spark.sql.adaptive.enabled``: runtime re-plan — coalesces tiny
      post-shuffle partitions, converts sort-merge joins to broadcast when a
      side turns out small, and splits skewed partitions
      (``skewJoin.enabled``) so one hot key can't stall a stage.
    - ``spark.sql.shuffle.partitions``: a *starting* value matched to local
      parallelism; AQE coalescing makes the exact number non-critical.
    - Arrow execution: every pandas_udf / toPandas crosses the JVM↔Python
      boundary in columnar Arrow batches instead of pickled rows.
    - Session timezone pinned to UTC so timestamp semantics are stable and
      match the DuckDB oracle.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce post-shuffle partitions to the advisory size instead of
        # maximizing parallelism: small intermediates get few tasks (less
        # scheduling latency), 100 TB intermediates still fan out fully —
        # measured ~30% off multi-join query latency at sf0.1
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        # NOT set: spark.sql.optimizer.canChangeCachedPlanOutputPartitioning.
        # Measured r11 (plans/r11/ab_cached_coalesce_x10.json): letting AQE
        # coalesce UNDER cache() materialization won ~20 % on the MinHash
        # family at sf0.1 (kilobyte cached partitions stop scheduling
        # 32-task waves) but LOST ~10 % control-adjusted at 10× —
        # byte-based coalescing collapses a small-in-bytes cached frame to
        # one partition ahead of CPU-amplifying consumers (band explode →
        # window → self-join), serializing exactly the stages that must
        # fan out at scale.  Same trade class as the r10 §9a checkpoint
        # revert; scale wins.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        # stderr progress bars corrupt harness tail-captures of the bench
        # JSON line (BENCH_r04 arrived unparseable) and add nothing in a
        # non-interactive run
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
