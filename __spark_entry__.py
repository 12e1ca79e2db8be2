"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in ``polars_view_spark.catalog`` (core SQL
surface + transforms) and ``polars_view_spark.catalog_ext`` (dedup,
similarity, text analysis, multimodal, events) — this module is a thin
adapter over it.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Exercises the full product path: parquet scan → pipeline (replace-nulls)
    → dialect-shimmed SQL (GROUP BY / aggregate aliases / ORDER BY alias).
    """
    from polars_view_spark.catalog import entries

    return entries()["q1_pricing_summary"].spark_fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from polars_view_spark.catalog import entries

    return {name: e.spark_fn for name, e in entries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI oracle per query (omitted for the genuinely
    non-SQL-expressible ops → rows-only check)."""
    from polars_view_spark.catalog import entries

    return {name: e.oracle for name, e in entries().items() if e.oracle is not None}
