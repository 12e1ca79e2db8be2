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
    """Flagship on /root/testdata/sf0.001; driver checks rows>0.

    The end-to-end training-data pipeline in ONE lazy Catalyst plan:
    Gopher quality filter → fingerprint dedup → decontamination vs a
    benchmark set → epoch-weighted mixture resample → sequence packing
    (operators/packing.py:build_training_mix) — every stage is an operator
    the catalog also gates individually against a DuckDB oracle.
    """
    from pyspark.sql import functions as F

    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.packing import build_training_mix

    docs = load_tables(spark, SMOKE_SF_DIR, "documents")["documents"]
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return build_training_mix(docs, bench).orderBy("pack_shard", "chunk_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from polars_view_spark.catalog import entries

    return {name: e.spark_fn for name, e in entries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI oracle per query (omitted for the genuinely
    non-SQL-expressible ops → rows-only check)."""
    from polars_view_spark.catalog import entries

    return {name: e.oracle for name, e in entries().items() if e.oracle is not None}
