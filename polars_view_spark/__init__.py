"""polars_view_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of claudiofsr/polars-view, re-expressed
Spark-first.

The reference (see SURVEY.md) is a single-table viewer/query tool built on
eager Polars DataFrames.  This package keeps the *capabilities* — four file
formats in/out, a six-stage transform pipeline, a SQL surface (including the
Polars SQL SELECT-modifier extensions), cumulative multi-column sort with
explicit null placement — but expresses every operator as a lazy PySpark
logical plan so Catalyst/Tungsten pick the physical strategy and the same
code scales from a laptop to a 1000-executor cluster.

Layers (mirrors SURVEY.md §7.1):

- ``session``    SparkSession factory (AQE, Arrow, sane shuffle partitions)
- ``config``     LoadConfig / ViewConfig dataclasses (= DataFilter/DataFormat)
- ``sources``    readers (format dispatch, CSV sniffing, force-string
                 override) and writers (4 formats, save guards)
- ``operators``  the six pipeline transforms, sort, row-index, plus the
                 scale extensions (dedup, similarity, text stats, multimodal,
                 as-of join)
- ``plans``      SQL dialect shim (SELECT * EXCEPT/RENAME/REPLACE, STRFTIME,
                 ILIKE, double-quoted identifiers) and the SQL example
                 generator
- ``functions``  reusable column-expression builders (euro-number parsing,
                 strftime translation, vector math, text hashing)
- ``streaming``  Structured Streaming flavors of the event operators
"""

from polars_view_spark.config import LoadConfig, SortBy, ViewConfig
from polars_view_spark.container import DataContainer
from polars_view_spark.plans.audit import PlanAudit, audit_plan
from polars_view_spark.session import get_spark

__all__ = [
    "DataContainer",
    "LoadConfig",
    "PlanAudit",
    "SortBy",
    "ViewConfig",
    "audit_plan",
    "get_spark",
]

__version__ = "0.1.0"
