"""Cumulative multi-column sort with explicit null placement.

Parity target: reference src/data_container.rs:247-309 + src/sort.rs.
Each criterion carries {column, ascending, nulls_last}; precedence is list
order; the reference sorts with ``maintain_order=true`` (stable).

Spark's distributed sort is NOT stable, so stability is emulated by
appending a pre-assigned contiguous row index as the final tiebreaker key —
the documented approach from SURVEY.md §7.4 item 2.  The tiebreaker is only
materialized when ``stable=True`` (the default, to match the reference).

Scale note: ``orderBy`` is a range-partitioned total sort — Spark samples
key ranges and shuffles once; AQE handles skewed ranges.  This is exactly
what you want at 100 TB; no custom partitioner needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_view_spark.config import SortBy
from polars_view_spark.operators.rowindex import add_row_index

_TIEBREAK = "__pvs_stable_order__"


def _key(sb: SortBy) -> Column:
    col = F.col(f"`{sb.column_name}`")
    if sb.ascending:
        return col.asc_nulls_last() if sb.nulls_last else col.asc_nulls_first()
    return col.desc_nulls_last() if sb.nulls_last else col.desc_nulls_first()


def apply_sort(df: DataFrame, criteria: list[SortBy], stable: bool = True) -> DataFrame:
    """Sort ``df`` by ``criteria`` in precedence order.

    Empty criteria → ``df`` unchanged (the container handles the
    rebuild-from-original semantics of the reference's sort reset).
    """
    if not criteria:
        return df
    keys = [_key(sb) for sb in criteria]
    if stable:
        tagged = add_row_index(df, _TIEBREAK, 0)
        keys.append(F.col(f"`{_TIEBREAK}`").asc())
        return tagged.orderBy(*keys).drop(_TIEBREAK)
    return df.orderBy(*keys)
