"""Physical-plan audit: the scale-review checklist as a library feature.

``tests/test_plans.py`` gates individual operators' plans at CI time; this
module packages the same checks for USERS — point it at any DataFrame and
get a structured inventory of the physical plan plus the scale warnings a
reviewer would raise before letting the query near 100 TB:

- a cartesian / broadcast-nested-loop join (O(n·m) blowup),
- row-at-a-time Python evaluation on the hot path (JVM↔Python per row),
- a global sort that is not a top-k (total shuffle into one ordered pass),
- scans that read every column (no pruning — usually a missing select),
- shuffle count (each exchange is a full network pass over the data).

The audit reads the *executed* plan string — the same artifact
``df.explain("formatted")`` prints — so it reflects what would actually
run, after AQE's re-planning, not the pre-optimization sketch.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class ScanInfo:
    """One file scan: the relation plus what reached it."""

    relation: str
    pushed_filters: str
    read_schema: str


@dataclass
class PlanAudit:
    n_exchanges: int
    n_broadcast_joins: int
    n_sort_merge_joins: int
    n_shuffled_hash_joins: int
    has_cartesian: bool
    has_python_row_eval: bool
    has_arrow_python_eval: bool
    has_top_k: bool
    has_global_sort: bool
    scans: list[ScanInfo] = field(default_factory=list)
    plan: str = ""

    def warnings(self) -> list[str]:
        """Scale-risk findings, worst first.  Empty list == the plan shape
        passes the same review the built-in operators are held to."""
        out: list[str] = []
        if self.has_cartesian:
            out.append(
                "cartesian/nested-loop join: O(n x m) pair blowup — add an "
                "equi-join key (bucket, band, or blocking hash)"
            )
        if self.has_python_row_eval:
            out.append(
                "row-at-a-time Python UDF (BatchEvalPython): per-row "
                "JVM-Python round trips — use built-in functions or a "
                "pandas_udf (Arrow-batched)"
            )
        if self.has_global_sort:
            out.append(
                "global sort without LIMIT: range-partitioned total sort "
                "(full shuffle) — add a LIMIT for top-k, or sort within "
                "partitions (sortWithinPartitions) if per-file order suffices"
            )
        for s in self.scans:
            if s.read_schema.count(",") >= 9 and "*" not in s.read_schema:
                out.append(
                    f"scan of {s.relation} reads {s.read_schema.count(',') + 1} "
                    "columns — select only what downstream uses so the "
                    "parquet reader prunes"
                )
        if self.n_exchanges >= 4:
            out.append(
                f"{self.n_exchanges} shuffles: each is a full network pass — "
                "check for repartition/groupBy/join keys that could share "
                "one partitioning"
            )
        return out


def audit_plan(df: DataFrame) -> PlanAudit:
    """Audit a DataFrame's executed physical plan for scale risks."""
    df.sparkSession.conf.set("spark.sql.maxMetadataStringLength", "4000")
    plan = df._jdf.queryExecution().executedPlan().toString()

    scans = []
    for m in re.finditer(r"FileScan \w+ ([^\[ ]*)\[[^\]]*\]([^\n]*)", plan):
        rest = m.group(2)
        pf = re.search(r"PushedFilters: \[([^\]]*)\]", rest)
        rs = re.search(r"ReadSchema: ([^,\n]*(?:<[^\n]*?>)?)", rest)
        scans.append(
            ScanInfo(
                relation=m.group(1),
                pushed_filters=pf.group(1) if pf else "",
                read_schema=rs.group(1) if rs else "",
            )
        )

    has_limit_sort = "TakeOrderedAndProject" in plan
    # a Sort marked global (not the partial sort inside SMJ or windows)
    has_global_sort = (
        re.search(r"Sort \[[^\]]*\], true", plan) is not None and not has_limit_sort
    )
    return PlanAudit(
        n_exchanges=len(re.findall(r"Exchange (?:hash|range)partitioning", plan)),
        n_broadcast_joins=len(re.findall(r"BroadcastHashJoin", plan)),
        n_sort_merge_joins=len(re.findall(r"SortMergeJoin", plan)),
        n_shuffled_hash_joins=len(re.findall(r"ShuffledHashJoin", plan)),
        has_cartesian="CartesianProduct" in plan
        or "BroadcastNestedLoopJoin" in plan,
        has_python_row_eval="BatchEvalPython" in plan,
        has_arrow_python_eval="ArrowEvalPython" in plan or "MapInPandas" in plan,
        has_top_k=has_limit_sort,
        has_global_sort=has_global_sort,
        scans=scans,
        plan=plan,
    )
