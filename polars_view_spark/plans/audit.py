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
    #: top-level column count of ``read_schema`` (nesting-aware — commas
    #: inside array/struct/map element types are not field separators)
    n_columns: int = 0


def _count_struct_fields(read_schema: str) -> int:
    """Top-level field count of a ``struct<...>`` schema string, counting
    commas only at nesting depth zero so ``struct<a:array<struct<x:int,
    y:int>>,b:int>`` counts 2, not 3."""
    m = re.match(r"struct<(.*)>\s*$", read_schema.strip(), re.DOTALL)
    if not m:
        return 0
    body = m.group(1)
    if not body.strip():
        return 0
    depth = 0
    fields = 1
    for ch in body:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            fields += 1
    return fields


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
            if s.n_columns >= 10:
                out.append(
                    f"scan of {s.relation} reads {s.n_columns} "
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
    conf = df.sparkSession.conf
    prev_len = conf.get("spark.sql.maxMetadataStringLength", "100")
    conf.set("spark.sql.maxMetadataStringLength", "4000")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        conf.set("spark.sql.maxMetadataStringLength", prev_len)

    scans = []
    for m in re.finditer(r"FileScan \w+ ([^\[ ]*)\[[^\]]*\]([^\n]*)", plan):
        rest = m.group(2)
        pf = re.search(r"PushedFilters: \[([^\]]*)\]", rest)
        # ReadSchema is the last key on the FileScan line; take everything
        # after the marker (the struct contains commas, so a comma-bounded
        # capture truncates at the first field)
        rs = re.search(r"ReadSchema: (.*)$", rest)
        read_schema = rs.group(1).strip() if rs else ""
        relation = m.group(1)
        if not relation:
            # path-based scan (`FileScan parquet [cols...]`): name it from
            # the Location's first path
            loc = re.search(r"Location: [^\[\n]*\[([^\],\n]+)", rest)
            if loc:
                relation = loc.group(1).rstrip("/").rsplit("/", 1)[-1]
        scans.append(
            ScanInfo(
                relation=relation,
                pushed_filters=pf.group(1) if pf else "",
                read_schema=read_schema,
                n_columns=_count_struct_fields(read_schema),
            )
        )

    has_limit_sort = "TakeOrderedAndProject" in plan
    # a Sort marked global (not the partial sort inside SMJ or windows)
    has_global_sort = (
        re.search(r"Sort \[[^\]]*\], true", plan) is not None and not has_limit_sort
    )
    return PlanAudit(
        # any materialized Exchange (hash / range / SinglePartition — the
        # global-agg collect is a real network pass too); \bExchange does
        # not match inside ReusedExchange (no word boundary after "Reused")
        n_exchanges=len(re.findall(r"\bExchange ", plan)),
        n_broadcast_joins=len(re.findall(r"BroadcastHashJoin", plan)),
        n_sort_merge_joins=len(re.findall(r"SortMergeJoin", plan)),
        n_shuffled_hash_joins=len(re.findall(r"ShuffledHashJoin", plan)),
        has_cartesian="CartesianProduct" in plan
        or "BroadcastNestedLoopJoin" in plan,
        # UDTF eval nodes (BatchEvalPythonUDTF / ArrowEvalPythonUDTF) are
        # NOT counted as accidental row-at-a-time UDFs: a Python UDTF is
        # per-row BY CONTRACT (the documented slow-path table-function
        # surface, operators/udtfs.py) and the Arrow flag only changes
        # the transfer encoding — on builds without useArrow the pickled
        # fallback must not flip the audit verdict.
        has_python_row_eval="BatchEvalPython"
        in plan.replace("BatchEvalPythonUDTF", "PyUDTF"),
        has_arrow_python_eval="ArrowEvalPython" in plan or "MapInPandas" in plan,
        has_top_k=has_limit_sort,
        has_global_sort=has_global_sort,
        scans=scans,
        plan=plan,
    )
