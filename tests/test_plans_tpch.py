"""Physical-plan gates for the TPC-H completion set (catalog_tpch.py).

Same philosophy as test_plans.py: assert the properties that make each
plan survive a 100× scale-up, so a planner regression (a lost broadcast,
a subquery that stops decorrelating, an outer join silently turned
inner) fails CI instead of surfacing as a 100 TB incident.
"""

import re

import pytest

SF = "/root/testdata/sf0.001"

TPCH_NEW = [
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q12_ship_priority_class",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_parts_supplier_counts",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q20_potential_promotion",
    "q21_suppliers_kept_waiting",
    "q22_global_sales_opportunity",
]


def plan_of(df) -> str:
    df.sparkSession.conf.set("spark.sql.maxMetadataStringLength", "2000")
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def cat():
    from polars_view_spark.catalog import entries

    return entries()


@pytest.mark.parametrize("name", TPCH_NEW)
def test_no_cartesian_anywhere(spark, cat, name):
    """None of the 16 plans may contain a cross product or nested-loop
    join — every correlation must decorrelate to a hash join."""
    plan = plan_of(cat[name].spark_fn(spark, SF))
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_q6_filters_reach_scan(spark, cat):
    plan = plan_of(cat["q6_forecast_revenue"].spark_fn(spark, SF))
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, "no pushed filters"
    pushed = m.group(1)
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed
    # two-phase aggregation: map-side partial + final
    assert plan.count("HashAggregate") >= 2


def test_q4_exists_becomes_semi_join(spark, cat):
    plan = plan_of(cat["q4_order_priority"].spark_fn(spark, SF))
    assert "LeftSemi" in plan, "EXISTS did not decorrelate to a semi join"


def test_q9_dims_broadcast(spark, cat):
    """part/supplier/nation are explicitly broadcast: lineitem must reach
    its only shuffle join (orders) without exchanging for any dimension."""
    plan = plan_of(cat["q9_product_profit"].spark_fn(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3
    # the LIKE filter prunes part BEFORE the broadcast exchange
    assert "StartsWith" in plan or "Contains" in plan or "like" in plan.lower()


def test_q13_keeps_outer_join(spark, cat):
    """The ON-clause priority filter must not convert LEFT OUTER to inner
    (that would silently drop zero-order customers from the histogram)."""
    plan = plan_of(cat["q13_customer_distribution"].spark_fn(spark, SF))
    assert "LeftOuter" in plan, "outer join was converted to inner"


def test_q16_not_in_is_anti_join(spark, cat):
    plan = plan_of(cat["q16_parts_supplier_counts"].spark_fn(spark, SF))
    assert "LeftAnti" in plan or "NAAJ" in plan, "NOT IN did not become an anti join"
    # COUNT(DISTINCT) → expand + two aggregation phases
    assert plan.count("HashAggregate") >= 2


def test_q17_correlated_avg_decorrelates(spark, cat):
    """The per-part scalar AVG must run as ONE aggregate keyed by
    l_partkey joined back — not a re-executed subquery per outer row."""
    plan = plan_of(cat["q17_small_quantity_revenue"].spark_fn(spark, SF))
    assert "CartesianProduct" not in plan
    # the decorrelated aggregate over lineitem appears as avg(...) inside
    # a HashAggregate, and joins back on partkey
    assert re.search(r"partial_avg|avg\(", plan), "no decorrelated AVG aggregate"
    assert plan.count("HashAggregate") >= 2


def test_q21_semi_and_anti_pair(spark, cat):
    plan = plan_of(cat["q21_suppliers_kept_waiting"].spark_fn(spark, SF))
    assert "LeftSemi" in plan, "EXISTS lost its semi join"
    assert "LeftAnti" in plan, "NOT EXISTS lost its anti join"


def test_q22_anti_join_and_scalar_filter(spark, cat):
    plan = plan_of(cat["q22_global_sales_opportunity"].spark_fn(spark, SF))
    assert "LeftAnti" in plan, "NOT EXISTS lost its anti join"
    # scalar AVG arrives as a subquery result reused as a literal filter
    assert "Subquery" in plan or "scalar-subquery" in plan


def test_q15_topk_equality_single_revenue_pass(spark, cat):
    """The revenue CTE feeds both the join and the scalar MAX; Spark reuses
    the exchange instead of recomputing the lineitem aggregation."""
    plan = plan_of(cat["q15_top_supplier"].spark_fn(spark, SF))
    assert "ReusedExchange" in plan or plan.count("FileScan parquet") <= 3


def test_q21_single_pass_two_scans(spark, cat):
    """The rewrite's reason to exist: the decorrelated q21 plan scans
    lineitem 3× (main + semi + anti); the window form must scan it at most
    2× and contain NO semi/anti join."""
    plan = plan_of(cat["q21_single_pass"].spark_fn(spark, SF))
    assert plan.count("FileScan parquet") <= 5  # 2×lineitem + orders + supplier + nation
    li_scans = len(
        [ln for ln in plan.splitlines() if "FileScan parquet" in ln and "lineitem" in ln]
    )
    assert li_scans <= 2, f"{li_scans} lineitem scans"
    assert "LeftSemi" not in plan and "LeftAnti" not in plan
    baseline = plan_of(cat["q21_suppliers_kept_waiting"].spark_fn(spark, SF))
    base_li = len(
        [ln for ln in baseline.splitlines() if "FileScan parquet" in ln and "lineitem" in ln]
    )
    assert base_li >= 3, "baseline no longer triple-scans; update the doc"
