"""plans/audit.py: the scale-review checklist as a user-facing feature."""

SF = "/root/testdata/sf0.001"


def test_good_plans_pass_clean(spark):
    from polars_view_spark.catalog import entries
    from polars_view_spark.plans.audit import audit_plan

    cat = entries()
    # top-k entries: broadcast joins, no cartesian, no python eval, no
    # warnings at all
    for name in ("q3_shipping_priority", "q10_returned_items"):
        a = audit_plan(cat[name].spark_fn(spark, SF))
        assert a.has_top_k and not a.has_cartesian and not a.has_python_row_eval
        assert a.warnings() == [], (name, a.warnings())
    assert audit_plan(cat["q5_local_supplier"].spark_fn(spark, SF)).n_broadcast_joins >= 2


def test_bad_plans_are_flagged(spark):
    from pyspark.sql.functions import udf

    from polars_view_spark.plans.audit import audit_plan

    bad = (
        spark.range(100)
        .selectExpr("id AS a")
        .crossJoin(spark.range(100).selectExpr("id AS b"))
        .withColumn("u", udf(lambda x: str(x))("a"))
    )
    a = audit_plan(bad)
    assert a.has_cartesian and a.has_python_row_eval
    warns = "\n".join(a.warnings())
    assert "cartesian" in warns and "Python UDF" in warns

    total_sort = spark.read.parquet(f"{SF}/lineitem.parquet").orderBy("l_extendedprice")
    a2 = audit_plan(total_sort)
    assert a2.has_global_sort and not a2.has_top_k
    assert any("global sort" in w for w in a2.warnings())


def test_topk_is_not_a_global_sort(spark):
    from polars_view_spark.plans.audit import audit_plan

    topk = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .orderBy("l_extendedprice")
        .limit(10)
    )
    a = audit_plan(topk)
    assert a.has_top_k and not a.has_global_sort
    assert not any("global sort" in w for w in a.warnings())


def test_scan_inventory_sees_pushdown(spark):
    from polars_view_spark.catalog import entries
    from polars_view_spark.plans.audit import audit_plan

    cat = entries()
    a = audit_plan(cat["q_filter_predicates"].spark_fn(spark, SF))
    assert a.scans, "no scans found in plan"
    assert any(s.pushed_filters for s in a.scans), "pushdown not visible"


def test_container_audit(spark, tmp_path):
    import pandas as pd

    from polars_view_spark import DataContainer, LoadConfig

    p = str(tmp_path / "t.csv")
    pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]}).to_csv(p, index=False)
    c = DataContainer.load_data(
        spark, LoadConfig(path=p, apply_sql=True, query="SELECT a FROM AllData")
    )
    a = c.audit()
    assert not a.has_cartesian and not a.has_python_row_eval
