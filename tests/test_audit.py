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


def test_unpruned_scan_warning_fires(spark):
    """A select-* scan of a wide table must trip the pruning warning — the
    regression ADVICE r02 found: the old comma-bounded ReadSchema capture
    truncated the struct so the warning was dead code."""
    from polars_view_spark.plans.audit import audit_plan

    wide = spark.read.parquet(f"{SF}/lineitem.parquet")  # 11 columns
    a = audit_plan(wide)
    assert a.scans, "no scans found"
    s = a.scans[0]
    assert s.n_columns == 11, (s.n_columns, s.read_schema)
    assert s.read_schema.startswith("struct<") and s.read_schema.endswith(">")
    assert "lineitem" in s.relation, s.relation  # path-based Location name
    assert any("select only what downstream uses" in w for w in a.warnings())
    # and a pruned projection of the same table stays quiet
    pruned = audit_plan(wide.select("l_orderkey", "l_quantity"))
    assert pruned.scans[0].n_columns == 2
    assert not any("select only" in w for w in pruned.warnings())


def test_struct_field_count_nesting_aware():
    from polars_view_spark.plans.audit import _count_struct_fields

    assert _count_struct_fields("struct<a:int>") == 1
    assert _count_struct_fields("struct<a:int,b:string>") == 2
    assert (
        _count_struct_fields("struct<a:array<struct<x:int,y:int>>,b:int>") == 2
    )
    assert _count_struct_fields("struct<m:map<string,int>,b:int>") == 2
    assert _count_struct_fields("struct<>") == 0
    assert _count_struct_fields("not a struct") == 0


def test_single_partition_exchange_counted_and_conf_restored(spark):
    """Global aggregates collect through Exchange SinglePartition — that is
    a real network pass and must count; audit_plan must also leave
    spark.sql.maxMetadataStringLength as it found it."""
    from polars_view_spark.plans.audit import audit_plan

    prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    df = spark.read.parquet(f"{SF}/lineitem.parquet").groupBy().count()
    a = audit_plan(df)
    assert "Exchange SinglePartition" in a.plan
    assert a.n_exchanges >= 1
    assert spark.conf.get("spark.sql.maxMetadataStringLength") == prev


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
