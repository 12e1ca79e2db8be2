"""Shuffle-engineering tests: bucketed joins elide the exchange, salted
joins stay correct and spread the hot key."""

import re

import pytest


def n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"Exchange hashpartitioning", plan))


class TestBucketedJoin:
    def test_bucketed_join_has_no_shuffle(self, spark, tmp_path):
        from polars_view_spark.operators.scale import write_bucketed_table

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the issue
        a = spark.range(0, 10000).selectExpr("id AS k", "id * 2 AS va")
        b = spark.range(0, 10000).selectExpr("id AS k", "id * 3 AS vb")
        write_bucketed_table(a, "bt_a", ["k"], n_buckets=4, sort_cols=["k"])
        write_bucketed_table(b, "bt_b", ["k"], n_buckets=4, sort_cols=["k"])
        try:
            joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
            assert n_exchanges(joined) == 0, "bucketed join must not shuffle"
            assert joined.count() == 10000
        finally:
            spark.sql("DROP TABLE IF EXISTS bt_a")
            spark.sql("DROP TABLE IF EXISTS bt_b")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    def test_unbucketed_control(self, spark):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.range(0, 10000).selectExpr("id AS k", "id * 2 AS va")
        b = spark.range(0, 10000).selectExpr("id AS k", "id * 3 AS vb")
        assert n_exchanges(a.join(b, "k")) > 0  # the shuffle bucketing removes
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


class TestSaltedJoin:
    def test_correctness_under_skew(self, spark):
        from polars_view_spark.operators.scale import salted_join

        # 90% of left rows share one hot key
        left = spark.range(0, 5000).selectExpr(
            "CASE WHEN id % 10 < 9 THEN 7 ELSE id END AS k", "id AS v"
        )
        right = spark.createDataFrame(
            [(7, "hot"), (19, "cold")], "k long, name string"
        )
        got = salted_join(left, right, "k").groupBy("name").count().collect()
        want = {"hot": 4500, "cold": 1}
        assert {r["name"]: r["count"] for r in got} == want

    def test_matches_plain_join(self, spark):
        from polars_view_spark.operators.scale import salted_join

        left = spark.range(0, 1000).selectExpr("id % 13 AS k", "id AS v")
        right = spark.range(0, 13).selectExpr("id AS k", "id * 100 AS w")
        a = {(r["k"], r["v"], r["w"]) for r in salted_join(left, right, "k").collect()}
        b = {(r["k"], r["v"], r["w"]) for r in left.join(right, "k").collect()}
        assert a == b


class TestRuntimeBloomFilter:
    """Spark 4 injects a runtime bloom-filter semi-join on shuffle joins
    whose creation side is selective (on by default,
    ``spark.sql.optimizer.runtime.bloomFilter.enabled``).  At 100 TB a
    selective dim-filtered fact⋈fact join scans only the fact rows whose
    key survives the bloom filter — a row-group-level semi-join pushdown
    we get for free by keeping joins declarative.  The application-side
    scan at sf0.1 sits under the 10 GB activation threshold, so the test
    pins the behavior by lowering the threshold to simulate a scan that
    IS at scale; defaults stay untouched for real runs."""

    def test_selective_join_injects_bloom_filter(self, spark):
        import os

        sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        try:
            li = spark.read.parquet(f"{sf}/lineitem.parquet")
            o = spark.read.parquet(f"{sf}/orders.parquet").filter(
                "o_orderpriority = '1-URGENT'"
            )
            j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
                "o_orderpriority"
            ).count()
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "bloom_filter_agg" in plan, "runtime bloom filter not injected"
            # correctness: identical to the no-bloom control
            spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
            control = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
                "o_orderpriority"
            ).count()
            assert sorted(map(tuple, j.collect())) == sorted(map(tuple, control.collect()))
        finally:
            spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
            spark.conf.unset(
                "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
            )
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
