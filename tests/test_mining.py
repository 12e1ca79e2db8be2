"""Frequent-pair mining (operators/mining.py) — semantics + plan gates."""

import re

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestFrequentPairs:
    def test_set_semantics_and_support(self, spark):
        """Duplicate (basket, item) rows collapse before counting; pairs
        below min_support are dropped; item order is canonical (a < b)."""
        from polars_view_spark.operators.mining import frequent_pairs

        df = spark.createDataFrame(
            [
                (1, "x"), (1, "y"), (1, "y"),   # dup (1,y) must not double-count
                (2, "x"), (2, "y"),
                (3, "x"), (3, "z"),
                (4, "z"), (4, "x"),
            ],
            "b int, i string",
        )
        got = {tuple(r) for r in frequent_pairs(df, "b", "i", 2).collect()}
        assert got == {("x", "y", 2), ("x", "z", 2)}

        # support 3: no pair survives
        assert frequent_pairs(df, "b", "i", 3).count() == 0

    def test_apriori_prune_is_lossless(self, spark):
        """Pairs from the pruned path equal pairs from an unpruned
        self-join — the prune removes work, never results."""
        from pyspark.sql import functions as F

        from polars_view_spark.catalog import load_tables
        from polars_view_spark.operators.mining import frequent_pairs

        li = load_tables(spark, SF, "lineitem")["lineitem"]
        got = {
            tuple(r)
            for r in frequent_pairs(li, "l_orderkey", "l_partkey", 2).collect()
        }
        items = li.select(
            F.col("l_orderkey").alias("b"), F.col("l_partkey").alias("i")
        ).distinct()
        a, b = items.alias("a"), items.alias("b")
        want = {
            tuple(r)
            for r in (
                a.join(b, (F.col("a.b") == F.col("b.b")) & (F.col("a.i") < F.col("b.i")))
                .groupBy(F.col("a.i").alias("item_a"), F.col("b.i").alias("item_b"))
                .agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
                .filter(F.col("n_baskets") >= 2)
            ).collect()
        }
        assert got == want and len(got) > 0

    def test_plan_no_cartesian_partial_agg(self, spark):
        from polars_view_spark.catalog import load_tables
        from polars_view_spark.operators.mining import frequent_pairs

        li = load_tables(spark, SF, "lineitem")["lineitem"]
        plan = plan_of(frequent_pairs(li, "l_orderkey", "l_partkey", 2))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # pair counting must map-side combine
        assert len(re.findall(r"HashAggregate", plan)) >= 2
