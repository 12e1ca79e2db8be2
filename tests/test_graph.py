"""Semantic tests for operators/graph.py (PageRank)."""

import pytest


def _ranks(spark, rows, **kw):
    from polars_view_spark.operators.graph import pagerank

    e = spark.createDataFrame(rows, "src long, dst long, w long")
    return {
        r["v"]: r["rank"]
        for r in pagerank(e, weight_col="w", **kw).collect()
    }


class TestPageRank:
    def test_star_center_dominates(self, spark):
        # every leaf points at the hub: the hub must out-rank all leaves
        rows = [(i, 0, 1) for i in range(1, 6)]
        got = _ranks(spark, rows)
        assert got[0] > max(v for k, v in got.items() if k != 0)

    def test_weight_shifts_rank(self, spark):
        # two sinks, one receives 9× the edge weight from the same source
        rows = [(0, 1, 9), (0, 2, 1)]
        got = _ranks(spark, rows)
        assert got[1] > got[2]

    def test_dangling_nodes_keep_base_rank(self, spark):
        # node 2 has no out-edges (dangling) and no in-edges beyond the
        # chain; its mass is dropped, not redistributed — it still gets
        # the (1-d)·scale/N base term every iteration
        rows = [(0, 1, 1), (1, 2, 1)]
        got = _ranks(spark, rows)
        assert set(got) == {0, 1, 2}
        assert got[0] > 0 and got[2] > got[0]  # 0 gets base only; 2 inherits

    def test_deterministic_across_partitionings(self, spark):
        from polars_view_spark.operators.graph import pagerank

        rows = [(i % 7, (i * 3) % 7, 1 + i % 4) for i in range(40)]
        e = spark.createDataFrame(rows, "src long, dst long, w long")
        a = sorted(tuple(r) for r in pagerank(e, weight_col="w").collect())
        b = sorted(
            tuple(r)
            for r in pagerank(e.repartition(13), weight_col="w").collect()
        )
        assert a == b  # integer sums: exact in any accumulation order

    def test_empty_graph_raises(self, spark):
        from polars_view_spark.operators.graph import pagerank

        e = spark.createDataFrame([], "src long, dst long, w long")
        with pytest.raises(ValueError, match="empty graph"):
            pagerank(e, weight_col="w")

    def test_unweighted_default(self, spark):
        from polars_view_spark.operators.graph import pagerank

        e = spark.createDataFrame([(0, 1), (2, 1)], "src long, dst long")
        got = {r["v"]: r["rank"] for r in pagerank(e).collect()}
        assert got[1] > got[0] == got[2]
