"""Sort cycle + container lifecycle tests (reference: src/sort.rs:39-61
5-state cycle, src/data_container.rs:247-309 sort, 122-129 fast path)."""

import pytest

from polars_view_spark.config import LoadConfig, SortBy, SortState
from polars_view_spark.container import DataContainer
from polars_view_spark.operators.sort import apply_sort


class TestSortCycle:
    def test_five_states(self):
        s = SortState.NOT_SORTED
        seq = []
        for _ in range(5):
            s = s.next_state()
            seq.append(s)
        assert seq == [
            SortState.DESC_NULLS_FIRST,
            SortState.ASC_NULLS_FIRST,
            SortState.DESC_NULLS_LAST,
            SortState.ASC_NULLS_LAST,
            SortState.NOT_SORTED,
        ]

    def test_from_state_roundtrip(self):
        for s in SortState:
            sb = SortBy.from_state("c", s)
            if s == SortState.NOT_SORTED:
                assert sb is None
            else:
                assert sb.state == s


class TestApplySort:
    @pytest.fixture()
    def df(self, spark):
        return spark.createDataFrame(
            [(1, None), (2, 5.0), (3, 1.0), (4, None), (5, 3.0)], "id int, v double"
        )

    def test_nulls_first_desc(self, df):
        out = apply_sort(df, [SortBy("v", ascending=False, nulls_last=False)])
        vals = [r["v"] for r in out.collect()]
        assert vals == [None, None, 5.0, 3.0, 1.0]

    def test_nulls_last_asc(self, df):
        out = apply_sort(df, [SortBy("v", ascending=True, nulls_last=True)])
        assert [r["v"] for r in out.collect()] == [1.0, 3.0, 5.0, None, None]

    def test_stability_tiebreaker(self, spark):
        # equal keys keep the frame's CURRENT order (reference
        # maintain_order=true); spark.range over 8 partitions has a
        # deterministic ascending layout
        df = spark.range(0, 100, 1, 8).selectExpr("CAST(id AS INT) AS id", "CAST(id % 2 AS INT) AS k")
        out = apply_sort(df, [SortBy("k")])
        ids = [r["id"] for r in out.collect()]
        evens = [i for i in ids if i % 2 == 0]
        odds = [i for i in ids if i % 2 == 1]
        assert evens == sorted(evens) and odds == sorted(odds)

    def test_multi_key_precedence(self, spark):
        df = spark.createDataFrame(
            [("b", 1), ("a", 2), ("a", 1), ("b", 2)], "g string, n int"
        )
        out = apply_sort(df, [SortBy("g"), SortBy("n", ascending=False)])
        assert [(r["g"], r["n"]) for r in out.collect()] == [
            ("a", 2),
            ("a", 1),
            ("b", 2),
            ("b", 1),
        ]

    def test_empty_criteria_noop(self, df):
        assert apply_sort(df, []) is df


class TestContainer:
    @pytest.fixture()
    def csv(self, tmp_path):
        p = tmp_path / "data.csv"
        p.write_text("id;name;v\n2;b;20\n1;a;10\n3;<N/D>;30\n")
        return str(p)

    def test_load_and_pipeline(self, spark, csv):
        c = DataContainer.load_data(
            spark,
            LoadConfig(path=csv, apply_sql=True, query="SELECT * FROM AllData WHERE id <= 2"),
        )
        assert c.shape() == (2, 3)
        # null markers applied: '<N/D>' -> NULL (filtered row not in view)
        assert c.loaded_format == "csv"

    def test_sort_and_reset(self, spark, csv):
        c = DataContainer.load_data(spark, LoadConfig(path=csv))
        sorted_c = c.with_sort([SortBy("id", ascending=False)])
        assert [r["id"] for r in sorted_c.df.collect()] == [3, 2, 1]
        reset = sorted_c.with_sort([])
        assert reset.sort == []
        assert {r["id"] for r in reset.df.collect()} == {1, 2, 3}

    def test_requery_fast_path(self, spark, csv):
        import os

        c = DataContainer.load_data(spark, LoadConfig(path=csv))
        os.remove(csv)  # file gone -> any re-read would now fail
        c2 = c.requery(
            spark, c.cfg.with_(apply_sql=True, query="SELECT COUNT(*) AS n FROM AllData")
        )
        assert c2.df.first()["n"] == 3  # served from cache, no re-read

    def test_schema_listing(self, spark, csv):
        c = DataContainer.load_data(spark, LoadConfig(path=csv))
        listing = c.schema_listing()
        assert [(i, n) for i, n, _ in listing] == [(0, "id"), (1, "name"), (2, "v")]
