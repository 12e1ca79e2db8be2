"""merge_upsert / snapshot_diff edge semantics (catalog oracle gate covers
the bulk path; these pin the branch logic on hand-built rows)."""

import pytest

from polars_view_spark.operators.snapshot import merge_upsert, snapshot_diff


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (None, "n", 0.0)],
        "k int, s string, v double",
    )


class TestMergeUpsert:
    def test_all_branches(self, spark):
        changes = spark.createDataFrame(
            [
                (1, "a2", 11.0, False),   # matched → update
                (2, "b", 20.0, True),     # matched + delete → drop
                (9, "new", 90.0, False),  # not matched → insert
                (8, "gone", 0.0, True),   # delete of absent key → no insert
                (None, "n2", 1.0, False), # null key upserts null-safely
            ],
            "k int, s string, v double, is_delete boolean",
        )
        got = {r["k"]: r for r in merge_upsert(_base(spark), changes, ["k"], "is_delete").collect()}
        assert set(got) == {1, 9, None}
        assert (got[1]["s"], got[1]["v"]) == ("a2", 11.0)
        assert got[9]["s"] == "new"
        assert got[None]["s"] == "n2"  # updated, not duplicated

    def test_no_delete_col(self, spark):
        changes = spark.createDataFrame([(2, "b2", 21.0)], "k int, s string, v double")
        out = merge_upsert(_base(spark), changes, ["k"]).collect()
        assert len(out) == 3  # pure upsert, nothing deleted

    def test_composite_key(self, spark):
        base = spark.createDataFrame(
            [(1, "x", 10.0), (1, "y", 11.0)], "k int, k2 string, v double"
        )
        changes = spark.createDataFrame(
            [(1, "y", 99.0, False), (2, "x", 20.0, False)],
            "k int, k2 string, v double, is_delete boolean",
        )
        got = sorted(
            map(tuple, merge_upsert(base, changes, ["k", "k2"], "is_delete").collect())
        )
        assert got == [(1, "x", 10.0), (1, "y", 99.0), (2, "x", 20.0)]

    def test_validation(self, spark):
        bad = spark.createDataFrame([(1, "x")], "k int, s string")  # missing v
        with pytest.raises(ValueError, match="missing base columns"):
            merge_upsert(_base(spark), bad, ["k"])
        with pytest.raises(ValueError, match="non-empty"):
            merge_upsert(_base(spark), _base(spark), [])
        with pytest.raises(ValueError, match="delete column"):
            merge_upsert(_base(spark), _base(spark), ["k"], "nope")


class TestSnapshotDiff:
    def test_labels_and_minimality(self, spark):
        new = spark.createDataFrame(
            [(1, "a", 10.0),        # unchanged → dropped from diff
             (2, "b", 25.0),        # update
             (7, "ins", 70.0)],     # insert; (None,...) row deleted
            "k int, s string, v double",
        )
        got = {r["k"]: r for r in snapshot_diff(_base(spark), new, ["k"]).collect()}
        assert set(got) == {2, 7, None}
        assert got[2]["change_type"] == "update"
        assert (got[2]["old_v"], got[2]["new_v"]) == (20.0, 25.0)
        assert got[7]["change_type"] == "insert" and got[7]["old_s"] is None
        assert got[None]["change_type"] == "delete" and got[None]["old_s"] == "n"

    def test_diff_replays_through_merge(self, spark):
        """diff(old, new) applied back to old via merge_upsert reproduces
        new exactly — the CDC loop is closed."""
        from pyspark.sql import functions as F

        old = _base(spark)
        new = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b2", 25.0), (7, "ins", 70.0)],
            "k int, s string, v double",
        )
        d = snapshot_diff(old, new, ["k"])
        batch = d.select(
            "k",
            F.coalesce("new_s", "old_s").alias("s"),
            F.coalesce("new_v", "old_v").alias("v"),
            (F.col("change_type") == "delete").alias("is_delete"),
        )
        replayed = merge_upsert(old, batch, ["k"], "is_delete")
        assert sorted(map(tuple, replayed.collect())) == sorted(map(tuple, new.collect()))
