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


class TestZorder:
    def test_key_math_matches_reference(self, spark):
        # interleave(x, y) on a known grid must equal a bit-twiddling
        # Python reference: x's bits land at even positions, y's at odd
        from polars_view_spark.operators.scale import zorder_key_sql

        df = spark.range(64).selectExpr("id % 8 AS x", "CAST(id / 8 AS BIGINT) AS y")
        got = {
            (r["x"], r["y"]): r["z"]
            for r in df.selectExpr("x", "y", f"{zorder_key_sql(['x', 'y'], 3)} AS z").collect()
        }

        def ref(x, y):
            z = 0
            for b in range(3):
                z |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
            return z

        assert got == {(x, y): ref(x, y) for x in range(8) for y in range(8)}

    @staticmethod
    def _files_intersecting(path, col, lo, hi):
        import glob

        import pyarrow.parquet as pq

        hit, tot = 0, 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = next(
                j
                for j in range(md.num_columns)
                if md.row_group(0).column(j).path_in_schema == col
            )
            mn = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            mx = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            tot += 1
            hit += 1 if (mx >= lo and mn <= hi) else 0
        return hit, tot

    def test_zorder_prunes_both_columns(self, spark, tmp_path):
        # a 64x64 grid z-ordered into 16 files: a 25%-range predicate on
        # EITHER column must touch only a strip of the files, where a
        # linear x-sorted layout serves x but leaves y unprunable
        from polars_view_spark.operators.scale import write_zordered

        grid = spark.range(4096).selectExpr(
            "id % 64 AS x", "CAST(id / 64 AS BIGINT) AS y", "id AS payload"
        )
        zp, lp = str(tmp_path / "z"), str(tmp_path / "lin")
        write_zordered(grid, zp, ["x", "y"], n_files=16, bits=6)
        grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lp)

        z_x = self._files_intersecting(zp, "x", 0, 15)
        z_y = self._files_intersecting(zp, "y", 0, 15)
        lin_y = self._files_intersecting(lp, "y", 0, 15)
        assert z_x[1] == 16 and z_y[1] == 16
        # strip of a 4x4 file grid: at most half the files on each axis
        assert z_x[0] <= 8, z_x
        assert z_y[0] <= 8, z_y
        # the control: linear layout cannot prune the secondary column
        assert lin_y[0] == lin_y[1], lin_y

    def test_zorder_is_layout_only(self, spark, tmp_path):
        from polars_view_spark.operators.scale import write_zordered

        df = spark.range(500).selectExpr("id AS a", "CAST(md5(CAST(id AS STRING)) AS STRING) AS s")
        out = str(tmp_path / "zl")
        write_zordered(df, out, ["a"], n_files=4, bits=8)
        back = spark.read.parquet(out)
        assert sorted(r["a"] for r in back.collect()) == list(range(500))
        assert back.columns == ["a", "s"]

    def test_key_wider_than_bigint_refused(self, spark):
        # 5 cols x 16 bits = 80 positions > 63: Java's long shift would
        # wrap mod 64 and silently fold distinct bits together — must
        # refuse loudly instead
        from polars_view_spark.operators.scale import zorder_key_sql

        with pytest.raises(ValueError, match="63"):
            zorder_key_sql(["a", "b", "c", "d", "e"], 16)

    def test_write_zordered_auto_bits_for_many_cols(self, spark, tmp_path):
        # bits=None derives a width that fits: 5 cols -> 12 bits each
        from polars_view_spark.operators.scale import write_zordered

        df = spark.range(100).selectExpr(
            "id AS a", "id % 7 AS b", "id % 5 AS c", "id % 3 AS d", "id % 2 AS e"
        )
        out = str(tmp_path / "many")
        write_zordered(df, out, ["a", "b", "c", "d", "e"], n_files=4)
        assert spark.read.parquet(out).count() == 100

    def test_write_zordered_empty_and_all_null(self, spark, tmp_path):
        # empty input and all-NULL clustering columns degrade to a
        # constant key component — every row still lands
        from polars_view_spark.operators.scale import write_zordered

        empty = spark.createDataFrame([], "a long, b long")
        write_zordered(empty, str(tmp_path / "empty"), ["a", "b"], n_files=2)
        assert spark.read.parquet(str(tmp_path / "empty")).count() == 0

        nul = spark.range(10).selectExpr("id AS a", "CAST(NULL AS BIGINT) AS b")
        write_zordered(nul, str(tmp_path / "nul"), ["a", "b"], n_files=2)
        back = spark.read.parquet(str(tmp_path / "nul"))
        assert back.count() == 10 and back.filter("b IS NULL").count() == 10


class TestParquetBloom:
    def test_bloom_written_and_definitely_absent_guarantee(self, spark, tmp_path):
        """write_bloom_indexed puts a Bloom filter on exactly the
        requested column; every present value probes maybe-present and
        absent values overwhelmingly probe definitely-absent (the
        guarantee row-group skipping relies on)."""
        import glob

        from polars_view_spark.operators.scale import (
            bloom_columns_of,
            bloom_might_contain,
            write_bloom_indexed,
        )

        out = str(tmp_path / "bloomed")
        df = spark.range(500).selectExpr(
            "id", "md5(CAST(id AS STRING)) AS key", "CAST(id % 5 AS STRING) AS lang"
        ).coalesce(1)
        write_bloom_indexed(df, out, {"key": 500})
        f = glob.glob(out + "/part-*.parquet")[0]
        assert bloom_columns_of(spark, f) == {"key"}
        import hashlib

        present = [hashlib.md5(str(i).encode()).hexdigest() for i in range(0, 500, 25)]
        absent = [f"not-a-key-{i}" for i in range(40)]
        assert all(bloom_might_contain(spark, f, "key", present))  # no false negatives
        fp = sum(bloom_might_contain(spark, f, "key", absent))
        assert fp <= 4, fp  # 1% target FPP; 4/40 is far beyond noise already

    def test_plain_write_has_no_bloom(self, spark, tmp_path):
        """Blooms are strictly opt-in: a default parquet write carries
        none, so the footer probe itself is proven discriminating (a
        helper that said 'bloom present' for every file would pass the
        positive test above vacuously)."""
        import glob

        out = str(tmp_path / "plain")
        df = spark.range(500).selectExpr(
            "id", "md5(CAST(id AS STRING)) AS key"
        ).coalesce(1)
        df.write.mode("overwrite").parquet(out)
        from polars_view_spark.operators.scale import bloom_columns_of

        f = glob.glob(out + "/part-*.parquet")[0]
        assert bloom_columns_of(spark, f) == set()


class TestMergePartialAggs:
    def test_merge_equals_full_recompute_any_split(self, spark):
        """Merging partials from a 3-way split must equal the aggregate
        over the union — for every mergeable accumulator."""
        from pyspark.sql import functions as F

        from polars_view_spark.operators.scale import merge_partial_aggs

        df = spark.range(1000).select(
            (F.col("id") % 7).alias("k"), (F.col("id") * 3 % 101).alias("v")
        )

        def part(d):
            return d.groupBy("k").agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("v").cast("long").alias("s"),
                F.min("v").cast("long").alias("mn"),
                F.max("v").cast("long").alias("mx"),
            )

        spec = {"n": "sum", "s": "sum", "mn": "min", "mx": "max"}
        parts = [part(df.filter(f"id % 3 = {i}")) for i in range(3)]
        merged = {
            r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
            for r in merge_partial_aggs(parts, ["k"], spec).collect()
        }
        full = {
            r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
            for r in part(df).collect()
        }
        assert merged == full

    def test_non_mergeable_accumulator_rejected(self, spark):
        from pyspark.sql import functions as F

        from polars_view_spark.operators.scale import merge_partial_aggs

        df = spark.range(10).select(F.lit(1).alias("k"), F.col("id").alias("a"))
        import pytest as _pytest

        with _pytest.raises(ValueError, match="non-mergeable"):
            merge_partial_aggs([df], ["k"], {"a": "avg"})


class TestJoinExplosionProfile:
    def test_exact_cardinality_and_heavy_key_first(self, spark):
        """The profile's total must equal the TRUE join output count, and
        the planted many-to-many key must rank first."""
        from pyspark.sql import functions as F

        from polars_view_spark.operators.scale import join_explosion_profile

        left = spark.createDataFrame(
            [(99,)] * 50 + [(i,) for i in range(10)], "k long"
        )
        right = spark.createDataFrame(
            [(99,)] * 40 + [(i,) for i in range(5)], "k long"
        )
        prof = join_explosion_profile(left, right, "k", "k", k=3).collect()
        assert prof[0]["join_key"] == 99
        assert prof[0]["out_rows"] == 50 * 40
        true_count = left.join(right, "k").count()
        assert prof[0]["total_out_rows"] == true_count == 50 * 40 + 5


class TestExpectations:
    def test_each_rule_kind_counts_planted_violations(self, spark):
        from polars_view_spark.operators.expectations import (
            expectations_report,
        )

        df = spark.createDataFrame(
            [
                (1, 10.0, "A", 1),
                (1, -5.0, "B", 2),     # dup key + below range
                (None, 20.0, "Z", 3),  # null key + bad status
                (4, None, "A", 99),    # null price + dangling ref
            ],
            "k long, price double, status string, fk long",
        )
        dim = spark.createDataFrame([(1,), (2,), (3,)], "d long")
        rules = [
            {"name": "k_not_null", "kind": "not_null", "column": "k"},
            {"name": "k_unique", "kind": "unique", "column": "k"},
            {"name": "price_range", "kind": "in_range", "column": "price",
             "low": 0, "high": 100},
            {"name": "status_ok", "kind": "accepted_values",
             "column": "status", "values": ["A", "B"]},
            {"name": "fk_exists", "kind": "references", "column": "fk",
             "ref": "dim", "ref_column": "d"},
        ]
        out = {
            r["rule"]: (r["n_checked"], r["n_violations"], r["passed"])
            for r in expectations_report(df, rules, {"dim": dim}).collect()
        }
        assert out == {
            "fk_exists": (4, 1, False),
            "k_not_null": (4, 1, False),
            "k_unique": (4, 1, False),       # NULLs don't count as dups
            "price_range": (4, 2, False),    # -5 and NULL both violate
            "status_ok": (4, 1, False),
        }

    def test_duplicate_rule_names_rejected(self, spark):
        import pytest as _pytest

        from polars_view_spark.operators.expectations import (
            expectations_report,
        )

        df = spark.range(3).selectExpr("id AS k")
        rules = [
            {"name": "r", "kind": "not_null", "column": "k"},
            {"name": "r", "kind": "unique", "column": "k"},
        ]
        with _pytest.raises(ValueError, match="duplicate rule names"):
            expectations_report(df, rules)

    def test_malformed_rule_inputs_rejected_loudly(self, spark):
        """Identifier-shape validation and quote escaping: a quoted value
        must survive as DATA, malformed names/columns and zero rules must
        raise clear ValueErrors — never a ParseException from spliced SQL."""
        import pytest as _pytest

        from polars_view_spark.operators.expectations import (
            expectations_report,
        )

        df = spark.createDataFrame(
            [("don't",), ("fine",)], "status string"
        )
        # quoted value is escaped, not injected
        out = expectations_report(
            df,
            [{"name": "ok_vals", "kind": "accepted_values",
              "column": "status", "values": ["don't", "fine"]}],
        ).collect()
        assert out[0]["n_violations"] == 0
        for bad_rules, msg in [
            ([], "non-empty"),
            ([{"name": "price range", "kind": "not_null", "column": "status"}],
             "identifier"),
            ([{"name": "r", "kind": "not_null", "column": "sta tus"}],
             "identifier"),
            ([{"name": "fk", "kind": "references", "column": "status",
               "ref": "dim", "ref_column": "d"}],
             "ref_frames"),
        ]:
            with _pytest.raises(ValueError, match=msg):
                expectations_report(df, bad_rules)

    def test_distribution_rules_decide_on_exact_and_assert_sketches(self, spark):
        """Distribution kinds (VERDICT r06 task 7): quantile-range,
        distinct-range and drift-vs-snapshot evaluate in the same single
        aggregate; the EXACT metric decides pass/fail, the KLL/Theta
        twins must self-assert within tolerance, and row rules carry
        NULL observed/sketch_ok."""
        from polars_view_spark.operators.expectations import (
            expectations_report,
        )

        # values 1..100 → median 50.5, p95 95.05, 100 distinct keys
        df = spark.range(1, 101).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        )
        # snapshot: 1..80 → median 40.5 → rel change (50.5-40.5)/40.5 ≈ .2469
        snap = spark.range(1, 81).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        )
        rules = [
            {"name": "k_not_null", "kind": "not_null", "column": "k"},
            {"name": "median_band", "kind": "quantile_range", "column": "v",
             "q": 0.5, "low": 40, "high": 60},
            {"name": "p95_cap", "kind": "quantile_range", "column": "v",
             "q": 0.95, "low": 0, "high": 90},  # 95.05 > 90 → FAIL
            {"name": "k_card", "kind": "distinct_range", "column": "k",
             "low": 50, "high": 200},
            {"name": "median_drift_ok", "kind": "quantile_drift",
             "column": "v", "q": 0.5, "ref": "snap", "max_rel_change": 0.5},
            {"name": "median_drift_bad", "kind": "quantile_drift",
             "column": "v", "q": 0.5, "ref": "snap", "max_rel_change": 0.1},
            {"name": "k_drift", "kind": "distinct_drift", "column": "k",
             "ref": "snap", "max_rel_change": 0.5},  # (100-80)/80 = .25
        ]
        out = {
            r["rule"]: r
            for r in expectations_report(df, rules, {"snap": snap}).collect()
        }
        assert out["k_not_null"]["passed"]
        assert out["k_not_null"]["observed"] is None
        assert out["k_not_null"]["sketch_ok"] is None
        assert out["median_band"]["passed"]
        assert out["median_band"]["observed"] == 50.5
        assert not out["p95_cap"]["passed"]
        assert out["p95_cap"]["observed"] == 95.05
        assert out["k_card"]["passed"] and out["k_card"]["observed"] == 100.0
        assert out["median_drift_ok"]["passed"]
        assert out["median_drift_ok"]["observed"] == round(10 / 40.5, 6)
        assert not out["median_drift_bad"]["passed"]
        assert out["k_drift"]["passed"] and out["k_drift"]["observed"] == 0.25
        # every distribution rule's sketch twin tracked its exact value
        for name in ("median_band", "p95_cap", "k_card",
                     "median_drift_ok", "median_drift_bad", "k_drift"):
            assert out[name]["sketch_ok"] is True, name
        # n_checked is the FACT side's row count for every rule
        assert all(r["n_checked"] == 100 for r in out.values())

    def test_distribution_rule_validation(self, spark):
        import pytest as _pytest

        from polars_view_spark.operators.expectations import (
            expectations_report,
        )

        df = spark.range(5).selectExpr("CAST(id AS DOUBLE) AS v")
        with _pytest.raises(ValueError, match="ref_frames"):
            expectations_report(
                df,
                [{"name": "d", "kind": "quantile_drift", "column": "v",
                  "ref": "snap", "max_rel_change": 0.1}],
            )
        with _pytest.raises(ValueError, match="q must be"):
            expectations_report(
                df,
                [{"name": "qr", "kind": "quantile_range", "column": "v",
                  "q": 1.5, "low": 0, "high": 1}],
            )
        with _pytest.raises(ValueError, match="max_rel_change"):
            expectations_report(
                df,
                [{"name": "d", "kind": "quantile_drift", "column": "v",
                  "ref": "s", "max_rel_change": -0.1}],
                {"s": df},
            )

    def test_persisted_profile_matches_live_frame_drift(self, spark, tmp_path):
        """A drift gate fed a persisted snapshot profile must produce the
        SAME report as one aggregating the live snapshot frame — the
        profile is a cache of the snapshot's metrics, never a semantic
        change; and asking a profile for a metric it does not hold fails
        loudly, never as an empty report."""
        import pytest as _pytest

        from polars_view_spark.operators.expectations import (
            expectations_report,
            snapshot_profile,
        )

        df = spark.range(1, 101).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
        snap = spark.range(1, 81).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
        rules = [
            {"name": "v_drift", "kind": "quantile_drift", "column": "v",
             "q": 0.5, "ref": "snap", "max_rel_change": 0.5},
            {"name": "k_drift", "kind": "distinct_drift", "column": "k",
             "ref": "snap", "max_rel_change": 0.1},  # 0.25 > 0.1 → FAIL
        ]
        live = sorted(
            map(tuple, expectations_report(df, rules, {"snap": snap}).collect())
        )
        prof = str(tmp_path / "profile")
        snapshot_profile(snap, rules, prof)
        from_profile = sorted(
            map(tuple, expectations_report(df, rules, ref_profiles={"snap": prof}).collect())
        )
        assert from_profile == live

        with _pytest.raises(ValueError, match="no metric"):
            expectations_report(
                df,
                [{"name": "q9", "kind": "quantile_drift", "column": "v",
                  "q": 0.9, "ref": "snap", "max_rel_change": 0.5}],
                ref_profiles={"snap": prof},
            )
        with _pytest.raises(ValueError, match="nothing to profile"):
            snapshot_profile(snap, [{"name": "r", "kind": "not_null", "column": "k"}], prof)


class TestParetoFrontier:
    def test_matches_not_exists_spec(self, spark):
        """Both the engine's bucketed prefix-scan AND the oracle's sorted
        sweep must equal the NOT EXISTS dominance definition."""
        from pyspark.sql import functions as F

        from polars_view_spark.catalog import load_tables
        from polars_view_spark.operators.scale import pareto_frontier

        t = load_tables(spark, "/root/testdata/sf0.001", "orders")
        o = t["orders"].select(
            "o_totalprice", F.col("o_orderdate").cast("date").alias("odate")
        )
        got = sorted(
            tuple(r) for r in pareto_frontier(o, "o_totalprice", "odate").collect()
        )
        pts = o.groupBy(
            F.col("o_totalprice").alias("d1"), F.col("odate").alias("d2")
        ).agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        pts.createOrReplaceTempView("pareto_pts")
        want = sorted(
            tuple(r)
            for r in spark.sql(
                """
                SELECT d1, d2, n_rows FROM pareto_pts p
                WHERE NOT EXISTS (
                  SELECT 1 FROM pareto_pts q
                  WHERE q.d1 >= p.d1 AND q.d2 >= p.d2
                    AND (q.d1 > p.d1 OR q.d2 > p.d2))
                """
            ).collect()
        )
        assert got == want and len(got) > 0

    def test_bucket_decomposition_edge_cases(self, spark):
        """Single-value d1 (span 0), n_buckets=1 (pure within-bucket
        sweep), and duplicate points collapsing with counts."""
        from polars_view_spark.operators.scale import pareto_frontier

        df = spark.createDataFrame(
            [(5, 1), (5, 9), (5, 9), (5, 3)], "a int, b int"
        )
        got = {tuple(r) for r in pareto_frontier(df, "a", "b").collect()}
        assert got == {(5, 9, 2)}

        df2 = spark.createDataFrame(
            [(1, 10), (2, 9), (3, 8), (2, 11), (3, 1)], "a int, b int"
        )
        for nb in (1, 2, 64):
            got2 = {
                tuple(r) for r in pareto_frontier(df2, "a", "b", n_buckets=nb).collect()
            }
            assert got2 == {(2, 11, 1), (3, 8, 1)}, (nb, got2)

    def test_plan_shape(self, spark):
        """No cartesian product, no Python eval; the data-level window is
        PARTITIONED (the only global window runs over the 64-row bucket
        seed frame)."""
        from pyspark.sql import functions as F

        from polars_view_spark.catalog import load_tables
        from polars_view_spark.operators.scale import pareto_frontier

        t = load_tables(spark, "/root/testdata/sf0.001", "orders")
        o = t["orders"].select(
            "o_totalprice", F.col("o_orderdate").cast("date").alias("odate")
        )
        plan = pareto_frontier(o, "o_totalprice", "odate")._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # the data-level window is keyed by the bucket column (first arg
        # of its windowspecdefinition), so it parallelizes across buckets
        import re

        specs = re.findall(r"windowspecdefinition\(([^,)]+)", plan)
        assert any(s.strip().startswith("b#") for s in specs), specs


class TestPrefixSumsAndKS:
    def test_prefix_sums_match_global_window(self, spark):
        """bucketed_prefix_sums == a plain global-order window, at every
        bucket count (incl. 1 = pure window, and > distinct values)."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from polars_view_spark.operators.scale import bucketed_prefix_sums

        df = spark.range(200).select(
            (F.col("id") * 37 % 199).alias("v"),
            (F.col("id") % 5).alias("x"),
            F.lit(1).alias("y"),
        ).groupBy("v").agg(F.sum("x").alias("x"), F.sum("y").alias("y"))
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        want = {
            r["v"]: (r["cx"], r["cy"])
            for r in df.select(
                "v", F.sum("x").over(w).alias("cx"), F.sum("y").over(w).alias("cy")
            ).collect()
        }
        for nb in (1, 4, 64, 1000):
            got = {
                r["v"]: (r["cum_x"], r["cum_y"])
                for r in bucketed_prefix_sums(df, "v", ["x", "y"], nb).collect()
            }
            assert got == want, nb

    def test_ks_identical_samples_zero(self, spark):
        from pyspark.sql import functions as F

        from polars_view_spark.catalog import load_tables
        from polars_view_spark.operators.scale import ks_statistic

        ev = load_tables(spark, "/root/testdata/sf0.001", "events")["events"]
        a = ev.filter(F.col("event_type") == "click").select("value")
        r = ks_statistic(a, a, "value").first()
        assert r["ks_num"] == 0 and r["ks_ppm"] == 0

    def test_ks_disjoint_samples_max(self, spark):
        """Fully separated samples reach KS = 1 (ppm 1e6 at the crossing)."""
        from polars_view_spark.operators.scale import ks_statistic

        a = spark.createDataFrame([(float(i),) for i in range(10)], "value double")
        b = spark.createDataFrame([(float(i + 100),) for i in range(7)], "value double")
        r = ks_statistic(a, b, "value").first()
        assert r["ks_num"] == 10 * 7 and r["ks_ppm"] == 1_000_000
        assert r["ks_at"] == 9.0

    def test_ks_window_is_partitioned(self, spark):
        from pyspark.sql import functions as F

        from polars_view_spark.catalog import load_tables
        from polars_view_spark.operators.scale import ks_statistic

        ev = load_tables(spark, "/root/testdata/sf0.001", "events")["events"]
        plan = ks_statistic(
            ev.filter(F.col("event_type") == "click").select("value"),
            ev.filter(F.col("event_type") == "view").select("value"),
            "value",
        )._jdf.queryExecution().executedPlan().toString()
        import re as _re

        specs = _re.findall(r"windowspecdefinition\(([^,)]+)", plan)
        # the data-level cumsum window is keyed by the bucket column
        assert any(s.strip().startswith("__b#") for s in specs), specs
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestFunnelRetention:
    """Round-10 event analytics: ordered funnel DP and weekly retention
    cohorts (operators/events.py) — semantics pinned on hand cases, plan
    shape pinned on shuffle counts."""

    def _events(self, spark, rows):
        from pyspark.sql import functions as F

        return spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string"
        ).withColumn("ts", F.to_timestamp("ts"))

    def test_funnel_strict_order_semantics(self, spark):
        """User 10 has all three types in REVERSE order (counts only for
        step 1); user 30's click shares its view's timestamp (strictly-
        after fails); user 20 converts fully."""
        from polars_view_spark.operators.events import funnel_steps

        df = self._events(spark, [
            (1, "2024-01-01 00:00:00", 10, "purchase"),
            (2, "2024-01-01 00:01:00", 10, "click"),
            (3, "2024-01-01 00:02:00", 10, "view"),
            (4, "2024-01-01 00:00:00", 20, "view"),
            (5, "2024-01-01 00:01:00", 20, "click"),
            (6, "2024-01-01 00:02:00", 20, "purchase"),
            (7, "2024-01-01 00:00:00", 30, "view"),
            (8, "2024-01-01 00:00:00", 30, "click"),
        ])
        got = [tuple(r) for r in funnel_steps(df).collect()]
        assert got == [(1, "view", 3), (2, "click", 1), (3, "purchase", 1)]

    def test_funnel_step2_before_later_view_still_counts(self, spark):
        """The DP carries the EARLIEST qualifying timestamp: a click after
        the first view qualifies even when more views follow, and a
        purchase between click and a later view still converts."""
        from polars_view_spark.operators.events import funnel_steps

        df = self._events(spark, [
            (1, "2024-01-01 00:00:00", 1, "view"),
            (2, "2024-01-01 00:01:00", 1, "click"),
            (3, "2024-01-01 00:02:00", 1, "purchase"),
            (4, "2024-01-01 00:03:00", 1, "view"),
        ])
        got = [tuple(r) for r in funnel_steps(df).collect()]
        assert got == [(1, "view", 1), (2, "click", 1), (3, "purchase", 1)]

    def test_funnel_one_shuffle_no_join(self, spark):
        """The three chained windows and the per-user collapse share ONE
        user-keyed Exchange; the step unpivot is an explode, not a join."""
        from polars_view_spark.operators.events import funnel_steps

        df = self._events(spark, [(1, "2024-01-01 00:00:00", 1, "view")])
        plan = (
            funnel_steps(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
        assert "Join" not in plan and "CartesianProduct" not in plan

    def test_retention_hand_case(self, spark):
        """User 1 first active in week of Jan 1 (Mon), active again 2
        weeks later; user 2 cohorts one week later, active only then."""
        from polars_view_spark.operators.events import retention_cohorts

        df = self._events(spark, [
            (1, "2024-01-02 10:00:00", 1, "view"),
            (2, "2024-01-16 10:00:00", 1, "click"),
            (3, "2024-01-10 10:00:00", 2, "view"),
        ])
        got = [
            (str(r["cohort_week"]), r["week_offset"], r["n_active_users"])
            for r in retention_cohorts(df).collect()
        ]
        assert got == [
            ("2024-01-01", 0, 1),
            ("2024-01-01", 2, 1),
            ("2024-01-08", 0, 1),
        ]

    def test_retention_two_shuffles(self, spark):
        """The collect_set dedup rides the window's user partitioning
        (alias-aware propagation requires keeping the key's NAME — a
        rename re-introduced a third shuffle); only the window and the
        cohort rollup exchange."""
        from polars_view_spark.operators.events import retention_cohorts

        df = self._events(spark, [(1, "2024-01-01 00:00:00", 1, "view")])
        assert n_exchanges(retention_cohorts(df)) == 2


class TestPSIDrift:
    def test_identical_distributions_zero_terms(self, spark):
        """Same sample on both sides → p_i == q_i everywhere → every
        psi_term is exactly 0.0 and all k buckets appear."""
        from polars_view_spark.operators.scale import psi_drift

        df = spark.range(100).selectExpr("CAST(id % 7 AS DOUBLE) AS value")
        out = psi_drift(df, df, "value").collect()
        assert len(out) == 10
        assert all(r["psi_term"] == 0.0 for r in out)
        assert sum(r["n_ref"] for r in out) == 100

    def test_shifted_mass_lands_in_edge_buckets(self, spark):
        """Current values beyond the REFERENCE max clamp into the top
        bucket (the convention that makes new-regime mass visible), the
        clamp floor keeps ln finite for empty reference buckets, and the
        drifted side's top-bucket term is positive for q > p."""
        from polars_view_spark.operators.scale import psi_drift

        ref = spark.range(100).selectExpr("CAST(id % 10 AS DOUBLE) AS value")
        cur = spark.range(100).selectExpr("CAST(50 + id % 3 AS DOUBLE) AS value")
        out = {r["bucket"]: r for r in psi_drift(ref, cur, "value").collect()}
        assert len(out) == 10
        assert out[9]["n_cur"] == 100  # all drifted mass clamps to top
        assert out[9]["psi_term"] > 0  # (p-q)·ln(p/q) > 0 whenever p ≠ q
        assert all(v["psi_term"] >= 0 for v in out.values())

    def test_plan_tiny_shuffle_only(self, spark):
        """Shuffled bytes are O(k): one map-side-combined groupBy onto
        <=k buckets; edges/totals are one-row broadcasts; no cartesian."""
        from polars_view_spark.operators.scale import psi_drift

        df = spark.range(100).selectExpr("CAST(id % 7 AS DOUBLE) AS value")
        plan = (
            psi_drift(df, df, "value")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2


class TestGroupedMedianTransitions:
    def test_lower_median_convention(self, spark):
        """Odd group → true middle; even group → LOWER median (an element
        of the data, no float midpoint); nulls excluded from n."""
        from polars_view_spark.operators.scale import grouped_exact_median

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 3.0), ("a", 9.0),        # odd: median 3
             ("b", 1.0), ("b", 2.0), ("b", 7.0), ("b", 8.0),  # even: lower 2
             ("c", 5.0), ("c", None)],                  # null dropped: n=1
            "g string, v double",
        )
        got = {r["g"]: (r["median"], r["n_rows"])
               for r in grouped_exact_median(df, "g", "v").collect()}
        assert got == {"a": (3.0, 3), "b": (2.0, 4), "c": (5.0, 1)}

    def test_median_duplicate_mass(self, spark):
        """Duplicated values collapse to one (group,value) row but keep
        full weight: [1,2,2,2,9] → median 2."""
        from polars_view_spark.operators.scale import grouped_exact_median

        df = spark.createDataFrame(
            [("a", v) for v in (1.0, 2.0, 2.0, 2.0, 9.0)], "g string, v double"
        )
        [r] = grouped_exact_median(df, "g", "v").collect()
        assert (r["median"], r["n_rows"]) == (2.0, 5)

    def test_transitions_hand_sequence(self, spark):
        """view→click→click→purchase for one user plus a 1-event user (no
        pairs): counts and integer ppm shares per from_type."""
        from pyspark.sql import functions as F

        from polars_view_spark.operators.events import event_transitions

        df = spark.createDataFrame(
            [
                (1, "2024-01-01 00:00:00", 1, "view"),
                (2, "2024-01-01 00:01:00", 1, "click"),
                (3, "2024-01-01 00:02:00", 1, "click"),
                (4, "2024-01-01 00:03:00", 1, "purchase"),
                (5, "2024-01-01 00:00:00", 2, "view"),
            ],
            "event_id long, ts string, user_id long, event_type string",
        ).withColumn("ts", F.to_timestamp("ts"))
        got = [tuple(r) for r in event_transitions(df).collect()]
        assert got == [
            ("click", "click", 1, 500000),
            ("click", "purchase", 1, 500000),
            ("view", "click", 1, 1000000),
        ]

    def test_plans_no_global_window_no_selfjoin(self, spark):
        """Median: group-partitioned windows only (no empty-partition
        global window).  Transitions: lag over the user partitioning,
        zero Join nodes."""
        from pyspark.sql import functions as F

        from polars_view_spark.operators.events import event_transitions
        from polars_view_spark.operators.scale import grouped_exact_median

        ev = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", 1, "view", 1.0)],
            "event_id long, ts string, user_id long, event_type string, value double",
        ).withColumn("ts", F.to_timestamp("ts"))
        p1 = (
            grouped_exact_median(ev, "event_type", "value")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "partitionBy=[]" not in p1.replace(" ", "")
        p2 = event_transitions(ev)._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in p2 and "CartesianProduct" not in p2


class TestGroupedQuantileMAD:
    def test_p90_lower_quantile_convention(self, spark):
        """n=10 values 1..10: p90 = ceil(0.9*10)=9th element = 9; n=11 →
        ceil(9.9)=10th element."""
        from polars_view_spark.operators.scale import grouped_exact_quantile

        d10 = spark.range(1, 11).selectExpr("'a' AS g", "CAST(id AS DOUBLE) AS v")
        [r] = grouped_exact_quantile(d10, "g", "v", 900_000, "p90").collect()
        assert (r["p90"], r["n_rows"]) == (9.0, 10)
        d11 = spark.range(1, 12).selectExpr("'a' AS g", "CAST(id AS DOUBLE) AS v")
        [r] = grouped_exact_quantile(d11, "g", "v", 900_000, "p90").collect()
        assert (r["p90"], r["n_rows"]) == (10.0, 11)

    def test_mad_hand_case(self, spark):
        """[1,2,3,4,100]: median 3, |v-3| = [2,1,0,1,97] → MAD 1 — the
        outlier that would wreck σ leaves MAD untouched."""
        from polars_view_spark.operators.scale import grouped_mad

        df = spark.createDataFrame(
            [("a", v) for v in (1.0, 2.0, 3.0, 4.0, 100.0)], "g string, v double"
        )
        [r] = grouped_mad(df, "g", "v").collect()
        assert (r["median"], r["mad"], r["n_rows"]) == (3.0, 1.0, 5)

    def test_mad_no_global_window(self, spark):
        """Both passes use group-partitioned windows; the medians join is
        the only join and it is on the group key."""
        from polars_view_spark.operators.scale import grouped_mad

        df = spark.createDataFrame([("a", 1.0)], "g string, v double")
        plan = (
            grouped_mad(df, "g", "v")._jdf.queryExecution().executedPlan().toString()
        )
        assert "partitionBy=[]" not in plan.replace(" ", "")
        assert "CartesianProduct" not in plan


class TestRobustOutliers:
    def test_sigma_blind_mad_sees(self, spark):
        """[1,2,3,4,100]: mean/σ z-scores put 100 at z≈2.0 (below the
        classic 3σ cut — σ inflated by the outlier itself) while the
        modified z-score flags it (dev 97 > 5.189·MAD=5.189); the inliers
        stay clean."""
        from polars_view_spark.operators.scale import robust_outliers

        df = spark.createDataFrame(
            [("a", v) for v in (1.0, 2.0, 3.0, 4.0, 100.0)], "g string, v double"
        )
        [r] = robust_outliers(df, "g", "v").collect()
        assert (r["n_rows"], r["n_outliers"], r["max_abs_dev"]) == (5, 1, 97.0)
        assert r["outlier_ppm"] == 200000

    def test_degenerate_mad_zero(self, spark):
        """Over half the mass on one value → MAD 0 → every off-median row
        flags (deterministic; the honest reading of a spike)."""
        from polars_view_spark.operators.scale import robust_outliers

        df = spark.createDataFrame(
            [("a", v) for v in (5.0, 5.0, 5.0, 7.0, 9.0)], "g string, v double"
        )
        [r] = robust_outliers(df, "g", "v").collect()
        assert (r["n_outliers"], r["max_abs_dev"]) == (2, 4.0)


class TestRollingDistinctUsers:
    def test_hand_case_window_and_dense_spine(self, spark):
        """User 1 active Jan 1 & Jan 10, user 2 active Jan 2: the
        trailing-7-day count peaks at 2 on Jan 2 (both users' windows
        overlap), drops to 1 when user 1's first window expires (Jan 8
        still covers Jan 2's activity for user 2), hits 0 on Jan 9 (no
        activity in [Jan 3, Jan 9]), and returns to 1 on Jan 10 — and
        every day in [Jan 1, Jan 10] appears (dense spine)."""
        from pyspark.sql import functions as F

        from polars_view_spark.operators.events import rolling_distinct_users

        df = spark.createDataFrame(
            [
                (1, "2024-01-01 10:00:00", 1, "view"),
                (2, "2024-01-10 10:00:00", 1, "view"),
                (3, "2024-01-02 10:00:00", 2, "view"),
            ],
            "event_id long, ts string, user_id long, event_type string",
        ).withColumn("ts", F.to_timestamp("ts"))
        got = {
            str(r["report_day"]): r["n_users"]
            for r in rolling_distinct_users(df, window_days=7).collect()
        }
        assert len(got) == 10  # dense Jan 1 .. Jan 10
        assert got["2024-01-01"] == 1
        assert got["2024-01-02"] == 2
        assert got["2024-01-07"] == 2   # day1+6 still covers user 1
        assert got["2024-01-08"] == 1   # user 1's window expired
        assert got["2024-01-09"] == 0   # nobody active in trailing 7
        assert got["2024-01-10"] == 1

    def test_explode_bounded_no_event_rescan(self, spark):
        """The ×N explode applies to the deduped (user, day) pairs: the
        same user active 100× in one day contributes exactly window_days
        covered rows, and no plan node rescans raw events per day."""
        from pyspark.sql import functions as F

        from polars_view_spark.operators.events import rolling_distinct_users

        rows = [(i, "2024-01-01 00:00:%02d" % (i % 60), 1, "view") for i in range(100)]
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = rolling_distinct_users(df, window_days=7).collect()
        assert [r["n_users"] for r in out] == [1]  # one observed day, count 1


class TestResampleFfill:
    def test_gap_fill_and_leading_null(self, spark):
        """Type 'a' observed hours 0 and 3: hours 1-2 appear with n=0 and
        carry hour 0's sum; type 'b' first observed hour 2: its hours 0-1
        stay NULL (no fabricated readings before first observation)."""
        from pyspark.sql import functions as F

        from polars_view_spark.operators.events import resample_ffill

        df = spark.createDataFrame(
            [
                (1, "2024-01-01 00:10:00", 1, "a", 10.0),
                (2, "2024-01-01 03:10:00", 1, "a", 30.0),
                (3, "2024-01-01 02:10:00", 2, "b", 99.0),
            ],
            "event_id long, ts string, user_id long, event_type string, value double",
        ).withColumn("ts", F.to_timestamp("ts"))
        got = {
            (r["event_type"], r["bucket_hour"]): (r["n_events"], r["filled_sum"])
            for r in resample_ffill(df).collect()
        }
        assert len(got) == 8  # 2 types x 4 hours
        assert got[("a", "2024-01-01 00:00")] == (1, 10.0)
        assert got[("a", "2024-01-01 01:00")] == (0, 10.0)   # gap filled
        assert got[("a", "2024-01-01 02:00")] == (0, 10.0)
        assert got[("a", "2024-01-01 03:00")] == (1, 30.0)
        assert got[("b", "2024-01-01 00:00")] == (0, None)   # leading null
        assert got[("b", "2024-01-01 01:00")] == (0, None)
        assert got[("b", "2024-01-01 02:00")] == (1, 99.0)
        assert got[("b", "2024-01-01 03:00")] == (0, 99.0)


class TestPythonReferenceFuzz:
    """Seeded-random parity of the round-10 analytics operators against
    brute-force pure-Python references.  The DuckDB oracles share each
    operator's FORMULATION (both engines run the same SQL idea), so a
    formulation bug can pass the cross-engine hash — exactly how the
    grouped-median (n+1)/2 upper-median slip almost shipped.  These
    references are written independently (sort the list, walk it), so a
    shared-formulation error cannot hide."""

    def _rand_events(self, spark, seed, n=300, users=20, days=12):
        import random

        rng = random.Random(seed)
        types = ["view", "click", "purchase", "error", "signup"]
        rows = [
            (
                i,
                "2024-01-%02d %02d:%02d:00"
                % (rng.randint(1, days), rng.randint(0, 23), rng.randint(0, 59)),
                rng.randint(1, users),
                rng.choice(types),
                round(rng.uniform(0, 50), 2),
            )
            for i in range(n)
        ]
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, value double",
        ).withColumn("ts", F.to_timestamp("ts"))
        return rows, df

    def test_funnel_vs_bruteforce(self, spark):
        from polars_view_spark.operators.events import funnel_steps

        rows, df = self._rand_events(spark, seed=7)
        steps = ("view", "click", "purchase")
        by_user = {}
        for eid, ts, uid, et, _v in rows:
            by_user.setdefault(uid, []).append((ts, eid, et))
        counts = [0, 0, 0]
        for evs in by_user.values():
            evs.sort()
            t = [None, None, None]
            for ts, _eid, et in evs:
                for i, s in enumerate(steps):
                    if et != s:
                        continue
                    if i == 0 or (t[i - 1] is not None and ts > t[i - 1]):
                        if t[i] is None or ts < t[i]:
                            t[i] = ts
            for i in range(3):
                if t[i] is not None:
                    counts[i] += 1
        got = {r["step"]: r["n_users"] for r in funnel_steps(df, steps=steps).collect()}
        assert got == {1: counts[0], 2: counts[1], 3: counts[2]}

    def test_rolling_distinct_vs_bruteforce(self, spark):
        import datetime

        from polars_view_spark.operators.events import rolling_distinct_users

        rows, df = self._rand_events(spark, seed=11)
        active = {}
        for _eid, ts, uid, _et, _v in rows:
            d = datetime.date.fromisoformat(ts[:10])
            active.setdefault(uid, set()).add(d)
        lo = min(min(s) for s in active.values())
        hi = max(max(s) for s in active.values())
        want = {}
        d = lo
        while d <= hi:
            want[str(d)] = sum(
                1
                for s in active.values()
                if any((d - datetime.timedelta(days=k)) in s for k in range(7))
            )
            d += datetime.timedelta(days=1)
        got = {
            str(r["report_day"]): r["n_users"]
            for r in rolling_distinct_users(df, window_days=7).collect()
        }
        assert got == want

    def test_transitions_vs_bruteforce(self, spark):
        from collections import Counter

        from polars_view_spark.operators.events import event_transitions

        rows, df = self._rand_events(spark, seed=13)
        by_user = {}
        for eid, ts, uid, et, _v in rows:
            by_user.setdefault(uid, []).append((ts, eid, et))
        pairs = Counter()
        for evs in by_user.values():
            evs.sort()
            for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
                pairs[(a, b)] += 1
        from_tot = Counter()
        for (a, _b), n in pairs.items():
            from_tot[a] += n
        got = {
            (r["from_type"], r["to_type"]): (r["n"], r["share_ppm"])
            for r in event_transitions(df).collect()
        }
        want = {
            (a, b): (n, n * 1_000_000 // from_tot[a]) for (a, b), n in pairs.items()
        }
        assert got == want

    def test_quantiles_and_outliers_vs_bruteforce(self, spark):
        from polars_view_spark.operators.scale import (
            grouped_exact_quantile,
            grouped_mad,
            robust_outliers,
        )

        rows, df = self._rand_events(spark, seed=17)
        by_type = {}
        for _eid, _ts, _uid, et, v in rows:
            by_type.setdefault(et, []).append(v)

        def lower_q(vals, q_ppm):
            vals = sorted(vals)
            n = len(vals)
            # smallest rank r (1-based) with r*1e6 >= q_ppm*n
            r = -(-q_ppm * n // 1_000_000)  # ceil
            return vals[max(r, 1) - 1]

        for q_ppm, col in ((500_000, "quantile"), (900_000, "quantile")):
            got = {
                r["event_type"]: r[col]
                for r in grouped_exact_quantile(df, "event_type", "value", q_ppm).collect()
            }
            want = {t: lower_q(vs, q_ppm) for t, vs in by_type.items()}
            assert got == want, f"q_ppm={q_ppm}"

        got_mad = {
            r["event_type"]: (r["median"], r["mad"])
            for r in grouped_mad(df, "event_type", "value").collect()
        }
        for t, vs in by_type.items():
            med = lower_q(vs, 500_000)
            mad = lower_q([abs(v - med) for v in vs], 500_000)
            assert got_mad[t] == (med, mad), t

        got_out = {
            r["event_type"]: r["n_outliers"]
            for r in robust_outliers(df, "event_type", "value").collect()
        }
        for t, vs in by_type.items():
            med = lower_q(vs, 500_000)
            mad = lower_q([abs(v - med) for v in vs], 500_000)
            n_out = sum(1 for v in vs if abs(v - med) * 1000 > 5189 * mad)
            assert got_out[t] == n_out, t

    def test_retention_vs_bruteforce(self, spark):
        import datetime

        from polars_view_spark.operators.events import retention_cohorts

        rows, df = self._rand_events(spark, seed=19)
        first = {}
        active = {}
        for _eid, ts, uid, _et, _v in rows:
            d = datetime.date.fromisoformat(ts[:10])
            wk = d - datetime.timedelta(days=d.weekday())  # Monday start
            active.setdefault(uid, set()).add(wk)
            if uid not in first or wk < first[uid]:
                first[uid] = wk
        want = {}
        for uid, wks in active.items():
            cw = first[uid]
            for wk in wks:
                key = (str(cw), (wk - cw).days // 7)
                want[key] = want.get(key, 0) + 1
        got = {
            (str(r["cohort_week"]), r["week_offset"]): r["n_active_users"]
            for r in retention_cohorts(df).collect()
        }
        assert got == want

    def test_resample_vs_bruteforce(self, spark):
        import datetime

        from polars_view_spark.operators.events import resample_ffill

        rows, df = self._rand_events(spark, seed=23)
        agg = {}
        for _eid, ts, _uid, et, v in rows:
            h = ts[:13] + ":00"
            key = (et, h)
            n, s = agg.get(key, (0, 0.0))
            agg[key] = (n + 1, s + v)
        hours = sorted({h for (_t, h) in agg})
        lo = datetime.datetime.fromisoformat(hours[0])
        hi = datetime.datetime.fromisoformat(hours[-1])
        types = sorted({t for (t, _h) in agg})
        spine = []
        cur = lo
        while cur <= hi:
            spine.append(cur.strftime("%Y-%m-%d %H:%M"))
            cur += datetime.timedelta(hours=1)
        want = {}
        for t in types:
            carry = None
            for h in spine:
                if (t, h) in agg:
                    n, s = agg[(t, h)]
                    carry = round(s + 1e-6, 2)
                    want[(t, h)] = (n, carry)
                else:
                    want[(t, h)] = (0, carry)
        got = {
            (r["event_type"], r["bucket_hour"]): (r["n_events"], r["filled_sum"])
            for r in resample_ffill(df).collect()
        }
        assert got == want
