"""Tests for the round-7 continuation operators: NFC normalization
(cross-engine parity fuzz), URL canonicalization (unit semantics + plan
gate), Fellegi–Sunter record linkage (planted pairs), and the
observe()-backed write audit (metrics vs direct aggregation)."""

import pytest
from pyspark.sql import functions as F


class TestNfcParityFuzz:
    def test_nfc_matches_duckdb_on_composition_classes(self, spark):
        """nfc_normalize (pandas .str.normalize, i.e. Python's
        unicodedata) must byte-agree with DuckDB's utf8proc
        nfc_normalize.  The fuzz alphabet is pinned to long-stable
        composition classes (ASCII, Latin-1 precomposed, combining
        diacritics, Hangul jamo, compatibility ligatures) — Unicode's
        normalization-stability policy makes these version-safe, while
        arbitrary newly-assigned codepoints could legitimately differ
        between the two libraries' Unicode tables."""
        import duckdb
        import pandas as pd
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from polars_view_spark.operators.textstats import nfc_normalize

        alphabet = (
            "abcdeé öñ"  # ASCII + precomposed latin-1
            "̧́̀̈"  # combining acute/grave/diaeresis/cedilla
            "각각"  # Hangul jamo + precomposed syllable
            "ﬁﬂ"  # fi/fl ligatures (NFC-invariant)
        )
        texts: list[str] = []

        @settings(
            max_examples=200,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(st.text(alphabet=alphabet, max_size=24))
        def collect(t):
            texts.append(t)

        collect()
        rows = [(i, t) for i, t in enumerate(texts)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["text_nfc"]
            for r in nfc_normalize(docs).select("doc_id", "text_nfc").collect()
        }
        con = duckdb.connect()
        con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
        want = dict(
            con.execute(
                "SELECT doc_id, nfc_normalize(text) FROM docs"
            ).fetchall()
        )
        mism = {d: (got[d], want[d]) for d in want if got[d] != want[d]}
        assert not mism, f"{len(mism)} mismatches, e.g. {list(mism.items())[:3]}"
        # idempotence: NFC(NFC(x)) == NFC(x)
        import unicodedata

        for t in texts:
            n = unicodedata.normalize("NFC", t)
            assert unicodedata.normalize("NFC", n) == n

    def test_nfc_runs_on_arrow_not_row_path(self, spark):
        """The normalization UDF must be the Arrow-batched evaluator
        (ArrowEvalPython), never row-at-a-time BatchEvalPython."""
        from polars_view_spark.operators.textstats import nfc_normalize

        df = spark.createDataFrame([(1, "é")], "doc_id long, text string")
        plan = nfc_normalize(df)._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan


class TestUrlCanonicalize:
    @pytest.fixture(scope="class")
    def canon(self, spark):
        from polars_view_spark.operators.textstats import url_canonicalize

        urls = [
            (1, "HTTPS://News.Example.COM:443/docs/1?utm_source=a&id=1#top"),
            (2, "https://news.example.com:8443/a"),
            (3, "HTTP://Example.COM:80/x/index.html?ref=tw&utm_campaign=c"),
            (4, "https://example.com/p?id=4&q=spark&fbclid=zz"),
            (5, "https://sub.a.example.org/p"),
        ]
        df = spark.createDataFrame(urls, "doc_id long, url string")
        return {
            r["doc_id"]: (r["canon_url"], r["registered_domain"])
            for r in url_canonicalize(df).collect()
        }

    def test_default_port_and_case_and_tracking(self, canon):
        assert canon[1] == (
            "https://news.example.com/docs/1?id=1",
            "example.com",
        )

    def test_non_default_port_survives(self, canon):
        assert canon[2] == ("https://news.example.com:8443/a", "example.com")

    def test_http_80_stripped_and_index_html(self, canon):
        # all params are tracking -> no '?' at all
        assert canon[3] == ("http://example.com/x/", "example.com")

    def test_only_tracking_params_removed(self, canon):
        assert canon[4] == ("https://example.com/p?id=4&q=spark", "example.com")

    def test_registered_domain_is_last_two_labels(self, canon):
        assert canon[5][1] == "example.org"

    def test_pure_codegen_no_python(self, spark):
        from polars_view_spark.operators.textstats import url_canonicalize

        df = spark.createDataFrame([(1, "https://a.b/c")], "doc_id long, url string")
        plan = url_canonicalize(df)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan  # neither Arrow nor Batch


class TestLinkage:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, "Alice Smith", "US", 100.0), (2, "Bob Jones", "US", 50.0),
             (3, "Carol King", "DE", 70.0)],
            "id long, name string, country string, bal double",
        )
        right = spark.createDataFrame(
            [(11, "Alice Smyth", "US", 100.2),   # name lev 1, bal close -> match
             (12, "Bob Jones", "US", 500.0),     # name exact, bal far -> 6-1=5
             (13, "Karol Kong", "DE", 70.0)],    # name lev 2, bal close -> -2+4=2
            "id long, name string, country string, bal double",
        )
        return left, right

    def _rules(self):
        from polars_view_spark.operators.linkage import FieldRule

        return [
            FieldRule(
                "name", F.levenshtein(F.col("l_name"), F.col("r_name")) <= 1,
                6.0, -2.0,
            ),
            FieldRule(
                "bal", F.abs(F.col("l_bal") - F.col("r_bal")) < 1.0, 4.0, -1.0
            ),
        ]

    def test_planted_match_and_scores(self, spark):
        from polars_view_spark.operators.linkage import linkage_score

        left, right = self._frames(spark)
        out = linkage_score(left, right, ["country"], self._rules(), 8.0)
        rows = {(r["l_id"], r["r_id"]): r for r in out.collect()}
        assert rows[(1, 11)]["is_match"] and rows[(1, 11)]["score"] == 10.0
        assert not rows[(2, 12)]["is_match"] and rows[(2, 12)]["score"] == 5.0
        assert not rows[(3, 13)]["is_match"] and rows[(3, 13)]["score"] == 2.0
        # blocking: no cross-country candidates at all
        assert (1, 13) not in rows and (3, 11) not in rows

    def test_shuffle_join_path_same_answer(self, spark):
        from polars_view_spark.operators.linkage import linkage_score

        left, right = self._frames(spark)
        a = linkage_score(left, right, ["country"], self._rules(), 8.0)
        b = linkage_score(
            left, right, ["country"], self._rules(), 8.0, broadcast_right=False
        )
        key = ["l_id", "r_id", "score", "is_match"]
        assert sorted(map(tuple, a.select(key).collect())) == sorted(
            map(tuple, b.select(key).collect())
        )

    def test_validation(self, spark):
        from polars_view_spark.operators.linkage import linkage_score

        left, right = self._frames(spark)
        with pytest.raises(ValueError, match="block_on"):
            linkage_score(left, right, [], self._rules(), 1.0)
        with pytest.raises(ValueError, match="rules"):
            linkage_score(left, right, ["country"], [], 1.0)


class TestAuditedWrite:
    def test_metrics_match_direct_aggregation(self, spark, tmp_path):
        from polars_view_spark.operators.expectations import audited_write

        df = spark.range(0, 1000).select(
            F.col("id"),
            F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") % 7)
            .alias("v"),
        )
        out = audited_write(
            df,
            {
                "n_rows": F.count(F.lit(1)),
                "n_null": F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)),
                "sum_v": F.sum("v"),
            },
            str(tmp_path / "sink"),
        )
        row = out.collect()[0]
        want_sum = sum(i % 7 for i in range(1000) if i % 10 != 0)
        assert (row["n_rows"], row["n_null"], row["sum_v"]) == (
            1000, 100, want_sum,
        )
        # the write itself really happened, with every input row
        assert spark.read.parquet(str(tmp_path / "sink")).count() == 1000

    def test_empty_metrics_rejected(self, spark, tmp_path):
        from polars_view_spark.operators.expectations import audited_write

        with pytest.raises(ValueError, match="metrics"):
            audited_write(spark.range(1), {}, str(tmp_path / "x"))


class TestUrlCanonicalizeFuzz:
    def test_matches_urllib_reference_on_structured_urls(self, spark):
        """Structured fuzz: build URLs from generated components, then
        check url_canonicalize against an independent Python reference
        (urllib.parse) implementing the same rules.  One batched Spark
        job (same discipline as the other cross-engine fuzzes)."""
        from urllib.parse import urlsplit

        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from polars_view_spark.operators.textstats import (
            URL_TRACKING_PARAM_PATTERNS,
            url_canonicalize,
        )

        label = st.text(
            alphabet="abcXYZ09", min_size=1, max_size=6
        ).filter(lambda s: not s.isdigit())
        urls: list[str] = []

        @settings(
            max_examples=150,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(
            scheme=st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
            labels=st.lists(label, min_size=2, max_size=4),
            port=st.sampled_from(["", ":80", ":443", ":8080"]),
            path=st.lists(label, max_size=3),
            index=st.booleans(),
            params=st.lists(
                st.sampled_from(
                    ["utm_source=a", "utm_campaign=b", "ref=tw", "fbclid=1",
                     "gclid=2", "id=7", "q=x", "page=2"]
                ),
                max_size=4,
            ),
            frag=st.sampled_from(["", "#top", "#sec-2"]),
        )
        def collect(scheme, labels, port, path, index, params, frag):
            u = scheme + "://" + ".".join(labels) + port + "/" + "/".join(path)
            if index:
                u = u.rstrip("/") + "/index.html"
            if params:
                u += "?" + "&".join(params)
            u += frag
            urls.append(u)

        collect()

        def reference(u: str) -> tuple[str, str]:
            s = urlsplit(u)
            scheme = s.scheme.lower()
            host = (s.hostname or "").lower()
            netloc = host + (
                f":{s.port}"
                if s.port is not None
                and not (scheme == "https" and s.port == 443)
                and not (scheme == "http" and s.port == 80)
                else ""
            )
            import re

            path = re.sub(r"/index\.html$", "/", s.path)
            keep = [
                p
                for p in s.query.split("&")
                if p
                and not any(
                    p.startswith(pat)
                    for pat in URL_TRACKING_PARAM_PATTERNS
                )
            ]
            q = "&".join(keep)
            labels = host.split(".")
            dom = ".".join(labels[-2:]) if len(labels) >= 2 else ""
            return (
                scheme + "://" + netloc + path + (("?" + q) if q else ""),
                dom,
            )

        rows = [(i, u) for i, u in enumerate(urls)]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        got = {
            r["doc_id"]: (r["canon_url"], r["registered_domain"])
            for r in url_canonicalize(df).collect()
        }
        mism = {
            u: (got[i], reference(u))
            for i, u in enumerate(urls)
            if got[i] != reference(u)
        }
        assert not mism, f"{len(mism)} mismatches, e.g. {list(mism.items())[:3]}"


class TestBalancedShards:
    def test_balance_bound_and_contiguity(self, spark):
        """Every shard's token sum is ≤ target + the largest single doc
        (contiguous assignment can overshoot by at most one document),
        and shard ids are non-decreasing in doc order."""
        from polars_view_spark.operators.packing import balanced_shards

        docs = spark.createDataFrame(
            [(i, "w " * ((i * 37) % 100 + 1)) for i in range(300)],
            "doc_id long, text string",
        )
        out = balanced_shards(docs, n_shards=5).collect()
        by_doc = sorted(out, key=lambda r: r["doc_id"])
        shards = [r["shard"] for r in by_doc]
        assert shards == sorted(shards)  # contiguous ranges
        assert set(shards) == {0, 1, 2, 3, 4}
        total = sum(r["n_tokens"] for r in out)
        target = -(-total // 5)
        biggest = max(r["n_tokens"] for r in out)
        sums = {}
        for r in out:
            sums[r["shard"]] = sums.get(r["shard"], 0) + r["n_tokens"]
        assert all(s <= target + biggest for s in sums.values()), sums

    def test_layout_independent_assignment(self, spark):
        """The doc→shard mapping must not depend on the input's physical
        partitioning (it is a pure function of global id order)."""
        from polars_view_spark.operators.packing import balanced_shards

        rows = [(i, "tok " * (i % 13 + 1)) for i in range(200)]
        a = spark.createDataFrame(rows, "doc_id long, text string")
        b = spark.createDataFrame(rows, "doc_id long, text string").repartition(
            7, "text"
        )
        got_a = sorted(map(tuple, balanced_shards(a, 4).collect()))
        got_b = sorted(map(tuple, balanced_shards(b, 4).collect()))
        assert got_a == got_b

    def test_single_shard_and_validation(self, spark):
        from polars_view_spark.operators.packing import balanced_shards

        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        assert balanced_shards(docs, 1).collect()[0]["shard"] == 0
        import pytest as _pytest

        with _pytest.raises(ValueError, match="n_shards"):
            balanced_shards(docs, 0)


class TestLinkageWeightsAndGolden:
    def test_weight_estimation_exact_counts(self, spark):
        """Planted labeled pairs → exact m/u milli-probabilities."""
        from polars_view_spark.operators.linkage import estimate_linkage_weights

        # 4 matches (3 agree name), 6 non-matches (1 agrees name)
        rows = [(True, True)] * 3 + [(True, False)] + \
               [(False, True)] + [(False, False)] * 5
        df = spark.createDataFrame(rows, "truth boolean, agree_name boolean")
        out = {r["field"]: r for r in estimate_linkage_weights(
            df, "truth", ["name"]).collect()}
        r = out["name"]
        assert (r["n_match"], r["n_nonmatch"]) == (4, 6)
        assert (r["agree_match"], r["agree_nonmatch"]) == (3, 1)
        assert r["m_milli"] == 750
        assert r["u_milli"] == 166  # 1000*1 // 6
        import pytest as _pytest

        with _pytest.raises(ValueError, match="rule_names"):
            estimate_linkage_weights(df, "truth", [])

    def test_golden_records_clusters_and_singletons(self, spark):
        """Chained matches collapse to one entity (min key), field
        survivorship picks the longest name deterministically, and
        unmatched records stay as singleton entities."""
        from polars_view_spark.operators.linkage import golden_records

        records = spark.createDataFrame(
            [(1, "Ann", 10.0), (2, "Annabelle", 20.0), (3, "Anna", 15.0),
             (9, "Solo", 5.0)],
            "key long, name string, bal double",
        )
        # 1-2 and 2-3 matched -> {1,2,3} one entity; 9 singleton
        matches = spark.createDataFrame(
            [(1, 2), (2, 3)], "l_key long, r_key long"
        )
        out = {r["entity_id"]: r for r in golden_records(records, matches).collect()}
        assert set(out) == {1, 9}
        assert out[1]["n_members"] == 3
        assert out[1]["canonical_name"] == "Annabelle"
        assert out[1]["max_bal"] == 20.0
        assert out[9]["n_members"] == 1 and out[9]["canonical_name"] == "Solo"

    def test_golden_name_tie_broken_by_value(self, spark):
        """Two equal-length names in one entity → struct max picks the
        lexicographically larger one, same on every run/layout."""
        from polars_view_spark.operators.linkage import golden_records

        records = spark.createDataFrame(
            [(1, "abc", 1.0), (2, "abd", 1.0)], "key long, name string, bal double"
        )
        matches = spark.createDataFrame([(1, 2)], "l_key long, r_key long")
        out = golden_records(records, matches).collect()
        assert len(out) == 1 and out[0]["canonical_name"] == "abd"


class TestReviewFixes:
    """Regression tests for the continuation-session review findings."""

    def test_audited_write_empty_input(self, spark, tmp_path):
        """A zero-row write still gets its audit row: count 0, undefined
        aggregates NULL — never a crash after the data already wrote."""
        from polars_view_spark.operators.expectations import audited_write

        df = spark.range(0).select(F.col("id"), F.col("id").alias("v"))
        out = audited_write(
            df,
            {"n_rows": F.count(F.lit(1)), "sum_v": F.sum("v"),
             "min_v": F.min("v")},
            str(tmp_path / "empty_sink"),
        ).collect()[0]
        assert out["n_rows"] == 0
        assert out["sum_v"] is None and out["min_v"] is None

    def test_audited_write_float_metric_not_truncated(self, spark, tmp_path):
        from polars_view_spark.operators.expectations import audited_write

        df = spark.range(1, 4).select(F.col("id").cast("double").alias("v"))
        out = audited_write(
            df, {"avg_v": F.avg("v")}, str(tmp_path / "f_sink")
        ).collect()[0]
        assert out["avg_v"] == 2.0
        assert isinstance(out["avg_v"], float)

    def test_balanced_shards_null_text(self, spark):
        """NULL text = 0 tokens: stays in id order (never dumped into the
        last shard) and never crashes the driver offset arithmetic."""
        from polars_view_spark.operators.packing import balanced_shards

        rows = [(0, None)] + [(i, "w " * 20) for i in range(1, 100)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in balanced_shards(docs, 4).collect()}
        assert out[0]["n_tokens"] == 0 and out[0]["shard"] == 0
        shards = [out[i]["shard"] for i in sorted(out)]
        assert shards == sorted(shards)

    def test_url_canonicalize_userinfo_and_ipv6(self, spark):
        """Colons before the port (userinfo, IPv6 literal) must never be
        mistaken for the port separator."""
        from polars_view_spark.operators.textstats import url_canonicalize

        urls = [
            (1, "https://user:pw@example.com:443/a"),
            (2, "https://[2001:db8::1]:443/a"),
            (3, "https://[2001:db8::1]:8443/a"),
        ]
        df = spark.createDataFrame(urls, "doc_id long, url string")
        got = {
            r["doc_id"]: (r["canon_url"], r["registered_domain"])
            for r in url_canonicalize(df).collect()
        }
        assert got[1] == ("https://user:pw@example.com/a", "example.com")
        assert got[2][0] == "https://[2001:db8::1]/a"
        assert got[3][0] == "https://[2001:db8::1]:8443/a"

    def test_weight_estimation_zero_match_class(self, spark):
        """No confirmed matches → NULL m_milli, not ANSI DIVIDE_BY_ZERO."""
        from polars_view_spark.operators.linkage import estimate_linkage_weights

        df = spark.createDataFrame(
            [(False, True), (False, False)], "truth boolean, agree_f boolean"
        )
        r = estimate_linkage_weights(df, "truth", ["f"]).collect()[0]
        assert r["n_match"] == 0 and r["m_milli"] is None
        assert r["u_milli"] == 500


class TestPlanShapes:
    def test_linkage_broadcast_join_shape(self, spark):
        """broadcast_right=True must plan a BroadcastHashJoin (the
        daily-increment shape: feed broadcast, master never shuffled)."""
        from polars_view_spark.operators.linkage import FieldRule, linkage_score

        left = spark.createDataFrame(
            [(1, "a", "US", 1.0)], "id long, name string, country string, bal double"
        )
        right = spark.createDataFrame(
            [(2, "a", "US", 1.0)], "id long, name string, country string, bal double"
        )
        rules = [FieldRule("name", F.col("l_name") == F.col("r_name"), 1.0, -1.0)]
        plan = (
            linkage_score(left, right, ["country"], rules, 0.0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan

    def test_balanced_shards_no_single_partition_exchange(self, spark):
        """The prefix-sum must never plan a SinglePartition exchange (the
        global-window trap the partition-offset technique exists to
        avoid)."""
        from polars_view_spark.operators.packing import balanced_shards

        docs = spark.createDataFrame(
            [(i, "w " * 5) for i in range(50)], "doc_id long, text string"
        )
        plan = (
            balanced_shards(docs, 4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SinglePartition" not in plan



class TestLoopClosers:
    def test_weights_from_estimates_roundtrip(self, spark):
        """estimate → weights → FieldRule: weights are the log2 ratios of
        the clamped milli-probabilities, and the degenerate (NULL) class
        raises instead of producing garbage."""
        import math

        from polars_view_spark.operators.linkage import (
            estimate_linkage_weights,
            weights_from_estimates,
        )

        rows = [(True, True)] * 9 + [(True, False)] + \
               [(False, True)] + [(False, False)] * 9
        df = spark.createDataFrame(rows, "truth boolean, agree_name boolean")
        est = estimate_linkage_weights(df, "truth", ["name"])
        w = weights_from_estimates(est)
        m, u = 0.9, 0.1
        assert math.isclose(w["name"][0], math.log2(m / u))
        assert math.isclose(w["name"][1], math.log2((1 - m) / (1 - u)))

        empty = spark.createDataFrame(
            [(False, True)], "truth boolean, agree_name boolean"
        )
        import pytest as _pytest

        with _pytest.raises(ValueError, match="empty truth class"):
            weights_from_estimates(
                estimate_linkage_weights(empty, "truth", ["name"])
            )

    def test_write_balanced_shards_manifest_matches_disk(self, spark, tmp_path):
        """The manifest is read back from the WRITTEN dataset: one
        directory per shard, totals equal the assignment."""
        import os

        from polars_view_spark.operators.packing import write_balanced_shards

        docs = spark.createDataFrame(
            [(i, "w " * (i % 9 + 1)) for i in range(120)],
            "doc_id long, text string",
        )
        path = str(tmp_path / "shards")
        manifest = write_balanced_shards(docs, path, 4).collect()
        assert [r["shard"] for r in manifest] == [0, 1, 2, 3]
        assert sum(r["n_docs"] for r in manifest) == 120
        dirs = {d for d in os.listdir(path) if d.startswith("shard=")}
        assert dirs == {"shard=0", "shard=1", "shard=2", "shard=3"}


class TestBalancedShardsPropertyFuzz:
    def test_invariants_on_random_token_distributions(self, spark):
        """Hypothesis over (doc lengths, shard count): the assignment is
        always contiguous in id order, covers shards 0..k_used without
        gaps, every shard's tokens ≤ target + max doc, and the mapping is
        a pure function of the global order (recomputation agrees).
        Batched: generate cases, run ONE Spark job per case set."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from polars_view_spark.operators.packing import balanced_shards

        cases: list[tuple[list[int], int]] = []

        @settings(
            max_examples=30,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(
            lens=st.lists(st.integers(min_value=0, max_value=40),
                          min_size=1, max_size=60),
            k=st.integers(min_value=1, max_value=7),
        )
        def collect(lens, k):
            cases.append((lens, k))

        collect()
        for lens, k in cases[:12]:  # bound Spark-job count; variety kept
            docs = spark.createDataFrame(
                [(i, "w " * n if n else None) for i, n in enumerate(lens)],
                "doc_id long, text string",
            )
            out = sorted(
                balanced_shards(docs, k).collect(), key=lambda r: r["doc_id"]
            )
            shards = [r["shard"] for r in out]
            toks = [r["n_tokens"] for r in out]
            # None text -> 0 tokens; "w "*n -> n tokens
            assert toks == lens
            assert shards == sorted(shards), (lens, k, shards)
            total = sum(toks)
            if total:
                target = -(-total // k)
                biggest = max(toks)
                used = sorted(set(shards))
                if biggest <= target:
                    # gap-free only when no doc exceeds the target: each
                    # prefix step then advances the shard index by ≤ 1 (an
                    # oversized doc legitimately skips indices — the fuzz
                    # found exactly that case)
                    assert used == list(range(len(used)))
                sums: dict[int, int] = {}
                for s, t in zip(shards, toks):
                    sums[s] = sums.get(s, 0) + t
                assert all(v <= target + biggest for v in sums.values())


class TestLinkageScorePropertyFuzz:
    def test_score_is_sum_of_weights(self, spark):
        """For random weight sets and agreement patterns, score is exactly
        the sum of the per-field contributions and is_match is exactly
        score >= threshold.  One Spark job over all generated pairs."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from polars_view_spark.operators.linkage import FieldRule, linkage_score

        w = st.integers(min_value=-8, max_value=8)
        cases: list[tuple[int, int, int, int, bool, bool]] = []

        @settings(
            max_examples=80,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(aw1=w, dw1=w, aw2=w, dw2=w,
               agree1=st.booleans(), agree2=st.booleans())
        def collect(aw1, dw1, aw2, dw2, agree1, agree2):
            cases.append((aw1, dw1, aw2, dw2, agree1, agree2))

        collect()
        # one row per case, agreement encoded in the data; weights vary per
        # case so run per distinct weight-tuple group
        from collections import defaultdict

        by_w = defaultdict(list)
        for aw1, dw1, aw2, dw2, a1, a2 in cases:
            by_w[(aw1, dw1, aw2, dw2)].append((a1, a2))
        for (aw1, dw1, aw2, dw2), pats in list(by_w.items())[:10]:
            rows = [(i, "B", a1, a2) for i, (a1, a2) in enumerate(pats)]
            left = spark.createDataFrame(
                rows, "id long, blk string, f1 boolean, f2 boolean"
            )
            right = spark.createDataFrame(
                [(i + 1000, "B") for i in range(len(pats))],
                "id long, blk string",
            ).filter(F.col("id") - 1000 < 1)  # single right row per block
            rules = [
                FieldRule("f1", F.col("l_f1"), float(aw1), float(dw1)),
                FieldRule("f2", F.col("l_f2"), float(aw2), float(dw2)),
            ]
            out = linkage_score(left, right, ["blk"], rules, 0.0).collect()
            for r in out:
                want = (aw1 if r["l_f1"] else dw1) + (aw2 if r["l_f2"] else dw2)
                assert r["score"] == float(want)
                assert r["is_match"] == (r["score"] >= 0.0)


class TestCollationOracleEquivalence:
    def test_utf8_lcase_grouping_equals_lower_grouping(self, spark):
        """q_collated_group's oracle states GROUP BY lower(g) as the
        DuckDB equivalent of Spark's GROUP BY g COLLATE UTF8_LCASE.  Pin
        that equivalence on this Spark build — including the classic
        danger case ß (full ICU case folding would merge it with 'ss';
        this build's UTF8_LCASE, like lower(), keeps it separate) and a
        generated mixed-case sample."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        vals: list[str] = ["ß", "ss", "SS", "İ", "x"]

        @settings(
            max_examples=120,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(st.text(alphabet="aAbBzZ09éÉ", min_size=1, max_size=6))
        def collect(s):
            vals.append(s)

        collect()
        df = spark.createDataFrame([(v,) for v in vals], "g string")
        df.createOrReplaceTempView("coll_fuzz")
        collated = {
            (r["rep"], r["n"])
            for r in spark.sql(
                "SELECT min(g) AS rep, count(*) AS n FROM coll_fuzz "
                "GROUP BY g COLLATE UTF8_LCASE"
            ).collect()
        }
        lowered = {
            (r["rep"], r["n"])
            for r in spark.sql(
                "SELECT min(g) AS rep, count(*) AS n FROM coll_fuzz "
                "GROUP BY lower(g)"
            ).collect()
        }
        assert collated == lowered


def test_linkage_full_loop_end_to_end(spark):
    """The whole entity-resolution loop composes: score with priors →
    label a sample → estimate m/u → derive weights → re-score with the
    LEARNED weights → golden records.  The learned weights must separate
    the planted matches from non-matches at least as well as the priors
    (threshold at the midpoint of the two learned score populations)."""
    from polars_view_spark.operators.linkage import (
        FieldRule,
        estimate_linkage_weights,
        golden_records,
        linkage_score,
        weights_from_estimates,
    )

    # balances are 10 apart so only true pairs fall inside the band —
    # adjacent numeric names (lev 1) still create name-only lookalikes,
    # which is what the learned bal weight must dominate
    left = spark.createDataFrame(
        [(i, f"Name{i:03d}", "B", float(i) * 10.0) for i in range(40)],
        "key long, name string, blk string, bal double",
    )
    right = spark.createDataFrame(
        [(i + 100, f"Name{i:03d}" + ("x" if i % 2 else ""), "B",
          float(i) * 10.0 + 0.25) for i in range(40)],
        "key long, name string, blk string, bal double",
    )

    def prior_rules():
        return [
            FieldRule(
                "name",
                F.levenshtein(F.col("l_name"), F.col("r_name")) <= 1,
                1.0, -1.0,
            ),
            FieldRule(
                "bal", F.abs(F.col("l_bal") - F.col("r_bal")) < 1.0, 1.0, -1.0
            ),
        ]

    scored = linkage_score(left, right, ["blk"], prior_rules(), 99.0)
    labeled = scored.withColumn(
        "truth", F.col("r_key") - 100 == F.col("l_key")
    )
    est = estimate_linkage_weights(labeled, "truth", ["name", "bal"])
    w = weights_from_estimates(est)
    learned = [
        FieldRule(
            "name",
            F.levenshtein(F.col("l_name"), F.col("r_name")) <= 1,
            *w["name"],
        ),
        FieldRule(
            "bal", F.abs(F.col("l_bal") - F.col("r_bal")) < 1.0, *w["bal"]
        ),
    ]
    rescored = linkage_score(left, right, ["blk"], learned, 0.0).withColumn(
        "truth", F.col("r_key") - 100 == F.col("l_key")
    )
    rows = rescored.select("truth", "score").collect()
    match_scores = [r["score"] for r in rows if r["truth"]]
    non_scores = [r["score"] for r in rows if not r["truth"]]
    # learned weights must rank every true match above every non-match
    assert min(match_scores) > max(non_scores)

    thr = (min(match_scores) + max(non_scores)) / 2
    matches = linkage_score(left, right, ["blk"], learned, thr).filter(
        "is_match"
    ).select("l_key", "r_key")
    records = left.select("key", "name", "bal").unionByName(
        right.select("key", "name", "bal")
    )
    golden = golden_records(records, matches).collect()
    # 40 true entities, every one merged (2 members), none spurious
    assert len(golden) == 40
    assert all(r["n_members"] == 2 for r in golden)


class TestRound8AdviceFixes:
    """Regression tests for the round-7 ADVICE findings fixed in round 8."""

    def test_url_canonicalize_keeps_non_tracking_utm_lookalikes(self, spark):
        """ADVICE r07: LIKE 'utm_%' treated '_' as a single-char wildcard,
        so 'utmost=1' / 'utmx=2' were wrongly stripped.  The prefix match
        must strip only literal utm_* params."""
        from polars_view_spark.operators.textstats import url_canonicalize

        urls = [
            (1, "https://example.com/a?utmost=1&q=x"),
            (2, "https://example.com/a?utmx=2&utm_source=feed&q=x"),
            (3, "https://example.com/a?reform=1&ref=tw&q=x"),
        ]
        df = spark.createDataFrame(urls, "id long, url string")
        out = {r["id"]: r["canon_url"] for r in url_canonicalize(df).collect()}
        assert out[1] == "https://example.com/a?utmost=1&q=x"
        assert out[2] == "https://example.com/a?utmx=2&q=x"
        assert out[3] == "https://example.com/a?reform=1&q=x"

    def test_audited_write_empty_float_metric_stays_double(self, spark, tmp_path):
        """ADVICE r07: runtime-value type probes degraded double→long
        exactly when the write was empty (sum → None).  The schema now
        comes from the analyzed aggregate types."""
        from polars_view_spark.operators.expectations import audited_write

        df = spark.range(0).select(F.col("id").cast("double").alias("v"))
        out = audited_write(
            df, {"sum_v": F.sum("v"), "n": F.count(F.lit(1))},
            str(tmp_path / "empty_double_sink"),
        )
        assert dict(out.dtypes)["sum_v"] == "double"
        row = out.collect()[0]
        assert row["sum_v"] is None and row["n"] == 0

    def test_audited_write_string_and_boolean_metrics(self, spark, tmp_path):
        """ADVICE r07: string/boolean aggregates failed createDataFrame
        type verification under the isinstance-based schema."""
        from polars_view_spark.operators.expectations import audited_write

        df = spark.createDataFrame(
            [(1, "b"), (2, "a")], "id long, name string"
        )
        out = audited_write(
            df,
            {"min_name": F.min("name"),
             "any_big": F.max(F.col("id") > 1)},
            str(tmp_path / "str_bool_sink"),
        )
        assert dict(out.dtypes) == {"min_name": "string", "any_big": "boolean"}
        row = out.collect()[0]
        assert row["min_name"] == "a" and row["any_big"] is True

    def test_weights_from_estimates_rejects_malformed_frames(self, spark):
        """VERDICT r07 task 4: fail loudly on malformed estimate frames
        instead of deriving garbage weights."""
        import pytest as _pytest

        from polars_view_spark.operators.linkage import weights_from_estimates

        empty = spark.createDataFrame(
            [], "field string, m_milli long, u_milli long"
        )
        with _pytest.raises(ValueError, match="empty"):
            weights_from_estimates(empty)

        dup = spark.createDataFrame(
            [("name", 900, 10), ("name", 800, 20)],
            "field string, m_milli long, u_milli long",
        )
        with _pytest.raises(ValueError, match="duplicate"):
            weights_from_estimates(dup)

        wrong_cols = spark.createDataFrame([(1,)], "x long")
        with _pytest.raises(ValueError, match="missing column"):
            weights_from_estimates(wrong_cols)
