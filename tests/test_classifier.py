"""Trained quality classifier (operators/classifier.py): planted-signal
separation, determinism, guards, and the projection-only inference plan.

The full-trajectory value-hash oracle is exercised by the catalog sweep
(test_catalog_oracle.py, entry ``x_quality_classifier``); these tests pin
the SEMANTICS the hash can't speak to — that training actually separates
a separable corpus."""

import pytest
from pyspark.sql import functions as F

from polars_view_spark.operators.classifier import (
    score_with_weights,
    train_quality_classifier,
)


def _planted(spark, n=60):
    """Disjoint-vocabulary corpus: positives speak reference-ese,
    negatives speak crawl-ese — linearly separable by construction."""
    pos_vocab = ["alpha", "beta", "gamma", "delta"]
    neg_vocab = ["noise", "spammy", "clickbait", "filler"]
    rows = []
    for i in range(n):
        vocab = pos_vocab if i % 2 == 0 else neg_vocab
        words = [vocab[(i + j) % len(vocab)] for j in range(6 + i % 5)]
        rows.append((i, " ".join(words), i % 2 == 0))
    return spark.createDataFrame(rows, "doc_id long, text string, is_ref boolean")


class TestQualityClassifier:
    def test_planted_separation(self, spark):
        """Disjoint vocabularies must separate perfectly: the buckets the
        two vocabularies hash to are disjoint signals, and 10 balanced
        epochs are far more than enough to split them."""
        docs = _planted(spark)
        scored, w = train_quality_classifier(docs, F.col("is_ref"))
        rows = scored.collect()
        assert len(rows) == 60
        acc = sum(r["pred"] == r["y"] for r in rows) / len(rows)
        assert acc == 1.0, f"planted corpus must separate, got {acc}"
        assert len(w) == 65  # dim + bias

    def test_deterministic(self, spark):
        docs = _planted(spark, n=30)
        _, w1 = train_quality_classifier(docs, "is_ref", epochs=4)
        _, w2 = train_quality_classifier(docs, "is_ref", epochs=4)
        assert w1 == w2

    def test_single_class_rejected(self, spark):
        docs = _planted(spark, n=20)
        with pytest.raises(AssertionError, match="both classes"):
            train_quality_classifier(docs, F.lit(True))

    def test_oversized_sample_rejected(self, spark, monkeypatch):
        """The bounded-sample contract fails LOUDLY past the ceiling
        instead of degrading into one slow coalesce(1) task (VERDICT r10
        task 7).  The ceiling is monkeypatched down so the test stays
        cheap — the guard compares the same counts either way."""
        from polars_view_spark.operators import classifier as mod

        monkeypatch.setattr(mod, "FIT_MAX_SAMPLE_ROWS", 10)
        docs = _planted(spark, n=20)
        with pytest.raises(ValueError, match="bounded-sample contract"):
            train_quality_classifier(docs, "is_ref", epochs=2)

    def test_null_text_dropped(self, spark):
        """NULL text produces no tokens → no feature row → absent from
        the scored frame (and from training), mirroring the oracle."""
        docs = _planted(spark, n=20).withColumn(
            "text", F.when(F.col("doc_id") < 2, None).otherwise(F.col("text"))
        )
        scored, _ = train_quality_classifier(docs, "is_ref", epochs=2)
        got = {r["doc"] for r in scored.collect()}
        assert got == set(range(2, 20))

    def test_inference_is_projection_only(self, spark):
        """The 100 TB-facing pass: scoring with trained weights must be
        scan + codegen arithmetic — no exchange, no join, no Python."""
        from polars_view_spark.operators.textstats import hashed_doc_vectors

        docs = _planted(spark, n=20)
        feats = hashed_doc_vectors(docs, "doc_id", "text", dim=64).select(
            "doc", "vec"
        )
        scored = score_with_weights(feats, list(range(65)), 64)
        # plan AFTER the feature shuffle: scoring itself adds nothing
        plan = scored._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 1  # the feature aggregate's own
        for forbidden in ("BatchEvalPython", "ArrowEvalPython", "SortMergeJoin"):
            assert forbidden not in plan

    def test_margin_matches_manual_dot(self, spark):
        """score_with_weights margin == Σ vec[i]·w_i + bias, checked
        against a driver-side dot product on a tiny frame."""
        df = spark.createDataFrame(
            [(1, [2, -3, 0, 5]), (2, [0, 0, 1, 1])], "doc long, vec array<long>"
        )
        w = [10, 1, -4, 2, 7]  # bias 7
        out = {r["doc"]: r["margin"] for r in score_with_weights(df, w, 4).collect()}
        assert out == {1: 2 * 10 - 3 * 1 + 5 * 2 + 7, 2: -4 + 2 + 7}


class TestEpochShuffle:
    """Reproducible epoch ordering (operators/packing.py:epoch_shuffle)."""

    def _docs(self, spark):
        return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def test_partition_and_contiguity(self, spark):
        """Shards partition the corpus; positions are contiguous
        0..shard_size-1 within every shard."""
        from polars_view_spark.operators.packing import epoch_shuffle

        docs = self._docs(spark)
        out = epoch_shuffle(docs, epoch=1, n_shards=4).collect()
        assert len(out) == docs.count()
        assert len({r["doc_id"] for r in out}) == len(out)
        by_shard = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        assert set(by_shard) <= set(range(4))
        for shard, poss in by_shard.items():
            assert sorted(poss) == list(range(len(poss))), shard

    def test_reproducible_and_epoch_sensitive(self, spark):
        """Same epoch twice → identical permutation; epoch+1 → a different
        one (the whole point: rerun reproducibility, epoch variety)."""
        from polars_view_spark.operators.packing import epoch_shuffle

        docs = self._docs(spark)
        a1 = {(r["doc_id"], r["shard"], r["pos"]) for r in epoch_shuffle(docs, 3).collect()}
        a2 = {(r["doc_id"], r["shard"], r["pos"]) for r in epoch_shuffle(docs, 3).collect()}
        b = {(r["doc_id"], r["shard"], r["pos"]) for r in epoch_shuffle(docs, 4).collect()}
        assert a1 == a2
        assert a1 != b

    def test_single_exchange_no_global_sort(self, spark):
        """One hash exchange on shard; no global range exchange (the
        100 TB contract: per-shard sorts only)."""
        from polars_view_spark.operators.packing import epoch_shuffle

        docs = self._docs(spark)
        plan = epoch_shuffle(docs, 1, 8)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Exchange rangepartitioning" not in plan

    def test_rejects_bad_params(self, spark):
        import pytest as _pytest

        from polars_view_spark.operators.packing import epoch_shuffle

        with _pytest.raises(ValueError):
            epoch_shuffle(self._docs(spark), epoch=-1)
        with _pytest.raises(ValueError):
            epoch_shuffle(self._docs(spark), epoch=0, n_shards=0)


class TestPersistedClassifier:
    """Model save/load + the streaming scoring gate's batch parity."""

    SF = "/root/testdata/sf0.001"

    def test_roundtrip(self, spark):
        from polars_view_spark.operators.classifier import (
            load_classifier,
            save_classifier,
        )

        w = [3, -7, 0, 12, 5]
        save_classifier(spark, w, "/tmp/pvs_clf_rt")
        got, dim = load_classifier(spark, "/tmp/pvs_clf_rt")
        assert got == w and dim == 4

    def test_corrupt_model_rejected(self, spark):
        """A gap in the weight index space must fail loudly — a partial
        write mis-aligning weights would silently mis-score everything."""
        from polars_view_spark.operators.classifier import load_classifier

        spark.createDataFrame(
            [(0, 5), (2, 7)], "i int, w long"
        ).write.mode("overwrite").parquet("/tmp/pvs_clf_bad")
        with pytest.raises(ValueError, match="corrupt"):
            load_classifier(spark, "/tmp/pvs_clf_bad")

    def test_streaming_matches_batch(self, spark, tmp_path):
        """Union of per-micro-batch scorings of a FROZEN model == one-shot
        batch scoring of all arrivals, across three triggers."""
        from polars_view_spark.operators.classifier import (
            save_classifier,
            score_with_weights,
            train_quality_classifier,
        )
        from polars_view_spark.operators.textstats import hashed_doc_vectors
        from polars_view_spark.streaming.events import (
            read_sink_or_empty,
            streaming_quality_score,
        )

        docs = spark.read.parquet(f"{self.SF}/documents.parquet")
        _, w = train_quality_classifier(
            docs, "array_contains(split(lower(trim(text)), '\\\\s+'), 'spark')",
            epochs=3,
        )
        model = str(tmp_path / "model")
        save_classifier(spark, w, model)

        arrivals = docs.filter("doc_id < 90")
        qdir = tmp_path / "arrivals"
        for lo, hi in ((0, 30), (30, 60), (60, 90)):
            arrivals.filter(f"doc_id >= {lo} AND doc_id < {hi}").coalesce(
                1
            ).write.mode("append").parquet(str(qdir))

        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(qdir))
        )
        sink = str(tmp_path / "scores")
        streaming_quality_score(stream, model, sink).awaitTermination()

        got = {
            (r["doc"], r["margin"], r["pred"])
            for r in read_sink_or_empty(
                spark, sink, "doc long, margin long, pred int, batch_id long"
            ).collect()
        }
        feats = hashed_doc_vectors(arrivals, "doc_id", "text", dim=64).select(
            "doc", "vec"
        )
        want = {
            (r["doc"], r["margin"], r["pred"])
            for r in score_with_weights(feats, w, 64)
            .select("doc", "margin", "pred")
            .collect()
        }
        assert got == want and len(want) == 90


class TestClusterBalancedSample:
    SF = "/root/testdata/sf0.001"

    def test_assignments_match_summary(self, spark):
        """kmeans_assignments is the per-vector face of the same
        trajectory: per-cluster counts equal kmeans_clusters' n_members."""
        from polars_view_spark.operators.similarity import (
            kmeans_assignments,
            kmeans_clusters,
        )

        emb = spark.read.parquet(f"{self.SF}/embeddings.parquet")
        sizes = {
            r["cluster_id"]: r["n_members"]
            for r in kmeans_clusters(emb, k=4, iterations=2).collect()
        }
        got = {
            r["cluster_id"]: r["count"]
            for r in kmeans_assignments(emb, k=4, iterations=2)
            .groupBy("cluster_id")
            .count()
            .collect()
        }
        assert got == sizes

    def test_quota_per_cluster(self, spark):
        from polars_view_spark.catalog import entries

        out = entries()["x_cluster_balanced_sample"].spark_fn(spark, self.SF).collect()
        per = {}
        for r in out:
            per.setdefault(r["cluster_id"], []).append(r["sample_rank"])
        for cid, ranks in per.items():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
            assert len(ranks) <= 5


class TestWarmStart:
    def test_warm_start_differs_from_cold(self, spark):
        """Fine-tuning from phase-A weights is NOT the same model as
        training on batch B alone — the seed carries phase-A knowledge."""
        from polars_view_spark.operators.classifier import train_quality_classifier

        docs = _planted(spark, n=40)
        a = docs.filter("doc_id < 20")
        b = docs.filter("doc_id >= 20")
        _, wa = train_quality_classifier(a, "is_ref", epochs=3)
        _, w_warm = train_quality_classifier(b, "is_ref", epochs=3, init_weights=wa)
        _, w_cold = train_quality_classifier(b, "is_ref", epochs=3)
        assert w_warm != w_cold
        assert w_warm != wa  # and it did actually train on B

    def test_wrong_width_rejected(self, spark):
        from polars_view_spark.operators.classifier import train_quality_classifier

        docs = _planted(spark, n=20)
        with pytest.raises(ValueError, match="init_weights"):
            train_quality_classifier(docs, "is_ref", epochs=1, init_weights=[1, 2, 3])

    def test_warm_start_preserves_planted_separation(self, spark):
        """The daily-crawl loop shape: model trained on day-1 data,
        fine-tuned on day-2 data, still separates the planted signal."""
        from polars_view_spark.operators.classifier import train_quality_classifier

        docs = _planted(spark, n=80)
        _, wa = train_quality_classifier(docs.filter("doc_id < 40"), "is_ref")
        scored, _ = train_quality_classifier(
            docs.filter("doc_id >= 40"), "is_ref", init_weights=wa
        )
        rows = scored.collect()
        acc = sum(r["pred"] == r["y"] for r in rows) / len(rows)
        assert acc == 1.0


class TestModelFilteredMix:
    SF = "/root/testdata/sf0.001"

    def test_equals_manual_stage_composition(self, spark):
        """The one-statement composition == running the stages by hand."""
        from polars_view_spark.operators.classifier import train_quality_classifier
        from polars_view_spark.operators.dedup import dedup_exact
        from polars_view_spark.operators.packing import (
            build_model_filtered_mix,
            pack_token_stream,
        )
        from polars_view_spark.operators.textstats import fingerprint
        from pyspark.sql import functions as F

        docs = spark.read.parquet(f"{self.SF}/documents.parquet")
        label = "array_contains(split(lower(trim(text)), '\\\\s+'), 'spark')"
        got = {
            (r["pack_shard"], r["chunk_id"], r["n_docs"], r["n_tokens"])
            for r in build_model_filtered_mix(docs, label).collect()
        }

        scored, _ = train_quality_classifier(docs, label)
        kept = docs.join(
            scored.filter("pred = 1").select(F.col("doc").alias("doc_id")),
            "doc_id",
        )
        deduped = dedup_exact(fingerprint(kept), ["fingerprint"], "doc_id")
        sharded = deduped.withColumn(
            "pack_shard", F.expr("concat(lang, '/', CAST(doc_id % 4 AS STRING))")
        ).withColumn("pack_id", F.col("doc_id"))
        want = {
            (r["pack_shard"], r["chunk_id"], r["n_docs"], r["n_tokens"])
            for r in pack_token_stream(
                sharded, shard_col="pack_shard", id_col="pack_id"
            ).collect()
        }
        assert got == want and len(got) > 0

    def test_filter_actually_excludes(self, spark):
        """The learned gate must drop a nontrivial slice — if it kept
        everything the composition would silently degenerate to plain
        dedup+pack."""
        from polars_view_spark.operators.classifier import train_quality_classifier

        docs = spark.read.parquet(f"{self.SF}/documents.parquet")
        label = "array_contains(split(lower(trim(text)), '\\\\s+'), 'spark')"
        scored, _ = train_quality_classifier(docs, label)
        kept = scored.filter("pred = 1").count()
        total = scored.count()
        assert 0 < kept < total


class TestClassifierTrajectoryFuzz:
    def test_trajectory_parity_on_arbitrary_unicode(self, spark):
        """For ANY corpus text — combining marks, emoji, whitespace soup —
        the full integer training trajectory must match DuckDB bit-exactly
        (tokenize → md5 bucket → balanced gradient → floor-div update).
        Labels come from doc_id (both classes guaranteed); learning
        quality is irrelevant here, only cross-engine arithmetic parity.
        Batched like TestSnKeyParityFuzz: corpus generated up front, ONE
        training run per engine."""
        import duckdb
        import pandas as pd
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from polars_view_spark.operators.classifier import (
            duck_classifier_oracle,
            train_quality_classifier,
        )

        texts: list[str] = []

        @settings(
            max_examples=150,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(st.text(max_size=60))
        def collect(t):
            texts.append(t)

        collect()
        rows = [(i, t) for i, t in enumerate(texts)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        scored, _ = train_quality_classifier(
            docs, "doc_id % 3 = 0", dim=8, epochs=3
        )
        got = {r["doc"]: (r["margin"], r["pred"], r["y"]) for r in scored.collect()}

        con = duckdb.connect()
        con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
        want = {
            int(d): (int(m), int(p), int(y))
            for d, m, p, y in con.execute(
                duck_classifier_oracle("t.doc_id % 3 = 0", dim=8, epochs=3)
            ).fetchall()
        }
        mism = {d: (got[d], want[d]) for d in want if got[d] != want[d]}
        assert got.keys() == want.keys()
        assert not mism, f"{len(mism)} mismatches, e.g. {list(mism.items())[:3]}"


class TestRetrievalEval:
    def _rare_corpus(self, spark):
        """Each doc owns a unique rare token so prefix self-retrieval must
        rank the source first."""
        rows = [
            (i, f"uniqtok{i} " + " ".join(f"uniqtok{i}x{j}" for j in range(6)))
            for i in range(20)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_perfect_retrieval_scores_perfectly(self, spark):
        from pyspark.sql import functions as F

        from polars_view_spark.operators.retrieval import (
            retrieval_eval,
            two_tower_topk,
        )

        docs = self._rare_corpus(spark)
        queries = docs.select(
            "doc_id",
            F.expr("concat_ws(' ', slice(split(text, ' '), 1, 3))").alias("text"),
        )
        results = two_tower_topk(queries, docs, k=5)
        truth = queries.select(
            F.col("doc_id").alias("query_id"), F.col("doc_id").alias("truth_id")
        )
        out = retrieval_eval(results, truth, k=5).collect()
        assert len(out) == 20
        # signed-hash collisions can demote a couple of queries to rank 2
        # (measured: 18×rank-1, 2×rank-2) — recall@5 must still be perfect
        # and MRR near-perfect; exact metric arithmetic is pinned by
        # test_rank_beyond_k / the catalog oracle
        assert all(r["hit_at_5"] == 1 for r in out)
        assert all(r["truth_rank"] in (1, 2) for r in out)
        assert sum(r["rr_ppm"] for r in out) / len(out) >= 900_000

    def test_missed_and_dropped_queries_score_zero(self, spark):
        """A query whose truth is absent from the corpus (and a query the
        retriever drops entirely) must land truth_rank=0, not vanish."""
        from pyspark.sql import functions as F

        from polars_view_spark.operators.retrieval import (
            retrieval_eval,
            two_tower_topk,
        )

        docs = self._rare_corpus(spark).filter("doc_id >= 2")  # truth 0,1 gone
        queries = self._rare_corpus(spark).select(
            "doc_id",
            F.expr("concat_ws(' ', slice(split(text, ' '), 1, 3))").alias("text"),
        )
        results = two_tower_topk(queries, docs, k=5)
        truth = queries.select(
            F.col("doc_id").alias("query_id"), F.col("doc_id").alias("truth_id")
        )
        out = {r["query_id"]: r for r in retrieval_eval(results, truth, k=5).collect()}
        assert len(out) == 20
        assert out[0]["truth_rank"] == 0 and out[0]["rr_ppm"] == 0
        assert out[1]["hit_at_5"] == 0
        assert out[5]["truth_rank"] == 1

    def test_rank_beyond_k_counts_as_miss(self, spark):
        """truth_rank deeper than the k cut reports 0 — recall@k, not
        recall@∞ (guards the CASE WHEN __r <= k clamp)."""
        from polars_view_spark.operators.retrieval import retrieval_eval

        results = spark.createDataFrame(
            [(1, 101, 1), (1, 102, 2), (1, 100, 3)],
            "query_id long, neighbor_id long, rank long",
        )
        truth = spark.createDataFrame([(1, 100)], "query_id long, truth_id long")
        out = retrieval_eval(results, truth, k=2).collect()[0]
        assert out["truth_rank"] == 0 and out["rr_ppm"] == 0


class TestCurriculumOrder:
    def test_bucket_monotone_and_contiguous(self, spark):
        """Buckets are floor(score/width) — monotone across negative
        scores (the naive DIV would fold -w+1..w-1 together) — and
        positions are contiguous per bucket."""
        from polars_view_spark.operators.packing import curriculum_order

        rows = [(i, s) for i, s in enumerate([-65, -64, -33, -32, -1, 0, 31, 32, 64])]
        df = spark.createDataFrame(rows, "doc_id long, margin long")
        out = {r["doc_id"]: r for r in
               curriculum_order(df, "margin", epoch=0, bucket_width=32).collect()}
        want_buckets = {0: -3, 1: -2, 2: -2, 3: -1, 4: -1, 5: 0, 6: 0, 7: 1, 8: 2}
        assert {d: r["bucket"] for d, r in out.items()} == want_buckets
        by_bucket = {}
        for r in out.values():
            by_bucket.setdefault(r["bucket"], []).append(r["pos"])
        for b, poss in by_bucket.items():
            assert sorted(poss) == list(range(len(poss))), b

    def test_epoch_changes_within_bucket_order_only(self, spark):
        from polars_view_spark.operators.packing import curriculum_order

        rows = [(i, (i % 3) * 100) for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, margin long")
        a = {r["doc_id"]: (r["bucket"], r["pos"])
             for r in curriculum_order(df, "margin", 1, 32).collect()}
        b = {r["doc_id"]: (r["bucket"], r["pos"])
             for r in curriculum_order(df, "margin", 2, 32).collect()}
        assert all(a[d][0] == b[d][0] for d in a)  # buckets stable
        assert any(a[d][1] != b[d][1] for d in a)  # order reshuffled


class TestStreamingQualityScoreDedup:
    def test_duplicate_arrivals_within_batch_scored_once(self, spark, tmp_path):
        """_available_now_sink's per-batch dedup on doc_id: a landing file
        with the same doc twice yields ONE scored row, and re-saving a
        model overwrites cleanly (mode=overwrite contract)."""
        from pyspark.sql import functions as F

        from polars_view_spark.operators.classifier import (
            load_classifier,
            save_classifier,
            train_quality_classifier,
        )
        from polars_view_spark.streaming.events import (
            read_sink_or_empty,
            streaming_quality_score,
        )

        docs = _planted(spark, n=20)
        _, w = train_quality_classifier(docs, "is_ref", epochs=2)
        model = str(tmp_path / "model")
        save_classifier(spark, [0] * 65, model)
        save_classifier(spark, w, model)  # overwrite with the real weights
        got, dim = load_classifier(spark, model)
        assert got == w and dim == 64

        dup = docs.filter("doc_id < 5")
        dup.unionAll(dup).coalesce(1).write.parquet(str(tmp_path / "landing"))
        stream = (
            spark.readStream.schema(docs.schema)
            .parquet(str(tmp_path / "landing"))
        )
        sink = str(tmp_path / "scores")
        streaming_quality_score(stream, model, sink).awaitTermination()
        out = read_sink_or_empty(
            spark, sink, "doc long, margin long, pred int, batch_id long"
        ).collect()
        assert len(out) == 5
        assert {r["doc"] for r in out} == set(range(5))


class TestTopicRouter:
    def _tri_planted(self, spark, n=60):
        vocabs = {
            "code": ["def", "class", "import", "return"],
            "math": ["theorem", "lemma", "proof", "integral"],
            "news": ["reuters", "reported", "minister", "election"],
        }
        names = list(vocabs)
        rows = []
        for i in range(n):
            name = names[i % 3]
            v = vocabs[name]
            rows.append((i, " ".join(v[(i + j) % len(v)] for j in range(7)), name))
        return rows, names, vocabs

    def test_planted_three_way_routing(self, spark):
        """Disjoint vocabularies route perfectly to their own class."""
        from pyspark.sql import functions as F

        from polars_view_spark.operators.classifier import train_topic_router

        rows, names, vocabs = self._tri_planted(spark)
        docs = spark.createDataFrame(rows, "doc_id long, text string, topic string")
        classes = [
            (name, F.expr(f"array_contains(split(text, ' '), '{vocabs[name][0]}')"))
            for name in names
        ]
        routed, models = train_topic_router(docs, classes)
        got = {r["doc"]: r["route"] for r in routed.collect()}
        want = {i: names[i % 3] for i in range(60)}
        acc = sum(got[d] == want[d] for d in want) / len(want)
        assert acc == 1.0, f"planted topics must route perfectly, got {acc}"
        assert set(models) == set(names)
        assert all(len(w) == 65 for w in models.values())

    def test_tie_breaks_to_earliest_class(self, spark):
        """Identical labels for two classes give identical margins — the
        argmax must pick the EARLIER class deterministically."""
        from polars_view_spark.operators.classifier import train_topic_router

        rows, names, vocabs = self._tri_planted(spark, n=30)
        docs = spark.createDataFrame(rows, "doc_id long, text string, topic string")
        same = f"array_contains(split(text, ' '), '{vocabs[names[0]][0]}')"
        routed, _ = train_topic_router(
            docs, [("first", same), ("second", same)], epochs=2
        )
        assert {r["route"] for r in routed.collect()} == {"first"}

    def test_guards(self, spark):
        import pytest as _pt

        from polars_view_spark.operators.classifier import train_topic_router

        rows, _, _ = self._tri_planted(spark, n=12)
        docs = spark.createDataFrame(rows, "doc_id long, text string, topic string")
        with _pt.raises(ValueError, match="at least 2"):
            train_topic_router(docs, [("only", "TRUE")])
        with _pt.raises(ValueError, match="duplicate"):
            train_topic_router(docs, [("a", "TRUE"), ("a", "FALSE")])


def test_null_label_counts_as_not_reference(spark):
    """A NULL label (possible with arbitrary user expressions) must train
    as y=0, matching the oracle's CASE … ELSE 0 — not silently vanish
    from the error sum."""
    from polars_view_spark.operators.classifier import train_quality_classifier

    docs = _planted(spark, n=20).withColumn(
        "is_ref",
        F.when(F.col("doc_id") < 3, None).otherwise(F.col("is_ref")),
    )
    scored, _ = train_quality_classifier(docs, F.col("is_ref"), epochs=2)
    got = {r["doc"]: r["y"] for r in scored.collect()}
    assert len(got) == 20  # nobody dropped
    assert got[0] == 0 and got[1] == 0 and got[2] == 0


class TestStreamingRouter:
    def test_route_partitioned_sink_and_batch_parity(self, spark, tmp_path):
        """Multi-batch routing == one-shot routing, AND the sink is
        physically partitioned by route (each topic pipeline tails its
        own subtree — the point of routing at ingest)."""
        import os

        from polars_view_spark.operators.classifier import (
            save_classifier,
            train_topic_router,
        )
        from polars_view_spark.streaming.events import (
            read_sink_or_empty,
            streaming_router,
        )

        vocabs = {"code": "def", "math": "lemma", "news": "reuters"}
        rows = [
            (i, f"{list(vocabs.values())[i % 3]} filler{i % 3} common")
            for i in range(30)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        classes = [
            (n, f"array_contains(split(text, ' '), '{w}')")
            for n, w in vocabs.items()
        ]
        routed, models = train_topic_router(docs, classes, epochs=3)
        want = {(r["doc"], r["route"], r["margin"]) for r in routed.collect()}

        paths = []
        for n in vocabs:
            p = str(tmp_path / f"head_{n}")
            save_classifier(spark, models[n], p)
            paths.append((n, p))

        qdir = tmp_path / "arrivals"
        for lo, hi in ((0, 10), (10, 20), (20, 30)):
            docs.filter(f"doc_id >= {lo} AND doc_id < {hi}").coalesce(
                1
            ).write.mode("append").parquet(str(qdir))
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(qdir))
        )
        sink = str(tmp_path / "routed")
        streaming_router(stream, paths, sink).awaitTermination()

        got = {
            (r["doc"], r["route"], r["margin"])
            for r in read_sink_or_empty(
                spark, sink, "doc long, margin long, route string, batch_id long"
            ).collect()
        }
        assert got == want and len(got) == 30
        subdirs = {d for d in os.listdir(sink) if d.startswith("route=")}
        assert subdirs == {f"route={n}" for n in vocabs}

    def test_mismatched_head_widths_rejected(self, spark, tmp_path):
        from polars_view_spark.operators.classifier import save_classifier
        from polars_view_spark.streaming.events import streaming_router

        save_classifier(spark, [1] * 65, str(tmp_path / "a"))
        save_classifier(spark, [1] * 33, str(tmp_path / "b"))
        src = tmp_path / "landing"
        spark.createDataFrame([], "doc_id long, text string").write.parquet(str(src))
        stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
        with pytest.raises(ValueError, match="feature width"):
            streaming_router(
                stream,
                [("a", str(tmp_path / "a")), ("b", str(tmp_path / "b"))],
                str(tmp_path / "out"),
            )
