"""Physical-plan quality gates — the properties that make these plans
survive a 100× scale-up, asserted so a regression fails CI:

- filters reach the parquet scan (PushedFilters)
- projections prune the read schema (ReadSchema)
- dimension joins broadcast (BroadcastHashJoin), the fact table never
  shuffles for them
- ORDER BY + LIMIT compiles to TakeOrderedAndProject (top-k, no total sort)
- aggregations are partial (two HashAggregate phases, map-side combine)
- sessionize's two window functions share ONE shuffle
"""

import re

import pytest

SF = "/root/testdata/sf0.001"


def plan_of(df, final: bool = False) -> str:
    # metadata strings (PushedFilters/ReadSchema) truncate at 100 chars by
    # default; raise the limit so assertions see the full lists
    df.sparkSession.conf.set("spark.sql.maxMetadataStringLength", "2000")
    if final:
        df.collect()  # let AQE finalize so codegen markers appear
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def cat():
    from polars_view_spark.catalog import entries

    return entries()


def test_filter_pushdown(spark, cat):
    plan = plan_of(cat["q_filter_predicates"].spark_fn(spark, SF))
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, "no pushed filters in scan"
    pushed = m.group(1)
    assert "o_totalprice" in pushed and "o_orderstatus" in pushed


def test_column_pruning(spark, cat):
    plan = plan_of(cat["q1_pricing_summary"].spark_fn(spark, SF))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m
    read_cols = m.group(1)
    # q1 needs 7 of the 11 lineitem columns; the scan must not read the rest
    assert "l_orderkey" not in read_cols
    assert "l_partkey" not in read_cols
    assert "l_quantity" in read_cols


def test_broadcast_dimension_joins(spark, cat):
    plan = plan_of(cat["q5_local_supplier"].spark_fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    # the big fact side must not go through a sort-merge join for dims
    assert plan.count("BroadcastHashJoin") >= 2


def test_topk_no_total_sort(spark, cat):
    plan = plan_of(cat["q3_shipping_priority"].spark_fn(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_partial_aggregation(spark, cat):
    plan = plan_of(cat["q1_pricing_summary"].spark_fn(spark, SF))
    # partial + final hash aggregate = map-side combine before the shuffle
    assert len(re.findall(r"HashAggregate", plan)) >= 2


def test_sessionize_single_shuffle(spark, cat):
    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.events import sessionize

    events = load_tables(spark, SF, "events")["events"]
    plan = plan_of(sessionize(events))
    # lag + running-sum share the (user_id) partitioning; groupBy(user, sid)
    # can AQE-reuse it -> at most 2 exchanges total, never 3
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2


def test_asof_no_cartesian(spark, cat):
    plan = plan_of(cat["e_asof_join"].spark_fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_whole_stage_codegen_on_scan_paths(spark, cat):
    plan = plan_of(cat["x_quality_score"].spark_fn(spark, SF), final=True)
    assert "*(" in plan  # WholeStageCodegen stage markers
    # no Python evaluation in the text-stats hot path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_multimodal_is_arrow_batched(spark, cat):
    for entry in (
        "x_multimodal_decode",
        "x_multimodal_framesample",
        "x_multimodal_resize",
    ):
        plan = plan_of(cat[entry].spark_fn(spark, SF))
        # mapInPandas shows up as MapInPandas (Arrow), NOT row-at-a-time
        assert "MapInPandas" in plan, entry
        assert "BatchEvalPython" not in plan, entry


def test_stratified_sample_no_shuffle(spark, cat):
    # deterministic sampling is a pure projection+filter — the plan may
    # contain NO exchange at all (any shuffle at 100 TB would be a bug)
    plan = plan_of(cat["x_stratified_sample"].spark_fn(spark, SF))
    pre_sort = plan.split("Sort", 1)[0]  # the orderBy is presentation-only
    assert "Exchange hashpartitioning" not in pre_sort
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vocab_topk_partial_agg_single_shuffle(spark, cat):
    plan = plan_of(cat["x_vocab_topk"].spark_fn(spark, SF))
    # explode → count must map-side combine (partial+final HashAggregate),
    # so the shuffle carries the distinct vocabulary, not the token stream
    assert len(re.findall(r"HashAggregate", plan)) >= 2
    assert "BatchEvalPython" not in plan


def test_scrub_denylist_codegen_only(spark, cat):
    plan = plan_of(cat["x_scrub_denylist"].spark_fn(spark, SF), final=True)
    assert "*(" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_embedding_quantize_codegen_only(spark, cat):
    # quantization must run at scan speed: projection-only, no exchange,
    # no Python in the row path
    plan = plan_of(cat["x_embedding_quantize"].spark_fn(spark, SF))
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_random_projection_arrow_kernel_no_shuffle(spark, cat):
    # JL projection is the width-compression scan step: no exchange, no
    # row-at-a-time Python; the plane multiply is the Arrow int64 matmul
    # kernel (the flat SQL sum exceeds Janino's 64 KB method limit and
    # falls back to interpreted — SCALE.md r05)
    plan = plan_of(cat["x_random_projection"].spark_fn(spark, SF))
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


def test_label_centroid_no_join_arrow_kernel(spark, cat):
    # centroids are literal-inlined after one bounded aggregate, so the
    # assignment pass must not join anywhere or run row-at-a-time Python;
    # the distance argmin is the Arrow kernel (the flat SQL expression
    # exceeds Janino's 64 KB limit), and only the confusion groupBy
    # shuffles the assigned rows
    plan = plan_of(cat["x_label_centroid"].spark_fn(spark, SF))
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 1


def test_merge_upsert_single_join_no_cartesian(spark, cat):
    # one full-outer hash join on the key; change-batch application must
    # never degrade to a nested-loop product or drop into Python
    plan = plan_of(cat["t_merge_upsert"].spark_fn(spark, SF), final=True)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Join") >= 1
    assert "BatchEvalPython" not in plan


def test_span_dedup_two_linear_shuffles(spark, cat):
    # chunk explode is a codegen projection; the only exchanges are the
    # window-by-chunk and the regroup-by-doc — both linear, no Python
    plan = plan_of(cat["d_span_dedup"].spark_fn(spark, SF))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


def test_pii_redact_codegen_only(spark, cat):
    # compliance pass runs at scan speed: pure whole-stage-codegen
    # projection, no shuffle of the corpus, no Python in the row path
    plan = plan_of(cat["x_pii_redact"].spark_fn(spark, SF), final=True)
    assert "*(" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ivf_assignment_is_projection(spark, cat):
    # IVF-flat cell assignment must be a pure projection against literal
    # centroids — no join/shuffle of the corpus for assignment; candidates
    # reach the scorer through a broadcast hash join only
    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.similarity import ivf_flat_topk
    from pyspark.sql import functions as F

    e = load_tables(spark, SF, "embeddings")["embeddings"]
    out = ivf_flat_topk(e, e.filter(F.col("vec_id") < 5), k=5)
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_incremental_minhash_broadcasts_new_batch(spark, cat):
    # the new batch's band rows must reach the corpus bands via a broadcast
    # hash join — the corpus is never self-joined in incremental mode
    from pyspark.sql import functions as F

    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.dedup import minhash_lsh_pairs_incremental

    d = load_tables(spark, SF, "documents")["documents"]
    out = minhash_lsh_pairs_incremental(
        d.filter(F.col("doc_id") % 10 != 0),
        d.filter(F.col("doc_id") % 10 == 0),
        "doc_id",
        "text",
        0.5,
    )
    # result is checkpointed; assert on rows instead of a stale plan string:
    # every pair touches a new doc
    rows = out.collect()
    assert all(r["doc1"] % 10 == 0 or r["doc2"] % 10 == 0 for r in rows)


def test_minhash_index_query_never_scans_corpus(spark, tmp_path):
    # the build/query split's whole point: after minhash_build_index, the
    # query-side plan reads ONLY the persisted index (signatures +
    # shingles parquet) and the new batch — the corpus source must be
    # absent, and so must any corpus-side re-hashing (VERDICT r06 task 3)
    from pyspark.sql import functions as F

    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.dedup import (
        minhash_build_index,
        minhash_query_index,
    )

    # scan-location metadata is BAKED at planning time at the current
    # limit (plan_of's later raise can't un-truncate it), and pytest's
    # long tmp_path pushes the index paths past the default 100 chars
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    d = load_tables(spark, SF, "documents")["documents"]
    corpus_src = str(tmp_path / "corpus_src")
    d.filter(F.col("doc_id") % 10 != 0).write.parquet(corpus_src)
    corpus = spark.read.parquet(corpus_src)
    idx = str(tmp_path / "mh_idx")
    minhash_build_index(corpus, idx, "doc_id", "text")

    new = d.filter(F.col("doc_id") % 10 == 0)
    out = minhash_query_index(
        spark, new, idx, "doc_id", "text", 0.5, materialize=False
    )
    plan = plan_of(out)
    assert "corpus_src" not in plan, "query side re-scanned the corpus"
    assert "signatures" in plan and "shingles" in plan
    # the batch's ids/candidates still travel by broadcast (bounded sides)
    assert "BroadcastHashJoin" in plan
    # r10 optimization: the candidates join is sort-merge so the batch
    # side re-uses the union+cap-window exchange instead of re-running
    # the corpus band pass under a BroadcastExchange (same rationale and
    # gate as test_simhash_self_join_reuses_band_pipeline)
    assert "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan


def test_gopher_quality_codegen_only(spark, cat):
    # first-pass scan filter: zero exchanges, zero Python eval
    plan = plan_of(cat["x_gopher_quality"].spark_fn(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the compute itself is projection-only — no aggregate/join anywhere
    assert "HashAggregate" not in plan and "Join" not in plan


def test_sequence_pack_two_shuffles(spark, cat):
    # per-shard cumsum window + final groupBy — exactly two exchanges
    # besides the presentation sort, both keyed on the shard column
    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.packing import pack_token_stream

    d = load_tables(spark, SF, "documents")["documents"]
    plan = plan_of(pack_token_stream(d))
    assert plan.count("Exchange") <= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_contamination_broadcasts_benchmark(spark, cat):
    # the corpus side must stream through a broadcast hash join — no
    # corpus-wide shuffle for candidate generation, no pair explosion
    from pyspark.sql import functions as F

    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.dedup import contamination_pairs

    d = load_tables(spark, SF, "documents")["documents"]
    out = contamination_pairs(d, d.filter(F.col("doc_id") % 97 == 0))
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_mixture_resample_no_shuffle(spark, cat):
    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.packing import mixture_resample

    d = load_tables(spark, SF, "documents")["documents"]
    plan = plan_of(mixture_resample(d))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_partitioned_roundtrip_prunes(spark, cat):
    # the partition-column filter must appear in PartitionFilters on the
    # re-read scan — directory-level pruning, the reason to partition at all
    plan = plan_of(cat["t_partitioned_roundtrip"].spark_fn(spark, SF))
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_orderpriority" in m.group(1), plan


def test_ivf_persisted_index_prunes_partitions(spark, cat):
    # the query pass over the persisted index must (a) probe via a
    # broadcast join — the index side never shuffles — and (b) prune the
    # cell-partitioned assignments scan dynamically, so only probed cells'
    # files are read however large the index grows
    plan = plan_of(cat["s_ann_index_persist"].spark_fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    m = re.search(r"PartitionFilters: \[[^\]]*dynamicpruning[^\]]*\]", plan)
    assert m, plan


def test_bucketed_join_entry_plan(spark, cat):
    # the bucketed layout must carry the join: both sides read
    # pre-hash-partitioned buckets, so the ONLY exchange left in the plan
    # is the final 5-group aggregate — the join itself never shuffles
    plan = plan_of(cat["t_bucketed_join"].spark_fn(spark, SF))
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    exchange_pos = plan.index("Exchange hashpartitioning")
    join_pos = plan.index("SortMergeJoin")
    assert exchange_pos < join_pos, "the one exchange must be the agg above the join"


def test_bm25_topk_broadcast_and_topk(spark, cat):
    # postings shuffle only; df/stats reach the scorer via broadcast, and
    # the ranking is per-partition top-k, never a total sort
    plan = plan_of(cat["s_bm25_topk"].spark_fn(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_token_budget_single_shuffle(spark, cat):
    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.packing import token_budget_cap

    d = load_tables(spark, SF, "documents")["documents"]
    plan = plan_of(token_budget_cap(d))
    assert plan.count("Exchange") <= 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_training_mix_no_corpus_rejoin(spark, cat):
    # the composed five-stage plan must never sort-merge-join the corpus
    # against itself: contamination + anti-join are broadcast, resampled
    # text rides through the explode (no id re-join), packing reuses the
    # shard partitioning
    from pyspark.sql import functions as F

    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.packing import build_training_mix

    d = load_tables(spark, SF, "documents")["documents"]
    out = build_training_mix(d, d.filter(F.col("doc_id") % 97 == 0))
    plan = plan_of(out)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_semantic_dedup_cell_join_no_cross_product(spark):
    # SemDeDup plan shape: the pair stage is a hash join ON THE CELL ID —
    # never a cross product.  Cell assignment is the one sanctioned Python
    # spot in the engine: an Arrow-batched vectorized argsort
    # (similarity._with_sorted_cells — interpreted higher-order functions
    # measured 1.5 ms/row); row-at-a-time Python stays banned.
    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.similarity import semantic_dedup

    e = load_tables(spark, SF, "embeddings")["embeddings"]
    plan = plan_of(semantic_dedup(e, threshold=0.4))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan  # the vectorized assignment, by design


def test_lm_score_model_is_broadcast(spark):
    # the bounded LM model must reach the corpus scorer via broadcast hash
    # join (never a sort-merge shuffle of the exploded corpus against it),
    # and the whole scoring path stays JVM-side
    from pyspark.sql import functions as F

    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.textstats import ngram_lm_score

    d = load_tables(spark, SF, "documents")["documents"]
    plan = plan_of(ngram_lm_score(d, d.filter(F.col("lang") == "en")))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dsir_models_are_broadcast(spark):
    # both bounded feature models reach the scorer via broadcast hash join;
    # the corpus explode path stays JVM-side with no cross product
    from pyspark.sql import functions as F

    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.textstats import dsir_weights

    d = load_tables(spark, SF, "documents")["documents"]
    # materialize=False: the eager localCheckpoint would truncate the
    # lineage to Scan ExistingRDD and blind this introspection
    out = dsir_weights(d, d.filter(F.col("lang") == "en"), materialize=False)
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    spark.catalog.clearCache()  # release the corpus-feature cache we now own


def test_bpe_apply_vocab_broadcast_jvm_side(spark):
    # the trained segmentation table reaches the tokenizer via broadcast
    # hash join; segmentation itself is array-fold codegen — no Python in
    # the apply path, no cross product
    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.bpe import apply_bpe, word_freq_table

    d = load_tables(spark, SF, "documents")["documents"]
    vocab = word_freq_table(d).limit(100)  # plan shape, not trained quality
    plan = plan_of(apply_bpe(d, vocab))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_line_dedup_is_projection_only(spark):
    # within-doc line dedup must fuse into the scan: no exchange, no
    # Python — it's a first-pass filter like gopher_quality
    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.textstats import dedup_lines

    d = load_tables(spark, SF, "documents")["documents"]
    plan = plan_of(dedup_lines(d))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chunk_documents_projection_only(spark):
    """chunk_documents is explode + projection — zero exchanges, zero
    Python eval: it must run at scan speed on a 100 TB corpus."""
    import pytest as _pytest

    from polars_view_spark.operators.packing import chunk_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = chunk_documents(docs, chunk_chars=100, overlap=20)
    plan = plan_of(df)
    assert "Exchange" not in plan, "chunking must not shuffle"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    # coverage + overlap semantics on a known string
    row_doc = spark.createDataFrame([(1, "a" * 250)], "doc_id long, text string")
    chunks = chunk_documents(row_doc, chunk_chars=100, overlap=20).collect()
    starts = [r["chunk_start"] for r in chunks]
    assert starts == [1, 81, 161, 241]
    assert [r["n_chunk_chars"] for r in chunks] == [100, 100, 90, 10]
    assert "".join(c["chunk_text"][: 100 - 20] for c in chunks[:-1]) + chunks[-1][
        "chunk_text"
    ] == "a" * 250

    # empty text still yields exactly one (empty) chunk; bad params raise
    empty = chunk_documents(
        spark.createDataFrame([(2, "")], "doc_id long, text string")
    ).collect()
    assert len(empty) == 1 and empty[0]["n_chunk_chars"] == 0
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_chars=10, overlap=10)


def test_q7_snowflake_broadcasts_dims(spark, cat):
    """Q7 shape: nation/supplier dims must broadcast — the lineitem fact
    shuffles only for the orders/customer bridge, never for dims."""
    plan = plan_of(cat["q7_volume_shipping"].spark_fn(spark, SF))
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 3
    assert "CartesianProduct" not in plan


def test_q10_topk_no_total_sort(spark, cat):
    plan = plan_of(cat["q10_returned_items"].spark_fn(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 1


def test_q18_semi_join_for_in_subquery(spark, cat):
    """The HAVING-qualified IN list becomes a semi join (hash or
    broadcast), never a per-row subquery re-execution."""
    plan = plan_of(cat["q18_large_orders"].spark_fn(spark, SF))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_keyset_pagination_pushes_cursor_filter(spark, cat):
    """The keyset cursor predicate `k1 > a OR (k1 = a AND k2 > b)` must
    reach the parquet scan as a pushed filter (the whole point of keyset
    over OFFSET — page N is a pruned range scan, not a deeper
    sort-and-discard), and the ORDER BY+LIMIT must compile to
    TakeOrderedAndProject, never a global Sort."""
    plan = plan_of(cat["q_keyset_pagination"].spark_fn(spark, SF))
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, "no pushed filters in scan"
    pushed = m.group(1)
    assert "Or(GreaterThan(o_custkey,37)" in pushed.replace(" ", ""), pushed
    assert "And(EqualTo(o_custkey,37),GreaterThan(o_orderkey,3000))" in (
        pushed.replace(" ", "")
    ), pushed
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


def test_negative_pairs_no_cross_join(spark):
    """Negative sampling must be an equi-join on the md5 bucket — never a
    cross product — and deterministic across invocations."""
    from polars_view_spark.operators.retrieval import negative_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = docs.filter("doc_id % 97 = 0")
    df = negative_pairs(q, docs, k=3, n_buckets=16)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan

    rows = df.collect()
    again = {tuple(r) for r in negative_pairs(q, docs, k=3, n_buckets=16).collect()}
    assert {tuple(r) for r in rows} == again  # reproducible, no rand()
    n_queries = q.count()
    assert 0 < len(rows) <= n_queries * 3
    assert all(r["neg_id"] != r["qid"] for r in rows)
    # every slot picks at most one negative
    from collections import Counter

    slots = Counter((r["qid"], r["neg_slot"]) for r in rows)
    assert max(slots.values()) == 1


def test_sketch_rollup_is_jvm_partial_agg(spark):
    """Sketch building/merging must be JVM ObjectHashAggregate with
    map-side partials — no Python, one shuffle per aggregation level —
    and merging arbitrary slice subsets must compose associatively."""
    from pyspark.sql import functions as F

    from polars_view_spark.operators.sketches import (
        hll_merge_estimate,
        hll_partial_sketches,
        kll_merge_quantiles,
        kll_partial_sketches,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":  # nanos variant
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ev = ev.withColumn("day", F.to_date("ts"))
    partials = hll_partial_sketches(ev, ["event_type"], "day", "user_id")
    plan = plan_of(hll_merge_estimate(partials, ["event_type"]))
    assert "partial_hll_sketch_agg" in plan, "no map-side sketch partials"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    # associativity: merging day-partials tracks sketching the whole input
    # (exactly equal in the sparse regime, within 1% once the union path
    # promotes to dense HLL mode — pinned at sf0.1 by the oracle entry)
    merged = {
        r["event_type"]: r["est_distinct"]
        for r in hll_merge_estimate(partials, ["event_type"]).collect()
    }
    whole = {
        r["event_type"]: r["w"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("w"))
        .collect()
    }
    assert set(merged) == set(whole)
    for et in whole:
        assert abs(merged[et] - whole[et]) <= max(0.01 * whole[et], 1), et

    # KLL quantiles: merged partials within rank tolerance of exact
    kparts = kll_partial_sketches(ev, ["event_type"], "day", "value")
    q = {
        r["event_type"]: r["q5"]
        for r in kll_merge_quantiles(kparts, ["event_type"], (0.5,)).collect()
    }
    exact = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5D)").alias("m"))
        .collect()
    }
    for et, est in q.items():
        # KLL guarantees rank error, not value error; at this distribution
        # 10% value slack is comfortably above the rank-1.7% envelope
        assert abs(est - exact[et]) / abs(exact[et]) < 0.10, (et, est, exact[et])


def test_topk_and_theta_merge_semantics(spark):
    """Heavy-hitter states combined from slices must equal the direct
    sketch over the whole input; theta algebra must satisfy
    |A| = |A∩B| + |A\\B| on exact-regime inputs."""
    from pyspark.sql import functions as F

    from polars_view_spark.operators.sketches import (
        theta_partial_sketches,
        theta_set_estimates,
        topk_merge,
        topk_partial_states,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ev = ev.withColumn("day", F.to_date("ts"))

    merged = topk_merge(topk_partial_states(ev, "day", "event_type"), 3).collect()
    direct = (
        ev.groupBy("event_type")
        .count()
        .orderBy(F.desc("count"), "event_type")
        .limit(3)
        .collect()
    )
    assert [(r["item"], r["est_count"]) for r in merged] == [
        (r["event_type"], r["count"]) for r in direct
    ]

    sk = theta_partial_sketches(
        ev.filter(F.col("event_type").isin("click", "error")), ["event_type"], "user_id"
    )
    wide = sk.groupBy().pivot("event_type", ["click", "error"]).agg(
        F.first("theta_sketch")
    )
    est = theta_set_estimates("click", "error")
    r = wide.select(
        F.expr(est["intersection"]).alias("i"), F.expr(est["difference"]).alias("d")
    ).collect()[0]
    n_click = ev.filter("event_type = 'click'").select("user_id").distinct().count()
    assert r["i"] + r["d"] == n_click


def test_tfidf_broadcast_stats_and_bounded_rank(spark, cat):
    """df/N reach the scorer via broadcast; the rank is a per-group window
    (one hash partitioning on the group), never a global sort of terms.
    The corpus explode happens ONCE, inside the pinned per-(doc, term)
    reduction — the final plan must contain no Generate and scan the raw
    documents at most once (the n_docs count)."""
    df = cat["x_tfidf_top_terms"].spark_fn(spark, SF)
    plan = plan_of(df)
    assert plan.count("BroadcastExchange") >= 2, "df/N stats not broadcast"
    assert "CartesianProduct" not in plan
    # BroadcastNestedLoopJoin is the 1-row N crossJoin — allowed only there
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "Generate" not in plan, "explode re-ran downstream of the pin"
    doc_scans = len(
        [ln for ln in plan.splitlines() if "FileScan parquet" in ln and "documents" in ln]
    )
    assert doc_scans <= 1, f"{doc_scans} raw documents scans"


def test_kmeans_assignment_is_projection(spark):
    """The per-iteration assignment must be a pure projection against
    literal centroid arrays — no join touches the corpus before the
    k-group aggregate, and the aggregate is partial (map-side combine)."""
    from polars_view_spark.operators.similarity import kmeans_clusters

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = kmeans_clusters(emb, k=4, iterations=1)
    plan = plan_of(out)
    assert "CartesianProduct" not in plan
    # final summary join is centroid-side broadcast
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2, "aggregate not partial"


def test_kmeans_plan_bounded_at_large_k(spark):
    """Analyzer-cost gate for the pattern that bit IVF once (d330b51) and
    k-means assignment in round 3: inlining k struct literals of dims
    integers each grows the analyzed plan by O(k·dims) text per iteration
    (~1.2 MB at k=256, dims=128).  The Arrow-kernel assignment keeps
    centroids in the UDF closure, so the plan must stay O(1) in k — this
    builds AND runs k=256 × dims=128 and pins the plan string size."""
    import time

    from pyspark.sql import functions as F

    from polars_view_spark.operators.similarity import kmeans_clusters

    emb = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 128), "
            "i -> CAST(pmod(id * 37 + i * 13, 101) - 50 AS DOUBLE) / 50.0)"
        ).alias("embedding"),
    )
    t0 = time.monotonic()
    out = kmeans_clusters(emb, k=256, iterations=1)
    plan = plan_of(out)
    rows = out.collect()
    elapsed = time.monotonic() - t0
    assert len(plan) < 100_000, f"plan text {len(plan)} chars — centroid literals leaked back"
    assert rows, "no clusters"
    # generous wall bound: the literal-inlining generation never finished
    # analysis at this size; the kernel path runs in seconds
    assert elapsed < 120, f"{elapsed:.0f}s — analyzer cost regressed"


def test_single_tokenize_in_pushed_filters_and_projects(spark):
    """Regression guard for the CollapseProject / pushdown inlining trap:
    higher-order-function expressions never enter whole-stage codegen, so
    any plan node whose text repeats the tokenizing ``split(`` N times
    evaluates it N times per row on the interpreted path.  The let-binding
    idiom (``exists(array(split(...)), t -> ...)`` / ``transform(array(...),
    x -> ...)[0]``) holds the count at one per row.  Each assertion pins the
    worst node of a plan that regressed before: gopher's pushed verdict
    filter (5.95 s -> 1.22 s at sf0.1), bigram extraction (10 s -> 1 s),
    winnow's per-position substr (18 s -> 4 s)."""
    from pyspark.sql import functions as F

    from polars_view_spark.operators.textstats import (
        gopher_quality,
        winnow_fingerprints,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")

    # plan strings truncate by default (maxToStringFields / metadata
    # limits), which could HIDE repeated occurrences and green-wash a
    # regression — raise the limits and assert the needle count exactly
    # (== 1, not <= 1), so a truncated-away expression also fails loudly
    spark.conf.set("spark.sql.debug.maxToStringFields", "2000")
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")

    def max_occurrences(df, needle: str, node_prefix: str | None = None) -> int:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "... " not in plan or "more fields" not in plan, "plan truncated"
        lines = [
            ln for ln in plan.splitlines()
            if node_prefix is None or node_prefix in ln
        ]
        return max((ln.count(needle) for ln in lines), default=0)

    # the pushed-down verdict FILTER runs per input row — must tokenize once.
    # (The stats Project above it keeps one split per output column — a
    # bounded constant paid only by that operator, not the scan filter.)
    kept = gopher_quality(docs).filter(F.col("passes_gopher"))
    assert max_occurrences(kept, "split(", node_prefix="Filter ") == 1

    # winnow: one regexp-normalize and one md5 chain per row, anywhere
    w = winnow_fingerprints(docs)
    assert max_occurrences(w, "regexp_replace(") == 1
    assert max_occurrences(w, "md5(") == 1
    # bigram_pmi's extraction sits behind an eager localCheckpoint (its
    # counts feed three aggregates), so its plan is not inspectable here;
    # its single-tokenize shape is pinned by the 1 s catalog timing and the
    # let-bound expression itself (textstats.bigram_pmi).


def test_no_distinct_plus_sketch_expand(spark, cat):
    """q_approx_aggregates must NOT plan COUNT(DISTINCT) and the sketch
    aggregates through one fused rewrite — that shape computes the sketch
    partials inside an aggregate KEYED BY the distinct column, so every
    distinct key carries the 16 KB HLL + quantile-summaries buffers
    through the shuffle (measured 150 s at sf0.1; split into two
    aggregations it is ~2 s).  The gate: sketch functions may only appear
    in GLOBAL (keys=[]) aggregates.  (An earlier version looked for an
    Expand node — this Spark version plans the fused shape via
    planAggregateWithOneDistinct with no Expand, so that gate was vacuous;
    verified by reverting the fix and watching this assertion fail.)"""
    df = cat["q_approx_aggregates"].spark_fn(spark, SF)
    plan = plan_of(df)
    keyed_agg = re.compile(r"Aggregate\(keys=\[[^\]]")  # non-empty keys
    sketchy = [
        ln.strip()[:160]
        for ln in plan.splitlines()
        if keyed_agg.search(ln)
        and ("approx_count_distinct" in ln or "percentile" in ln)
    ]
    assert not sketchy, "sketch partials keyed by the distinct column:\n" + "\n".join(sketchy)
    # and the sketches must actually be in the plan somewhere (global aggs)
    assert "approx_count_distinct" in plan and "percentile" in plan


# ---------------------------------------------------------------------------
# Catalog-wide audit meta-gate (VERDICT r03 task 7): every entry's plan runs
# through the same audit users get, so a NEW catalog entry cannot dodge plan
# review by simply not having a hand-written gate here.
# ---------------------------------------------------------------------------

#: entry -> why its BroadcastNestedLoopJoin is bounded (the broadcast side
#: is O(1) or hyperparameter-sized, never data-proportional).  A BNLJ with
#: a bounded broadcast side streams the big side once — the scale-correct
#: shape for scalar-stat joins; an UNLISTED BNLJ fails the gate.
CATALOG_BNLJ_ALLOW: dict[str, str] = {
    "e_range_join": "broadcast side is the bounded bucket-bounds table",
    "s_ann_pq_topk": "bounded query set broadcast with its 16x64 integer "
    "ADC distance tables; the full scan over 16-int codes IS the operator "
    "(IVF composes in front when cell pruning is wanted) — "
    "similarity.py:_pq_adc_topk docstring",
    "s_ann_pq_rerank": "stage 1 is pq_topk's bounded query-table broadcast "
    "(same reason); stage 2 fetches only the O(queries*shortlist) rows "
    "through id-keyed hash joins",
    "s_ann_pq_persist": "same ADC helper as s_ann_pq_topk over the "
    "persisted codes — identical bounded query-table broadcast",
    "e_streaming_pq_lookup": "per-micro-batch pq_query_index call — the "
    "bounded ARRIVING BATCH is the broadcast side, the persisted codes "
    "stream once per trigger",
    "x_ks_drift": "both BNLJs broadcast ONE-ROW aggregates (the sample "
    "totals and the max statistic) into scalar comparisons — "
    "scale.py:ks_statistic docstring",
    "x_psi_drift": "both BNLJs broadcast ONE-ROW aggregates (the reference "
    "min/max edges and the sample totals) into scalar projections; the "
    "k-row bucket spine joins hash-side — scale.py:psi_drift docstring",
    "e_resample_ffill": "the BNLJ is the SPINE construction: distinct event "
    "types (domain-enum-sized) x the hour sequence exploded from a ONE-ROW "
    "bounds aggregate (calendar-sized, grows with the observed time range, "
    "never with row volume) — events.py:resample_ffill docstring; the agg "
    "join onto the spine is a hash join",
    "x_equidepth_histogram": "BNLJ broadcasts the ONE-ROW total-count "
    "aggregate into the rank-to-bucket projection — "
    "scale.py:equidepth_histogram docstring",
    "x_expectations_distribution": "drift snapshot side is a 1-row broadcast "
    "aggregate per ref (operators/expectations.py docstring) — the persisted-"
    "profile mode (x_expectations_persisted_drift) removes even that join",
    "q_approx_aggregates": "1-row scalar approx-aggregate subquery broadcast",
    "q_cross_join": "deliberate CROSS JOIN entry over two tiny dims (region heads)",
    "s_ann_bruteforce_topk": "query set broadcast by design (baseline scorer)",
    "s_ann_recall_eval": "embeds the brute-force baseline (bounded query "
    "broadcast, its documented reason) as the exact side of the recall "
    "intersection; the eval join itself is a bounded O(queries*k) equi-join "
    "— catalog_ext.py:_s_ann_recall_eval docstring",
    "s_ann_quantized_topk": "query set broadcast by design, 4x smaller than "
    "the float baseline's (int8 codes — similarity.py:quantized_topk "
    "docstring); the scale path composes the same codes with lsh_topk/IVF "
    "candidate generation",
    "s_two_tower_text_topk": "bounded query-tower vectors broadcast by design "
    "(exact-scoring baseline; the scale path swaps in lsh_topk/IVF candidates "
    "with the same scoring tail — retrieval.py:two_tower_topk docstring)",
    "x_retrieval_eval": "wraps the two-tower retriever, inheriting its bounded "
    "query-tower broadcast (same reason as s_two_tower_text_topk); the eval "
    "join itself is a bounded O(queries*k) equi-join — "
    "retrieval.py:retrieval_eval docstring",
    "s_bm25_topk": "1-row corpus stats (N, avgdl) broadcast",
    "s_mmr_rerank": "candidate generation reuses the brute-force baseline's "
    "bounded query-vector broadcast (n_queries rows); every greedy step "
    "operates on n_queries × n_candidates rows — similarity.py:mmr_rerank "
    "docstring",
    "s_hybrid_rrf_topk": "dense leg reuses the brute-force baseline's bounded "
    "query-vector broadcast (n_queries rows); the scale path swaps in "
    "ivf_topk/lsh_topk with the same (query_id, neighbor_id, rank) contract "
    "— retrieval.py:hybrid_rrf_topk docstring",
    "x_audience_overlap": "1-row merged-sketch scalars broadcast (two stages)",
    "x_join_explosion_check": "1-row total-output-cardinality broadcast",
    "x_bigram_pmi": "1-row corpus token total broadcast",
    "x_dsir_weights": "1-row model-total broadcasts (target + raw)",
    "x_lm_score": "1-row corpus token total broadcast",
    "x_outlier_filter": "1-row global mean/stddev broadcast (two stages)",
    "x_salted_skew_join": "salt fan-out crosses the small dim with the literal salt range (n_salts)",
    "x_snapshot_drift": "1-row snapshot totals broadcast",
    "x_temperature_sample": "1-row corpus totals (n_total, sq_total) broadcast",
    "x_tfidf_top_terms": "1-row document count broadcast",
}


def _catalog_names():
    from polars_view_spark.catalog import entries

    return sorted(entries())


@pytest.mark.parametrize("name", _catalog_names())
def test_catalog_wide_audit(spark, name):
    """No catalog entry may ship a CartesianProduct, an unjustified
    nested-loop join, a row-at-a-time Python UDF, or an unpruned wide
    scan — the unambiguous 100-TB killers audit_plan flags.  A
    BroadcastNestedLoopJoin passes only with a documented bounded-
    broadcast reason in CATALOG_BNLJ_ALLOW.  (Global sorts and high
    shuffle counts are NOT hard-gated: oracle determinism requires ORDER
    BY tails, and multi-stage pipelines legitimately shuffle; those stay
    judgment calls for the per-operator gates above.)"""
    from polars_view_spark.catalog import entries
    from polars_view_spark.plans.audit import audit_plan

    entry = entries()[name]
    df = entry.spark_fn(spark, SF)
    a = audit_plan(df)
    hard = []
    if "CartesianProduct" in a.plan:
        hard.append("CartesianProduct (both sides shuffled: O(n*m) at scale)")
    if "BroadcastNestedLoopJoin" in a.plan and name not in CATALOG_BNLJ_ALLOW:
        hard.append(
            "BroadcastNestedLoopJoin without a documented bounded-broadcast "
            "reason (add to CATALOG_BNLJ_ALLOW only if the broadcast side "
            "is O(1)/hyperparameter-sized)"
        )
    if a.has_python_row_eval:
        hard.append("row-at-a-time Python UDF (BatchEvalPython)")
    for s in a.scans:
        if s.n_columns >= 10:
            hard.append(f"unpruned scan of {s.relation}: {s.n_columns} columns")
    assert not hard, f"{name}: {hard}\n--- plan ---\n{a.plan[:4000]}"


def test_bloom_pruned_join_plan(spark, cat):
    # under the entry's scoped confs the runtime filter must materialize:
    # a bloom_filter_agg over the selective side's keys and a
    # might_contain pushed onto the fact side BELOW the shuffle — the
    # pruning that erases most of the fact shuffle write at 100 TB
    from polars_view_spark.catalog_ext import bloom_confs_scope, bloom_join_frame

    with bloom_confs_scope(spark):
        plan = plan_of(bloom_join_frame(spark, SF))
    assert "might_contain" in plan, plan
    assert "bloom_filter_agg" in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    # positional check that the pruning really lands pre-shuffle: in the
    # printed tree parents precede children, so the fact branch must read
    # Exchange hashpartitioning(l_orderkey) -> Filter(might_contain) ->
    # lineitem FileScan, with no further hash shuffle between the filter
    # and its scan.  (The bloom-build subquery prints inline below the
    # filter; its Exchange is SinglePartition, so scoping to
    # hashpartitioning keeps the check on the fact path only.)
    mc = plan.index("might_contain")
    assert "Exchange hashpartitioning(l_orderkey" in plan[:mc], (
        "the fact shuffle must sit ABOVE the bloom filter (filter "
        "executes before the shuffle it exists to shrink)"
    )
    below = plan[mc:]
    scan_pos = below.index("lineitem")
    assert "Exchange hashpartitioning" not in below[:scan_pos], (
        "a hash shuffle sits between might_contain and the fact scan"
    )


def test_bloom_entry_restores_confs(spark, cat):
    # the entry lowers session-wide shuffle/runtime-filter thresholds to
    # force the injection at test SF; it must put every one of them back
    # so no other entry inherits a broadcast-disabled session
    from polars_view_spark.catalog_ext import _BLOOM_CONFS

    before = {k: spark.conf.get(k) for k in _BLOOM_CONFS}
    df = cat["x_bloom_pruned_join"].spark_fn(spark, SF)
    after = {k: spark.conf.get(k) for k in _BLOOM_CONFS}
    assert before == after, (before, after)
    assert df.count() > 0


def test_mmr_rerank_full_lineage_audit(spark):
    """mmr_rerank's execution path localCheckpoints its bounded tables,
    which truncates the audited plan to ExistingRDD scans — so the
    catalog-wide audit can't see inside it.  This gate audits the FULL
    lineage (materialize=False): the only nested-loop join allowed is
    the brute-force candidate generator's bounded query broadcast, and
    nothing may introduce a CartesianProduct or row-at-a-time Python."""
    from polars_view_spark.operators.similarity import mmr_rerank
    from polars_view_spark.plans.audit import audit_plan

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = mmr_rerank(
        emb, emb.filter("vec_id < 3"), k=3, n_candidates=8, materialize=False
    )
    a = audit_plan(df)
    assert "CartesianProduct" not in a.plan
    assert not a.has_python_row_eval
    # the bounded query broadcast IS expected (CATALOG_BNLJ_ALLOW reason)
    assert "BroadcastNestedLoopJoin" in a.plan
    for s in a.scans:
        assert s.n_columns < 10, (s.relation, s.n_columns)


def test_sentence_udtf_plan_no_shuffle(spark):
    """The UDTF lateral join must parallelize over the input's partitions
    with NO exchange: scan → [Batch|Arrow]EvalPythonUDTF → project — the
    'no-shuffle lateral plan' property OPERATORS.md claims for
    x_sentence_split_udtf."""
    from polars_view_spark.operators.udtfs import sentence_table

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(sentence_table(docs))
    assert "PythonUDTF" in plan, plan[:2000]
    assert "Exchange" not in plan, plan[:2000]


def test_quantized_topk_broadcasts_queries_no_python(spark):
    """Int8-code ANN (s_ann_quantized_topk): quantization is pure codegen
    array lambdas fused into both scans, the query side is BROADCAST
    (corpus never shuffles), and nothing falls back to Python eval — the
    4x-smaller broadcast payload is the whole point at 100 TB."""
    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.similarity import quantized_topk

    from pyspark.sql import functions as F

    e = load_tables(spark, SF, "embeddings")["embeddings"]
    plan = plan_of(quantized_topk(e, e.filter(F.col("vec_id") < 5), k=5))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_url_exact_dedup_single_shuffle_no_python(spark, cat):
    """Canonical-URL dedup (d_url_exact_dedup): canonicalization is pure
    codegen riding the scan; the whole entry costs ONE keyed shuffle (the
    canon_url aggregate; orderBy rides a final sort for display) and never
    touches Python."""
    plan = plan_of(cat["d_url_exact_dedup"].spark_fn(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one hashpartitioning exchange for the groupBy; rangepartitioning for
    # the display sort is tolerated
    import re as _re

    hash_exchanges = _re.findall(r"Exchange hashpartitioning", plan)
    assert len(hash_exchanges) == 1, plan


def test_countmin_sketch_properties_and_plan(spark):
    """Count-Min (x_countmin_sketch): (1) the sketch NEVER underestimates —
    for EVERY distinct token, min-over-rows ≥ the exact count; (2) the
    sketch is mergeable — counters over A∪B equal the cell-wise sum of the
    two halves' counters (the partial-combine contract that makes it one
    aggregate at 100 TB); (3) the build is JVM-side (no Python) with
    map-side partial aggregation, and estimation broadcasts the sketch."""
    from pyspark.sql import functions as F

    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.sketches import (
        countmin_estimates,
        countmin_sketch,
    )
    from polars_view_spark.functions.texthash import tokens_expr

    d = load_tables(spark, SF, "documents")["documents"]
    sketch = countmin_sketch(d)

    # (1) every-token property, not just the entry's top-15 probe set
    exact = (
        d.select(F.explode(tokens_expr("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    )
    est = countmin_estimates(sketch, exact)
    n_bad = est.filter(F.col("cm_est") < F.col("n_exact")).count()
    assert n_bad == 0

    # (2) mergeability: cell-wise sum of the halves == whole
    a = countmin_sketch(d.filter(F.col("doc_id") % 2 == 0))
    b = countmin_sketch(d.filter(F.col("doc_id") % 2 == 1))
    merged = (
        a.select("j", "bucket", "c")
        .unionAll(b.select("j", "bucket", "c"))
        .groupBy("j", "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    whole = {(r["j"], r["bucket"]): r["c"] for r in sketch.collect()}
    got = {(r["j"], r["bucket"]): r["c"] for r in merged.collect()}
    assert got == whole and len(whole) > 0

    # (3) plan gates
    build_plan = plan_of(sketch)
    assert "BatchEvalPython" not in build_plan and "ArrowEvalPython" not in build_plan
    assert len(re.findall(r"HashAggregate", build_plan)) >= 2  # partial+final
    est_plan = plan_of(est)
    assert "BroadcastHashJoin" in est_plan
    assert "CartesianProduct" not in est_plan


def test_label_propagation_recovers_planted_communities(spark, cat):
    """x_label_propagation: the planted-structure graph (intra-region
    trade + sparse cross-region noise) must resolve into several
    communities — not collapse to one label (noise won) and not stay
    fully fragmented (no propagation happened).  Also gates the plan:
    iterative joins stay JVM-side with no cartesian blowup."""
    df = cat["x_label_propagation"].spark_fn(spark, SF)
    rows = df.collect()
    comms = {r["community"] for r in rows}
    assert 3 <= len(comms) < len(rows), (len(comms), len(rows))
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_retention_vacuum_safety(spark, tmp_path):
    """retention_vacuum: keep<1 refuses; non-partition entries in the
    dataset root (metadata files, _SUCCESS) survive the vacuum."""
    import pytest as _pytest

    from polars_view_spark.operators.snapshot import retention_vacuum

    ds = tmp_path / "ds"
    spark.range(10).selectExpr(
        "id", "CAST(id % 3 AS STRING) AS part"
    ).write.partitionBy("part").parquet(str(ds))
    (ds / "_extra.txt").write_text("keep me")
    with _pytest.raises(ValueError, match="keep must be >= 1"):
        retention_vacuum(spark, str(ds), "part", keep=0)
    audit = {r["part"]: r["kept"] for r in
             retention_vacuum(spark, str(ds), "part", keep=2).collect()}
    assert audit == {"0": False, "1": True, "2": True}
    assert (ds / "_extra.txt").exists()
    left = spark.read.parquet(str(ds)).selectExpr(
        "CAST(part AS STRING) AS part"
    ).distinct().collect()
    assert {r["part"] for r in left} == {"1", "2"}


def test_retention_vacuum_mixed_width_numeric_refuses(spark, tmp_path):
    """VERDICT r08 task 7: 'newest' is lexicographic, so o_year=999 would
    outlive o_year=1000 — mixed-width bare-integer partition values must
    refuse rather than delete the genuinely newer partition.  Equal-width
    (zero-padded) numerics and ISO dates keep working."""
    import pytest as _pytest

    from polars_view_spark.operators.snapshot import retention_vacuum

    ds = tmp_path / "years"
    spark.createDataFrame(
        [(1, "999"), (2, "1000"), (3, "1001")], "id long, y string"
    ).write.partitionBy("y").parquet(str(ds))
    with _pytest.raises(ValueError, match="mixed width"):
        retention_vacuum(spark, str(ds), "y", keep=2)
    # nothing was deleted by the refused call
    survivors = spark.read.parquet(str(ds)).selectExpr(
        "CAST(y AS STRING) AS y"
    ).distinct().collect()
    assert {r["y"] for r in survivors} == {"999", "1000", "1001"}

    padded = tmp_path / "padded"
    spark.createDataFrame(
        [(1, "0999"), (2, "1000"), (3, "1001")], "id long, y string"
    ).write.partitionBy("y").parquet(str(padded))
    audit = {
        r["y"]: r["kept"]
        for r in retention_vacuum(spark, str(padded), "y", keep=2).collect()
    }
    assert audit == {"0999": False, "1000": True, "1001": True}


def test_bloom_membership_properties_and_plan(spark):
    """Bloom (x_bloom_membership): (1) NO false negatives — every built
    key probes true; (2) mergeable — bit_or of the halves' filters equals
    the whole-corpus filter (the partial-combine contract); (3) build is
    JVM-side with map-side partial aggregation and the probe broadcasts
    the <=128-row sketch."""
    from pyspark.sql import functions as F

    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.sketches import bloom_build, bloom_probe

    d = (
        load_tables(spark, SF, "documents")["documents"]
        .select("doc_id", F.md5("text").alias("fp"))
    )
    sketch = bloom_build(d, "fp")

    # (1) every built key must probe true
    probed = bloom_probe(sketch, d, "fp")
    assert probed.filter(~F.col("maybe_member")).count() == 0

    # (2) mergeability: OR of the halves == whole
    a = bloom_build(d.filter(F.col("doc_id") % 2 == 0), "fp")
    b = bloom_build(d.filter(F.col("doc_id") % 2 == 1), "fp")
    merged = (
        a.unionAll(b)
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").cast("long").alias("bits"))
    )
    whole = {(r["word"]): r["bits"] for r in sketch.collect()}
    got = {(r["word"]): r["bits"] for r in merged.collect()}
    assert got == whole and len(whole) > 0

    # (3) plan gates
    build_plan = plan_of(sketch)
    assert "BatchEvalPython" not in build_plan and "ArrowEvalPython" not in build_plan
    assert len(re.findall(r"HashAggregate", build_plan)) >= 2  # partial+final
    probe_plan = plan_of(probed)
    assert "BroadcastHashJoin" in probe_plan
    assert "CartesianProduct" not in probe_plan


def test_html_extract_codegen_only(spark, cat):
    # the HTML->text front door must run at scan speed: whole-stage
    # codegen projection, no shuffle before the presentation sort, no
    # Python in the row path
    plan = plan_of(cat["x_html_extract"].spark_fn(spark, SF), final=True)
    assert "*(" in plan
    pre_sort = plan.split("Sort", 1)[0]
    assert "Exchange hashpartitioning" not in pre_sort
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_winsorize_broadcasts_bounds(spark, cat):
    # the per-type bounds frame is |types|-rows: it must come back as a
    # broadcast join, never a shuffled merge join of the event stream
    plan = plan_of(cat["x_winsorize"].spark_fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_simhash_self_join_reuses_band_pipeline(spark, cat):
    # r10 optimization: the band-bucket self-join must be sort-merge, not
    # broadcast — a broadcast build side cannot reuse the probe side's
    # shuffle, so the whole fingerprint pipeline (shingle explode → hash →
    # aggregate → cap window) would compute TWICE.  As sort-merge, both
    # sides are the same canonical subtree over the cap window's
    # (band, bval) hashpartitioning and the runtime reuses one exchange.
    # (Also the only join that exists at corpus scale — a corpus-wide band
    # table never fits a broadcast.)
    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.dedup import simhash_near_dup_pairs

    docs = load_tables(spark, SF, "documents")["documents"]
    plan = plan_of(simhash_near_dup_pairs(docs, "doc_id", "text"))
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_minhash_query_index_reuses_band_exchange(spark, tmp_path):
    # r10 optimization, second pass: the union+cap-window band shuffle must
    # compute ONCE per query, the other sort-merge side fed by a
    # ReusedExchange.  Two ingredients, both load-bearing: the MERGE hint
    # (a broadcast build side re-runs the whole subtree), and new_sigs
    # being localCheckpoint-ed rather than cache()-d — an InMemoryTableScan
    # inside the band subtree defeats AQE's exchange-reuse canonicalization
    # and the corpus band pass silently doubles (measured on the r10 idle
    # box: ReusedExchange absent with cache, present with checkpoint).
    from pyspark.sql import functions as F

    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.dedup import (
        minhash_build_index,
        minhash_query_index,
    )

    d = load_tables(spark, SF, "documents")["documents"]
    idx = str(tmp_path / "mh_idx_reuse")
    minhash_build_index(d.filter(F.col("doc_id") % 10 != 0), idx, "doc_id", "text")
    out = minhash_query_index(
        spark, d.filter(F.col("doc_id") % 10 == 0), idx, "doc_id", "text", 0.5,
        materialize=False,
    )
    plan = plan_of(out, final=True)
    assert "ReusedExchange" in plan, (
        "band-table exchange not reused — the candidates join recomputes "
        "the corpus band pass on its second side"
    )


def test_frequent_pairs_self_join_reuses_exchange(spark, cat):
    # r10 optimization: the basket self-join must be sort-merge with the
    # second side a ReusedExchange of the first — broadcast would re-run
    # the distinct+prune pipeline, and a corpus-scale item table could
    # never broadcast anyway (same gate as the simhash/minhash band joins)
    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.mining import frequent_pairs

    li = load_tables(spark, SF, "lineitem")["lineitem"]
    out = frequent_pairs(li, "l_orderkey", "l_partkey", min_support=2)
    plan = plan_of(out, final=True)
    assert "SortMergeJoin" in plan
    assert "ReusedExchange" in plan
