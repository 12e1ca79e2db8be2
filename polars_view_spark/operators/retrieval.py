"""Keyword retrieval: BM25 scoring and top-k over a document corpus.

The classic inverted-index ranking, re-expressed as DataFrame algebra so it
runs distributed without a server-side index: term frequencies come from
one explode+groupBy pass (filtered to query terms BEFORE the shuffle, so
the aggregate only sees postings for the query), document length and
corpus statistics ride along via a 1-row broadcast, and the final ranking
is ORDER BY + LIMIT → TakeOrderedAndProject (per-partition top-k, no total
sort).  The DuckDB oracle in catalog_ext.py replicates the identical
formula from the same constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_view_spark.functions.texthash import tokens_expr

BM25_K1 = 1.2
BM25_B = 0.75

# Scale-aware negative-sampling bucket count: the candidate join produces
# |queries| × k × (|corpus| / n_buckets) rows, so n_buckets must grow with
# the corpus to hold per-slot candidate volume constant.  TARGET_BUCKET=160
# reproduces the SCALE.md controlled experiment (5 000 docs → 32 buckets,
# the long-standing manual default; 50 000 → 512, bracketing the measured
# n_buckets=320 / 12× speedup point at the same ~10² bucket size).
# All-integer doubling so the DuckDB oracle derives the identical count
# with no float log2 (the adaptive_lsh_bits discipline, vectors.py:133).
NEG_TARGET_BUCKET = 160
NEG_MIN_BUCKETS = 32
NEG_MAX_BUCKETS = 1 << 26


def adaptive_neg_buckets(
    n_rows: int,
    target_bucket: int = NEG_TARGET_BUCKET,
    min_buckets: int = NEG_MIN_BUCKETS,
    max_buckets: int = NEG_MAX_BUCKETS,
) -> int:
    """Smallest power-of-two multiple of ``min_buckets`` holding the
    expected bucket size ≤ ``target_bucket``, clamped to ``max_buckets``
    — mirrored bit-for-bit by :func:`duck_adaptive_neg_buckets_sql`."""
    buckets = min_buckets
    while buckets < max_buckets and n_rows > target_bucket * buckets:
        buckets <<= 1
    return buckets


def duck_adaptive_neg_buckets_sql(
    table: str,
    target_bucket: int = NEG_TARGET_BUCKET,
    min_buckets: int = NEG_MIN_BUCKETS,
    max_buckets: int = NEG_MAX_BUCKETS,
) -> str:
    """DuckDB scalar-subquery mirror of :func:`adaptive_neg_buckets` over
    ``COUNT(*) FROM table`` (the same count the Spark side takes): each
    doubling step contributes a CASE'd factor of 2, multiplied together."""
    doublings = []
    b = min_buckets
    while b < max_buckets:
        doublings.append(
            f"(CASE WHEN COUNT(*) > {target_bucket * b} THEN 2 ELSE 1 END)"
        )
        b <<= 1
    prod = " * ".join(doublings) if doublings else "1"
    return f"(SELECT {min_buckets} * {prod} FROM {table})"


def bm25_topk(
    df: DataFrame,
    query_terms: tuple[str, ...],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 score for a bag-of-terms query.

    ``score(d) = Σ_t idf(t) · tf/(tf + k1·(1 − b + b·dl/avgdl))`` with
    ``idf = ln(1 + (N − df + 0.5)/(df + 0.5))``.

    Scale shape: the token explosion is filtered to the query's terms
    before the (doc, term) aggregate, so the shuffle carries only postings
    matching the query — the corpus-sized stream never shuffles; per-term
    document frequencies and the corpus aggregates (N, avgdl) are tiny and
    reach the scorer via broadcast joins; ranking is a top-k, not a sort.
    Scores are ranked on their ROUNDED value (6 dp, epsilon-shifted) with
    an id tiebreak, so ordering is reproducible across engines.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    bad = [t for t in query_terms if not t or "'" in t or "\\" in t]
    if bad:
        raise ValueError(
            f"query terms must be non-empty, quote- and backslash-free: {bad}"
        )
    # documents are tokenized lowercase — match the query to the index
    query_terms = tuple(t.lower() for t in query_terms)
    terms_list = ", ".join(f"'{t}'" for t in query_terms)
    base = df.select(
        F.col(id_col).alias("doc"),
        tokens_expr(text_col).alias("__t"),
    ).select("doc", "__t", F.size("__t").cast("long").alias("dl"))

    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )

    tf = (
        base.select("doc", "dl", F.explode("__t").alias("term"))
        .filter(F.expr(f"term IN ({terms_list})"))
        .groupBy("doc", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf", F.expr("ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))")
        )
        .withColumn(
            "part",
            F.expr(
                f"idf * tf / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))"
            ),
        )
        .groupBy("doc")
        # 4 dp, not 6: the per-term part contains ln and a division by the
        # accumulation-order-dependent avgdl; coarser rounding keeps a
        # 1-ulp cross-engine drift from flipping the ranked hash (same
        # hazard class the 6-dp PMI prototype hit — see bigram_pmi)
        .agg(F.expr("round(sum(part) + 1e-9, 4)").alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc").asc())
        .limit(k)
        .select(F.col("doc").alias(id_col), "score")
    )


def negative_pairs(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 4,
    n_buckets: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic pseudo-random negative sampling for contrastive
    training: pair each query document with ``k`` negatives drawn from the
    corpus — WITHOUT a cross join, without ``rand()`` (irreproducible
    across retries), and without a global index (a row_number over the
    corpus would serialize into one reducer).

    Scheme: corpus docs land in ``n_buckets`` md5 buckets; slot ``i`` of
    query ``q`` hashes to one bucket and picks the member minimizing a
    per-(q, i, candidate) hash.  Everything is the 60-bit md5 bridge
    (functions/texthash.py:hex64_sql) that DuckDB replicates exactly, so
    the oracle states the identical arithmetic.  Sampling is
    with-replacement across slots (two slots of one query can draw the
    same doc — at corpus scale, vanishingly rare); the query's own doc is
    excluded before ranking, so a slot whose bucket holds only the query
    doc itself yields nothing rather than a self-pair.

    Cost: one equi-join producing |queries| × k × (|corpus|/n_buckets)
    candidate rows and one (q, slot)-partitioned window over them —
    ``n_buckets=None`` (the default) derives the count from one cheap
    ``corpus.count()`` via :func:`adaptive_neg_buckets`, holding candidate
    volume at O(|queries| × k × const) on a 100 TB corpus with no manual
    knob (SCALE.md measured the fixed-32 default at 105.8 s vs 8.7 s
    properly sized on the 10× corpus).
    """
    from polars_view_spark.functions.texthash import hex64_sql

    if n_buckets is None:
        n_buckets = adaptive_neg_buckets(corpus.count())
    if k <= 0 or n_buckets <= 0:
        raise ValueError(f"k and n_buckets must be positive, got {k}, {n_buckets}")
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("neg_id"),
        F.expr(
            f"{hex64_sql(f'CAST({id_col} AS STRING)')} % {n_buckets}"
        ).alias("bucket"),
    )
    qi = queries.select(F.col(id_col).alias("qid")).withColumn(
        "neg_slot", F.explode(F.expr(f"sequence(0L, {k - 1}L)"))
    )
    slot_key = "concat(CAST(qid AS STRING), ':', CAST(neg_slot AS STRING))"
    qi = qi.withColumn(
        "bucket", F.expr(f"{hex64_sql(slot_key)} % {n_buckets}")
    )
    cand = (
        qi.join(c, "bucket")
        .filter(F.col("neg_id") != F.col("qid"))
        .withColumn(
            "h",
            F.expr(
                hex64_sql(
                    "concat(CAST(qid AS STRING), ':', CAST(neg_slot AS STRING),"
                    " ':', CAST(neg_id AS STRING))"
                )
            ),
        )
    )
    w = Window.partitionBy("qid", "neg_slot").orderBy("h", "neg_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("qid", "neg_slot", "neg_id")
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` most characteristic terms per group by TF-IDF:
    ``score(g, t) = tf(g, t) · ln(N / df(t))`` where ``tf`` counts the
    term's occurrences inside the group, ``df`` counts distinct documents
    containing it corpus-wide, and ``N`` is the corpus document count.

    Scale shape: ONE tokenize+explode pass reduces to a per-(doc, term)
    count, which is pinned (localCheckpoint) because two aggregates
    consume it — the (group, term) frequency and the per-term document
    frequency; left lazy, Catalyst would re-run the corpus explode per
    consumer.  The pinned frame is bounded by distinct (doc, term) pairs,
    far smaller than the raw token stream.  ``df`` and the 1-row ``N``
    reach the scorer via broadcast; ranking is a bounded per-group window
    (row_number ≤ k), not a global sort.  Like bm25_topk, ranking happens
    on the ROUNDED score with a term tiebreak so ordering is reproducible
    across engines — at 4 dp, not 6: the score contains an ``ln``, and
    Java's ``Math.log`` is permitted 1-ulp error vs libm's, which can
    flip a fine-grained rounding at boundary values and cascade into a
    different top-k row set (observed with the 6-dp PMI prototype —
    see bigram_pmi, which went fully ln-free instead).
    """
    from pyspark.sql import Window

    words = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(id_col).alias("doc"),
            F.explode(tokens_expr(text_col)).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    # grp rides along for free: doc → grp is functional, so grouping by it
    # does not change cardinality
    per_doc = (
        words.groupBy("doc", "grp", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    n_docs = df.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    tf = per_doc.groupBy("grp", "term").agg(F.sum("c").cast("long").alias("tf"))
    # per_doc is unique per (doc, term), so df(t) is a plain row count
    dfreq = per_doc.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score", F.expr("round(tf * ln(n_docs * 1.0 / df) + 1e-9, 4)")
        )
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("grp").alias(group_col),
            F.col("rank").cast("int").alias("rank"),
            "term",
            "score",
        )
        .orderBy(group_col, "rank")
    )


def two_tower_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "doc_id",
    corpus_id: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Two-tower retrieval: encode queries and documents INDEPENDENTLY
    into one vector space, score by cosine, return per-query top-k —
    the production dense-retrieval shape (dual encoder; e.g. DPR,
    arXiv:2004.04906).  Argument order is (queries, corpus), matching
    :func:`negative_pairs` in this module.  Each tower here is the
    deterministic
    feature-hashing encoder (textstats.py:hashed_doc_vectors) standing
    in for a learned model: the Spark-side plumbing — offline corpus
    tower, small online query tower, bounded query broadcast, cosine
    scoring, per-query top-k window — is exactly what a learned
    encoder deploys into; swap ``hashed_doc_vectors`` for an embedding
    UDF and nothing else changes.

    Scale shape: the corpus tower is one explode + one keyed shuffle
    (computed offline and persisted in production — the
    ``ivf_build_index`` build/query split applies verbatim when the
    corpus side also gets an ANN index); the query side is bounded and
    broadcast, so scoring is a single corpus scan with no corpus
    shuffle.  This brute-force scorer is the exact baseline; at corpus
    scale the candidate step swaps in sign-LSH bucketing
    (similarity.py:lsh_topk) or the persisted IVF probe
    (ivf_query_index) with this same scoring tail.

    Cross-engine parity: integer ±1 hashed vectors make the dot product
    exact; ``dot / sqrt(qn2 · dn2)`` is a fixed 4-node float tree
    (IEEE-exact per node), ranked on the 6-dp rounded score with a doc
    tiebreak.  Zero-norm vectors (a doc whose bucket sums all cancel)
    are dropped on BOTH sides before scoring.
    """
    from pyspark.sql import Window

    from polars_view_spark.operators.textstats import (
        HASH_VECTOR_DIM,
        hashed_doc_vectors,
    )

    d = (
        hashed_doc_vectors(corpus, corpus_id, text_col)
        .filter(F.col("norm2") > 0)
        .select(
            F.col("doc").alias("neighbor_id"),
            F.col("vec").alias("dvec"),
            F.col("norm2").alias("dn2"),
        )
    )
    q = (
        hashed_doc_vectors(queries, query_id, text_col)
        .filter(F.col("norm2") > 0)
        .select(
            F.col("doc").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("norm2").alias("qn2"),
        )
    )
    dot = " + ".join(
        f"qvec[{i}] * dvec[{i}]" for i in range(HASH_VECTOR_DIM)
    )
    scored = d.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.round(
            F.expr(
                f"CAST(({dot}) AS DOUBLE)"
                " / sqrt(CAST(qn2 AS DOUBLE) * CAST(dn2 AS DOUBLE))"
            ),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


#: Reciprocal-rank-fusion damping constant (Cormack, Clarke & Büttcher,
#: SIGIR 2009): contribution of a rank-r hit is 1/(RRF_K + r).  60 is the
#: paper's value and the de-facto default in production hybrid search.
RRF_K = 60


def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    n_queries: int,
    k: int = 5,
    n_candidates: int = 50,
    rrf_k: int = RRF_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid retrieval: fuse a LEXICAL ranking (shared distinct tokens,
    inverted-index style) with a DENSE ranking (exact cosine) by
    reciprocal-rank fusion — ``score(d) = Σ_m 1/(rrf_k + rank_m(d))`` over
    the modalities whose top-``n_candidates`` list contains ``d``.

    Queries are the documents with ``id < n_queries`` (their embeddings
    join on the same id).  Output: one row per (query, fused-top-k doc)
    with both modality ranks (NULL where a modality missed the doc).

    Scale shape: standard production RRF fuses the bounded top-N lists of
    each retriever, never full-corpus ranks — the fusion join touches
    ``n_queries × n_candidates`` rows per side regardless of corpus size.
    The lexical leg shuffles only postings whose term appears in some
    query (the bm25_topk inverted-index discipline: filter BEFORE the
    (query, doc) aggregate via a broadcast of the exploded query tokens);
    the dense leg here is the exact brute-force baseline — at scale, swap
    in ivf_topk/lsh_topk, which return the same (query_id, neighbor_id,
    rank) contract.  Ranks tie-break on rounded score then id, so fusion
    input — and therefore output — is engine-reproducible.
    """
    from pyspark.sql import Window

    from polars_view_spark.operators.similarity import brute_force_topk

    toks = F.array_distinct(tokens_expr(text_col)).alias("toks")
    tok = docs.select(F.col(id_col).alias("doc"), toks)
    qtok = tok.filter(F.col("doc") < n_queries).select(
        F.col("doc").alias("query_id"), F.explode("toks").alias("term")
    )
    ctok = tok.select("doc", F.explode("toks").alias("term"))
    lex = (
        ctok.join(F.broadcast(qtok), "term")
        .filter(F.col("doc") != F.col("query_id"))
        .groupBy("query_id", "doc")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    wl = Window.partitionBy("query_id").orderBy(
        F.col("shared").desc(), F.col("doc").asc()
    )
    lexr = (
        lex.withColumn("lex_rank", F.row_number().over(wl))
        .filter(F.col("lex_rank") <= n_candidates)
        .select("query_id", "doc", "lex_rank")
    )

    denr = brute_force_topk(
        embeddings,
        embeddings.filter(F.col(vec_id_col) < n_queries),
        id_col=vec_id_col,
        vec_col=vec_col,
        k=n_candidates,
    ).select(
        "query_id", F.col("neighbor_id").alias("doc"),
        F.col("rank").alias("dense_rank"),
    )

    fused = (
        lexr.join(denr, ["query_id", "doc"], "full_outer")
        .withColumn(
            "rrf_score",
            F.round(
                F.coalesce(
                    F.lit(1.0) / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(rrf_k) + F.col("dense_rank")),
                    F.lit(0.0),
                ),
                6,
            ),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("doc").alias("doc_id"),
            "rrf_score",
            F.col("lex_rank").cast("int").alias("lex_rank"),
            F.col("dense_rank").cast("int").alias("dense_rank"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def retrieval_eval(
    results: DataFrame,
    truth: DataFrame,
    k: int = 20,
    hit_k: int = 5,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
    rank_col: str = "rank",
    truth_col: str = "truth_id",
) -> DataFrame:
    """Rank-based retrieval evaluation against a one-relevant-doc truth
    set — the recall@k / MRR harness every retriever change is judged by
    before it ships.  Works over ANY ranked result frame from this module
    (two_tower_topk, bm25_topk, hybrid_rrf_topk, ivf_rerank_topk …).

    Per query: ``truth_rank`` (position of the relevant doc in the top-k,
    0 = missed — also the row for queries the retriever dropped entirely,
    e.g. zero-norm), ``hit_at_{hit_k}`` (0/1), and ``rr_ppm`` = floor(10⁶
    / truth_rank) — MRR numerators as exact integers, so the frame (and
    the aggregate a caller takes over it) is engine-parity-exact with no
    float accumulation.

    Scale shape: one equi-join of the bounded result set against the
    bounded truth set (both O(queries·k), corpus-independent), then a
    projection.  The expensive part — retrieval — happened upstream;
    evaluation never touches the corpus.
    """
    hits = (
        results.join(truth, query_col)
        .filter(F.col(neighbor_col) == F.col(truth_col))
        .select(query_col, F.col(rank_col).alias("__r"))
    )
    return (
        truth.join(hits, query_col, "left")
        .select(
            query_col,
            F.expr(f"COALESCE(CASE WHEN __r <= {k} THEN __r END, 0)")
            .cast("long")
            .alias("truth_rank"),
        )
        .select(
            query_col,
            "truth_rank",
            F.expr(
                f"CASE WHEN truth_rank BETWEEN 1 AND {hit_k} THEN 1 ELSE 0 END"
            )
            .cast("int")
            .alias(f"hit_at_{hit_k}"),
            F.expr(
                "CASE WHEN truth_rank > 0 THEN 1000000 div truth_rank ELSE 0 END"
            )
            .cast("long")
            .alias("rr_ppm"),
        )
    )
