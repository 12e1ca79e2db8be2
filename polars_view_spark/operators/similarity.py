"""Similarity search over an embedding column (``array<float>``).

Two paths:

- ``brute_force_topk``: exact cosine top-k for a set of query vectors —
  the correctness baseline.  The query set is broadcast (it's small by
  definition); each partition of the corpus scores its rows against every
  query and a windowed rank keeps k — the shuffle carries only
  ``n_queries × k`` candidates per partition thanks to rank pushdown
  semantics of TakeOrdered-style plans.
- ``lsh_topk``: the scale path — corpus and queries are bucketed by an
  integer-quantized sign-LSH (functions/vectors.py), the join happens
  per-bucket, and exact cosine ranks within the bucket.  At 100 TB the
  bucket join replaces the full cross product with ~1/2^bits of it per
  query; recall is tested against the brute-force baseline.

All math is JVM-side ``zip_with``/``aggregate`` folds — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_view_spark.functions.vectors import cosine_sql, lsh_bucket_sql


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    """Rank per query by rounded score desc then id — the rounding makes
    the cut deterministic across engines/accumulation orders."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: ``(query_id, neighbor_id, score, rank)``.

    ``queries`` is broadcast; self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(F.expr(cosine_sql("qvec", "cvec")), 6))
        .drop("qvec", "cvec")
    )
    return _ranked_topk(scored, k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_bits: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k via sign-LSH bucketing.

    Both sides get an integer-quantized hyperplane bucket; candidates are
    corpus rows in the SAME bucket as the query (single equi-join — at scale
    this is a hash join on the bucket id instead of a cross product).
    """
    bucket = lsh_bucket_sql(vec_col, n_bits, dim)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.expr(bucket).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.expr(bucket).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(F.expr(cosine_sql("qvec", "cvec")), 6))
        .drop("qvec", "cvec", "bucket")
    )
    return _ranked_topk(scored, k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 2,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means-partition the corpus,
    search only the ``n_probe`` nearest cells per query.

    The classic ANN scale path: the corpus is clustered ONCE (training
    samples a fraction; assignment is one map pass), stored
    partitioned-by-cell, and every query touches n_probe/n_clusters of the
    data.  Uses pyspark.ml KMeans — results depend on the trained centroids,
    so this operator is validated by recall-vs-brute-force tests rather than
    a cross-engine oracle.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    corpus_v = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    model = KMeans(k=n_clusters, seed=seed, featuresCol="features", predictionCol="cell").fit(
        corpus_v.select("features")
    )
    assigned = model.transform(corpus_v).select("neighbor_id", "cvec", "cell")

    # per-query n_probe nearest centroids (centroids are tiny — broadcast math)
    centers = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    spark = corpus.sparkSession
    centers_df = spark.createDataFrame(centers, "cell int, center array<double>")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    q_cells = (
        q.crossJoin(F.broadcast(centers_df))
        .withColumn("dist", F.expr(
            "aggregate(zip_with(qvec, center, (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
            "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        ))
        .withColumn(
            "cell_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("cell").asc())
            ),
        )
        .filter(F.col("cell_rank") <= n_probe)
        .select("query_id", "qvec", "cell")
    )
    scored = (
        assigned.join(F.broadcast(q_cells), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(F.expr(cosine_sql("qvec", "cvec")), 6))
        .drop("qvec", "cvec", "cell")
    )
    return _ranked_topk(scored, k)


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_bits: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold) within LSH buckets.

    Self-join on the bucket id with ``id1 < id2`` — the embedding-space
    analogue of MinHash dedup.  Bucketing trades recall (sign-LSH may split
    a true pair) for a join that scales; recall is pinned in tests.
    """
    bucket = lsh_bucket_sql(vec_col, n_bits, dim)
    keyed = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), F.expr(bucket).alias("bucket")
    )
    a = keyed.select(
        F.col("id").alias("id1"), F.col("v").alias("v1"), F.col("bucket")
    )
    b = keyed.select(
        F.col("id").alias("id2"), F.col("v").alias("v2"), F.col("bucket")
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("cosine", F.round(F.expr(cosine_sql("v1", "v2")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )
