"""Distributed byte-pair-encoding (BPE) subword training + application.

Public algorithm (Sennrich et al., "Neural Machine Translation of Rare
Words with Subword Units", arXiv:1508.07909): iteratively merge the most
frequent adjacent symbol pair.  The Spark-first insight is that training
never touches the corpus after ONE aggregation — the classic algorithm
operates on the **word-frequency table** (distinct words × counts), which
is bounded by the vocabulary, not the corpus size.  At 100 TB the corpus
pass is a single explode→groupBy count; every merge round is then a
pair-explode + argmax over the (small) vocab table plus a one-pass
array-fold rewrite, all JVM-side.

Per round the driver receives exactly ONE row (the winning pair) — the
same O(1)-driver loop shape as ``dedup.dedup_clusters``; the vocab frame is
``localCheckpoint``ed per round so lineage stays flat across rounds.

Application (``apply_bpe``) joins tokens against the trained segmentation
table (broadcast — it's the vocabulary) and falls back to character
segmentation for out-of-vocabulary words; ``bpe_token_count`` turns that
into the per-document token count that a real pipeline budget uses
(upgrading textstats.token_count's regex approximation to a learned
model).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_view_spark.functions.texthash import tokens_sql

END_OF_WORD = "▁"  # sentinel glued to the final symbol of each word


def _char_syms_sql(word_col: str) -> str:
    """Initial segmentation: one symbol per character, end-of-word sentinel
    appended to the last (so merges can distinguish suffixes)."""
    n = f"length({word_col})"
    return (
        f"transform(sequence(1, {n}), i -> CASE WHEN i = {n} "
        f"THEN concat(substring({word_col}, i, 1), '{END_OF_WORD}') "
        f"ELSE substring({word_col}, i, 1) END)"
    )


def _merge_pair_sql(syms_col: str, a: str, b: str) -> str:
    """One left-to-right pass merging every adjacent (a, b) into ab —
    a single JVM array fold, no Python.

    The accumulator carries (rewritten-prefix, skip-next flag); greedy
    leftmost matching reproduces the reference implementation's behavior
    on overlaps (e.g. merging ('a','a') in 'a a a' yields ['aa','a']).
    """
    def q(s: str) -> str:
        # Spark SQL string literals are backslash-escaped (Hive-style)
        return s.replace("\\", "\\\\").replace("'", "\\'")

    qa, qb = q(a), q(b)
    n = f"size({syms_col})"
    return (
        f"aggregate(sequence(1, {n}), "
        f"named_struct('out', CAST(array() AS ARRAY<STRING>), 'skip', false), "
        f"(acc, i) -> CASE "
        f"WHEN acc.skip THEN named_struct('out', acc.out, 'skip', false) "
        f"WHEN i < {n} AND {syms_col}[i - 1] = '{qa}' AND {syms_col}[i] = '{qb}' "
        f"THEN named_struct('out', array_append(acc.out, '{qa}{qb}'), 'skip', true) "
        f"ELSE named_struct('out', array_append(acc.out, {syms_col}[i - 1]), 'skip', false) "
        f"END, acc -> acc.out)"
    )


def word_freq_table(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus-wide pass: ``(word, freq)`` with initial character
    segmentation.  Everything after this is vocabulary-bounded."""
    return (
        corpus.select(F.explode(F.expr(tokens_sql(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .withColumn("syms", F.expr(_char_syms_sql("word")))
    )


def train_bpe_merges(
    corpus: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_freq: int = 2,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges; returns ``(merges, vocab)``
    where ``vocab`` is the final ``(word, freq, syms)`` segmentation table.

    Deterministic: ties on pair frequency break lexicographically on the
    pair, so two engines (or two runs) learn the identical merge sequence.
    Stops early when the best remaining pair falls under ``min_freq``.
    """
    vocab = word_freq_table(corpus, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            vocab.select(
                F.col("freq"),
                F.explode(
                    F.expr(
                        "CASE WHEN size(syms) >= 2 THEN "
                        "transform(sequence(0, size(syms) - 2), "
                        "i -> struct(syms[i] AS a, syms[i + 1] AS b)) "
                        "ELSE CAST(array() AS ARRAY<STRUCT<a: STRING, b: STRING>>) END"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_freq:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        vocab = vocab.withColumn(
            "syms", F.expr(_merge_pair_sql("syms", a, b))
        ).localCheckpoint(eager=True)
    return merges, vocab


def apply_bpe(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Segment every document with a trained vocabulary: explode words,
    broadcast-join the segmentation table, char-split fallback for
    out-of-vocabulary words (standard inference behavior), regroup to
    ``(id_col, bpe_tokens array<string>)`` in original word order."""
    words = (
        df.select(
            F.col(id_col),
            F.posexplode(F.expr(tokens_sql(text_col))).alias("pos", "word"),
        )
        .filter(F.col("word") != "")
    )
    seg = words.join(
        F.broadcast(vocab.select("word", "syms")), "word", "left"
    ).withColumn("syms", F.coalesce("syms", F.expr(_char_syms_sql("word"))))
    return (
        seg.groupBy(id_col)
        .agg(
            F.flatten(
                F.expr("transform(array_sort(collect_list(struct(pos, syms))), s -> s.syms)")
            ).alias("bpe_tokens")
        )
    )


def bpe_token_count(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document token count under the LEARNED segmentation — the number
    a training-data budget actually meters (vs textstats.token_count's
    regex estimate).  Docs with no words count 0."""
    counted = apply_bpe(df, vocab, id_col, text_col).select(
        id_col, F.size("bpe_tokens").cast("long").alias("n_bpe_tokens")
    )
    return (
        df.select(id_col)
        .join(counted, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bpe_tokens", F.lit(0)).cast("long").alias("n_bpe_tokens"),
        )
    )
