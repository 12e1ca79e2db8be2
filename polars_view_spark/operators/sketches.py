"""Mergeable-sketch rollups: incremental distinct counts and quantiles.

The 100 TB pattern these enable: sketch each partition/day/shard ONCE,
persist the (few-KB, binary) sketches, and answer any later rollup by
MERGING sketches instead of rescanning data.  A daily pipeline maintains
per-day HLL sketches; "distinct users last quarter" is a union over ~90
sketch rows, not a shuffle over a quarter of raw events.  Merging is
associative and order-independent, so the same sketches roll up along any
dimension — and merging partials is *bit-identical* to sketching the whole
input at the same lg_k (asserted in tests), so incremental maintenance
loses nothing vs a full recompute.

Built on Spark 4's Apache DataSketches bindings (``hll_sketch_agg`` /
``hll_union_agg`` / ``kll_sketch_agg_*``) — pure JVM aggregates with
map-side partials, no Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: HLL precision: 2^12 registers ≈ 1.6% standard error, 4 KB per sketch
HLL_LG_K = 12


def hll_partial_sketches(
    df: DataFrame,
    keys: list[str],
    slice_col: str,
    value_col: str,
    lg_k: int = HLL_LG_K,
) -> DataFrame:
    """Per-(keys, slice) HLL sketches of ``value_col`` — the persistable
    partial.  One partial-aggregated shuffle; each output row carries a
    binary sketch mergeable into ANY later rollup."""
    return df.groupBy(*keys, slice_col).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll_sketch")
    )


def hll_merge_estimate(sketches: DataFrame, keys: list[str]) -> DataFrame:
    """Roll partial sketches up to ``keys``: union + estimate.  The input
    can be any subset/union of slices — sketches from different days,
    shards, or pipeline runs merge freely (same lg_k)."""
    return sketches.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll_sketch")).alias("est_distinct")
    )


def kll_partial_sketches(
    df: DataFrame,
    keys: list[str],
    slice_col: str,
    value_col: str,
) -> DataFrame:
    """Per-(keys, slice) KLL quantile sketches of a DOUBLE ``value_col`` —
    the persistable partial for incremental percentile maintenance."""
    return df.groupBy(*keys, slice_col).agg(
        F.kll_sketch_agg_double(value_col).alias("kll_sketch")
    )


def kll_merge_quantiles(
    sketches: DataFrame, keys: list[str], quantiles: tuple[float, ...] = (0.5, 0.95)
) -> DataFrame:
    """Roll partial KLL sketches up to ``keys`` and read off quantile
    estimates (rank error ≤ ~1.7% at the default k).

    ``kll_sketch_merge_double`` is a binary scalar (no union aggregate in
    Spark 4.1), so the group's sketches are collected into an array and
    left-folded with the higher-order ``aggregate`` — fine at scale: the
    array holds one few-KB sketch per SLICE (days, shards), not per row.
    """
    merged = sketches.groupBy(*keys).agg(
        F.expr(
            "aggregate(slice(collect_list(kll_sketch), 2, size(collect_list(kll_sketch)) - 1), "
            "collect_list(kll_sketch)[0], (acc, x) -> kll_sketch_merge_double(acc, x))"
        ).alias("m")
    )
    return merged.select(
        *keys,
        *[
            F.kll_sketch_get_quantile_double("m", F.lit(q)).alias(
                f"q{str(q).replace('0.', '')}"
            )
            for q in quantiles
        ],
    )


def topk_partial_states(
    df: DataFrame,
    slice_col: str,
    item_col: str,
    max_tracked: int = 10_000,
) -> DataFrame:
    """Per-slice mergeable heavy-hitter states (DataSketches frequent
    items via ``approx_top_k_accumulate``) — the persistable partial for
    incremental top-k maintenance.  Estimates are exact while a slice's
    distinct-item count stays ≤ ``max_tracked``; beyond that the sketch
    degrades gracefully with a documented error bound.  The output bound
    ``k`` is applied at merge time (:func:`topk_merge`) — states carry the
    full tracked set so one persisted partial serves any ``k``."""
    return df.groupBy(slice_col).agg(
        F.expr(f"approx_top_k_accumulate({item_col}, {max_tracked})").alias(
            "topk_state"
        )
    )


def topk_merge(states: DataFrame, k: int) -> DataFrame:
    """Combine per-slice states and emit the global top-``k`` as
    ``(item, est_count)`` rows — any subset of slices merges freely."""
    merged = states.agg(
        F.expr(f"approx_top_k_estimate(approx_top_k_combine(topk_state), {k})").alias(
            "top"
        )
    )
    return merged.select(F.explode("top").alias("e")).select(
        F.col("e.item").alias("item"), F.col("e.count").cast("long").alias("est_count")
    )


def theta_partial_sketches(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Per-key Theta sketches of ``value_col`` — unlike HLL, Theta
    sketches support full set algebra (union / intersection / difference),
    so persisted per-segment sketches answer audience-overlap questions
    without joining raw data."""
    return df.groupBy(*keys).agg(
        F.expr(f"theta_sketch_agg({value_col})").alias("theta_sketch")
    )


def theta_set_estimates(sketch_a, sketch_b) -> dict[str, str]:
    """SQL expression strings estimating |A∪B|, |A∩B|, |A\\B| from two
    sketch columns — compose into any select."""
    return {
        "union": f"theta_sketch_estimate(theta_union({sketch_a}, {sketch_b}))",
        "intersection": (
            f"theta_sketch_estimate(theta_intersection({sketch_a}, {sketch_b}))"
        ),
        "difference": (
            f"theta_sketch_estimate(theta_difference({sketch_a}, {sketch_b}))"
        ),
    }


def snapshot_drift(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Distribution drift between two corpus snapshots, one aggregate pass
    per side: row count, distinct ``key_col``, and the ``value_col``
    median, each as (old, new, relative change) — the data-quality gate a
    daily 100 TB pipeline runs before promoting a snapshot.

    Exact metrics carry the comparison (cross-engine reproducible);
    alongside each, the sketch estimate (HLL distinct, KLL median) is
    checked against its exact twin and reported as a self-asserting
    within-bound boolean — because at real scale the EXACT pass is the
    one you drop first, and the boolean is the evidence the sketch-only
    mode tracks it.  Both profiles are single partial-aggregated jobs;
    the result is one row per metric.
    """

    def profile(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("double").alias(f"{tag}_rows"),
            F.countDistinct(key_col).cast("double").alias(f"{tag}_distinct"),
            F.expr(f"percentile({value_col}, 0.5D)").alias(f"{tag}_median"),
            F.hll_sketch_estimate(F.hll_sketch_agg(key_col, F.lit(12)))
            .cast("double")
            .alias(f"{tag}_hll"),
            F.expr(
                f"kll_sketch_get_quantile_double("
                f"kll_sketch_agg_double(CAST({value_col} AS DOUBLE)), 0.5D)"
            ).alias(f"{tag}_kll"),
        )

    wide = profile(old, "o").crossJoin(profile(new, "n"))

    def metric(name: str, o: str, n: str, sk_o: str, sk_n: str, tol: float):
        return (
            F.lit(name).alias("metric"),
            F.round(F.col(o), 4).alias("old_exact"),
            F.round(F.col(n), 4).alias("new_exact"),
            F.round((F.col(n) - F.col(o)) / F.col(o), 6).alias("rel_change"),
            (
                (F.abs(F.col(sk_o) - F.col(o)) <= F.abs(F.col(o)) * tol)
                & (F.abs(F.col(sk_n) - F.col(n)) <= F.abs(F.col(n)) * tol)
            ).alias("sketch_ok"),
        )

    rows = wide.select(
        F.array(
            F.struct(*metric("rows", "o_rows", "n_rows", "o_rows", "n_rows", 0.0)),
            F.struct(
                *metric("distinct_keys", "o_distinct", "n_distinct", "o_hll", "n_hll", 0.05)
            ),
            F.struct(
                *metric("value_median", "o_median", "n_median", "o_kll", "n_kll", 0.05)
            ),
        ).alias("ms")
    )
    return rows.select(F.explode("ms").alias("m")).select("m.*")


#: Count-Min geometry: 4 independent hash rows x 256 buckets = 1024 int64
#: counters per sketch — ~8 KB however large the corpus.  Hash rows reuse
#: the MinHash (a, b) pairs (first CM_DEPTH of texthash.MINHASH_COEFFS) over
#: the 31-bit-reduced hex64 token hash, so the bucket function is exact
#: integer arithmetic with a byte-identical DuckDB mirror.
CM_DEPTH = 4
CM_WIDTH = 256


def countmin_sketch(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Mergeable Count-Min frequency sketch over word tokens (Cormode &
    Muthukrishnan 2005): ``(j, bucket, c)`` counters, ``c`` = number of
    token occurrences hashing to ``bucket`` under hash row ``j``.

    The point estimate for a token is ``min_j c[j][bucket_j(token)]`` —
    never an underestimate (every counter the token touches includes all
    its occurrences plus collisions), which :func:`countmin_estimates`
    exposes as a self-asserting ``no_underestimate`` column.

    Scale shape: explode → ONE (j, bucket) aggregate with map-side
    partial combine, so each task contributes a local 1024-cell sketch
    and the shuffle carries only those partials — the textbook mergeable
    sketch.  The result is O(CM_DEPTH·CM_WIDTH) rows however large the
    corpus; at 100 TB the sketch broadcasts for estimation joins while
    exact token counts would not.
    """
    from polars_view_spark.functions.texthash import (
        MINHASH_COEFFS,
        MINHASH_PRIME,
        hex64_sql,
        tokens_expr,
    )

    toks = df.select(F.explode(tokens_expr(text_col)).alias("token"))
    h = f"({hex64_sql('token')} % {MINHASH_PRIME})"
    cells = ", ".join(
        f"named_struct('j', {j}, 'bucket', "
        f"(({a} * {h} + {b}) % {MINHASH_PRIME}) % {CM_WIDTH})"
        for j, (a, b) in enumerate(MINHASH_COEFFS[:CM_DEPTH])
    )
    return (
        toks.select(F.expr(f"explode(array({cells}))").alias("cell"))
        .select("cell.j", "cell.bucket")
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def countmin_estimates(
    sketch: DataFrame, probes: DataFrame, token_col: str = "token"
) -> DataFrame:
    """Point-estimate each probe token against a Count-Min sketch:
    compute the CM_DEPTH bucket coordinates (pure codegen), join the
    (bounded, broadcastable) sketch, take ``min(c)``.  Adds ``cm_est``;
    probes keep their other columns.  The sketch side is O(1), so this
    is a broadcast join however large the corpus the sketch summarizes.
    """
    from polars_view_spark.functions.texthash import (
        MINHASH_COEFFS,
        MINHASH_PRIME,
        hex64_sql,
    )

    h = f"({hex64_sql(token_col)} % {MINHASH_PRIME})"
    cells = ", ".join(
        f"named_struct('j', {j}, 'bucket', "
        f"(({a} * {h} + {b}) % {MINHASH_PRIME}) % {CM_WIDTH})"
        for j, (a, b) in enumerate(MINHASH_COEFFS[:CM_DEPTH])
    )
    exploded = probes.select(
        "*", F.expr(f"explode(array({cells}))").alias("cell")
    ).select("*", "cell.j", "cell.bucket")
    joined = exploded.join(F.broadcast(sketch), ["j", "bucket"])
    others = [c for c in probes.columns]
    return joined.groupBy(*others).agg(F.min("c").alias("cm_est"))


#: Bloom geometry: 4 hash rows (the Count-Min coefficient pairs) setting
#: bits in a 4096-bit filter stored as 128 x 32-bit words in BIGINTs —
#: 32-bit words so every mask stays positive (a 64-bit word's top bit
#: would need the sign bit, where Spark's shiftleft wraps but DuckDB's
#: << range-checks; 32 bits sidesteps the divergence entirely).
BF_DEPTH = 4
BF_BITS = 4096
BF_WORD = 32


def _bloom_cells_sql(key_col: str, duck: bool = False) -> str:
    """The ``array(named_struct('word', …, 'mask', …))`` cell expression
    shared by build and probe — exact integer arithmetic with a
    byte-identical DuckDB mirror (the Count-Min discipline)."""
    from polars_view_spark.functions.texthash import (
        MINHASH_COEFFS,
        MINHASH_PRIME,
        duck_hex64_sql,
        hex64_sql,
    )

    h = f"({(duck_hex64_sql if duck else hex64_sql)(key_col)} % {MINHASH_PRIME})"
    mk = (
        (lambda w, m: f"{{'word': {w}, 'mask': {m}}}")
        if duck
        else (lambda w, m: f"named_struct('word', {w}, 'mask', {m})")
    )
    cells = []
    for a, b in MINHASH_COEFFS[:BF_DEPTH]:
        p = f"((({a} * {h} + {b}) % {MINHASH_PRIME}) % {BF_BITS})"
        cells.append(
            mk(
                f"CAST({p} // {BF_WORD} AS INT)"
                if duck
                else f"CAST({p} DIV {BF_WORD} AS INT)",
                f"CAST(1 AS BIGINT) << ({p} % {BF_WORD})"
                if duck
                else f"shiftleft(CAST(1 AS BIGINT), CAST({p} % {BF_WORD} AS INT))",
            )
        )
    inner = ", ".join(cells)
    return f"[{inner}]" if duck else f"array({inner})"


def bloom_build(df: DataFrame, key_col: str) -> DataFrame:
    """Mergeable Bloom membership sketch over a key column: ``(word,
    bits)`` rows, ``bits`` = OR of every key's masks in that 32-bit word.

    The approximate-membership twin of the Count-Min counter: "has this
    fingerprint/URL EVER been ingested" answered in O(BF_BITS) state with
    NO false negatives (guaranteed — a member's bits are all set) and a
    bounded false-positive rate (~(1-e^{-kn/m})^k).

    Scale shape: explode each key into BF_DEPTH (word, mask) cells → ONE
    map-side-combined ``bit_or`` aggregate over at most 128 groups — each
    task contributes a local filter and the shuffle carries only those
    partials; partial filters merge by OR exactly like Count-Min partials
    merge by sum (the streaming face reuses the idiom unchanged).  The
    result is <= 128 rows however large the corpus, so probes are always
    a broadcast join.
    """
    cells = _bloom_cells_sql(key_col)
    return (
        df.select(F.expr(f"explode({cells})").alias("cell"))
        .select("cell.word", "cell.mask")
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").cast("long").alias("bits"))
    )


def bloom_probe(
    sketch: DataFrame, probes: DataFrame, key_col: str
) -> DataFrame:
    """Probe keys against a Bloom sketch: ``maybe_member`` is true iff
    ALL BF_DEPTH of the key's bits are set.  The sketch side is <= 128
    rows → broadcast join; per-probe cost is pure codegen + the join."""
    cells = _bloom_cells_sql(key_col)
    exploded = probes.select(
        "*", F.expr(f"explode({cells})").alias("cell")
    ).select("*", "cell.word", "cell.mask")
    joined = exploded.join(F.broadcast(sketch), "word", "left")
    hit = (
        F.when(
            F.col("bits").isNotNull()
            & (F.expr("bits & mask") != 0),
            1,
        )
        .otherwise(0)
    )
    others = list(probes.columns)
    return (
        joined.groupBy(*others)
        .agg((F.sum(hit) == F.lit(BF_DEPTH)).alias("maybe_member"))
    )
