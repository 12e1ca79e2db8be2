"""Co-occurrence mining — frequent itemset pairs over basket data.

The a-priori 2-itemset pass (Agrawal & Srikant 1994, VLDB): which items
appear TOGETHER in at least ``min_support`` baskets.  In a training-data
pipeline the same shape answers "which domains co-cite", "which tags
co-occur on a document", "which tools appear in the same trajectory" —
a pair-counting primitive one abstraction up from bigram_pmi's
adjacent-token collocations (textstats.py), which counts ADJACENCY
inside a sequence, not co-membership in a set.

Spark-first scale shape (the reason this is not a crossJoin):

- **A-priori prune first**: a pair can only reach ``min_support`` if
  BOTH items individually do, so items are support-filtered BEFORE any
  pair is generated — the candidate space collapses from |items|² to
  |frequent items|², the classic pruning that makes basket mining
  feasible at all.
- **Pairs are generated per basket via a self-equi-join on the basket
  key** with ``item_a < item_b`` — ONE keyed shuffle, co-partitioned on
  both sides, and the per-basket fan-out is bounded by basket size
  (choose(k,2); TPC-H orders hold ≤7 lineitems).  A skewed mega-basket
  is the one hazard at 100 TB: cap it upstream (domain_cap style) or
  salt it — the join itself never materializes cross-basket pairs.
- Pair counting is a map-side-combinable groupBy — the second and last
  shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Pairs of items co-occurring in >= ``min_support`` distinct baskets.

    Returns ``(item_a, item_b, n_baskets)`` with ``item_a < item_b``;
    membership is set-semantics (duplicate (basket, item) rows collapse
    before counting, so a basket contributes each pair once).
    """
    assert min_support >= 1
    items = df.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    # a-priori item prune: per-item basket counts (items is already
    # distinct per (b, i), so count(*) IS the basket count)
    frequent = (
        items.groupBy("i")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_support)
        .select("i")
    )
    fi = items.join(frequent, "i").select("b", "i")
    a, b = fi.alias("a"), fi.alias("b")
    return (
        # MERGE hint, same rationale as dedup.minhash_lsh_pairs: left to
        # its estimates the planner broadcasts one side of this self-join,
        # and a BroadcastExchange cannot reuse the probe side's shuffle —
        # the whole distinct+prune pipeline would compute TWICE.  As
        # sort-merge, both sides are the same canonical subtree shuffled
        # by the basket key and AQE reuses one exchange (and at real scale
        # a corpus-wide item table could never broadcast anyway).
        a.join(
            b.hint("merge"),
            (F.col("a.b") == F.col("b.b")) & (F.col("a.i") < F.col("b.i")),
        )
        .groupBy(
            F.col("a.i").alias("item_a"), F.col("b.i").alias("item_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
        .filter(F.col("n_baskets") >= min_support)
    )
