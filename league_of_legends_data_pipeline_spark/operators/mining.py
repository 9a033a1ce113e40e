"""Frequent-itemset / association-rule mining over basket-shaped data.

The classic market-basket pass a curation pipeline runs over co-occurrence
data (parts per order here; tags per document, domains per user session in
an LLM corpus). Beyond-reference surface: the reference has no mining
operators (its aggregation ceiling is the grouped counts in
CollectionTests/collection_test.py).

Scale design (the A-priori argument, not the A-priori algorithm):

- The ONLY quadratic step is the per-basket pair expansion, and it runs
  AFTER two prunes: infrequent items are dropped first (an item below
  min_item_support cannot participate in a frequent pair — downward
  closure), and oversized baskets are optionally capped
  (``max_basket_size``): a single 100k-item basket alone would emit 5e9
  pairs, so at 100 TB a cap (or per-basket item sampling) is mandatory.
- The frequent-item set is dimension-sized after pruning; Spark joins it
  to the basket table as a broadcast semi-join at test SF (AQE promotes
  to shuffle join if it ever outgrows the threshold — the right call).
- Pair counting shuffles (item, item) keys only; basket ids never ride
  the aggregation exchange.
- Rule metrics (support / confidence / lift) are exact integer-count
  ratios computed once per surviving pair; the basket universe size is a
  1-row broadcast, not a driver-collected constant baked into the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_item_support: int = 2,
    min_pair_support: int = 2,
    max_basket_size: int | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Frequent canonical item pairs (p1 < p2) with support/conf/lift.

    ``baskets`` is any (basket, item) relation; duplicates are collapsed
    (presence semantics, like distinct parts per order). Returns one row
    per pair meeting both support thresholds:
    ``p1, p2, pair_cnt, cnt1, cnt2, support, conf_1_2, conf_2_1, lift``.
    """
    # localCheckpoint (r14, §5.2): the distinct basket-item relation is
    # read by FOUR plan branches (item counts, the pruned expansion's two
    # self-join sides via fb, the basket-count scalar); unmaterialized,
    # each branch re-reduced the source->distinct exchange. One
    # materialization of the corpus-linear relation serves all four.
    # ABAB same session at sf0.1 (q229): medians 2.36 -> 1.83 s.
    b = (baskets.select(F.col(basket_col).alias("__b"),
                        F.col(item_col).alias("__i"))
         .where(F.col(basket_col).isNotNull()
                & F.col(item_col).isNotNull())
         .distinct()
         .localCheckpoint(eager=True))
    if max_basket_size is not None:
        sizes = (b.groupBy("__b").agg(F.count(F.lit(1)).alias("__sz"))
                 .where(F.col("__sz") <= max_basket_size))
        b = b.join(sizes.select("__b"), "__b", "semi")
    item_cnt = b.groupBy("__i").agg(F.count(F.lit(1)).alias("__cnt"))
    frequent = item_cnt.where(F.col("__cnt") >= min_item_support)
    # downward-closure prune BEFORE the quadratic expansion
    fb = b.join(frequent.select("__i"), "__i", "semi")
    n_baskets = b.select(F.count_distinct("__b").alias("__n"))
    left = fb.select(F.col("__b"), F.col("__i").alias("p1"))
    right = fb.select(F.col("__b"), F.col("__i").alias("p2"))
    pairs = (left.join(right, "__b")
             .where(F.col("p1") < F.col("p2"))
             .groupBy("p1", "p2")
             .agg(F.count(F.lit(1)).alias("pair_cnt"))
             .where(F.col("pair_cnt") >= min_pair_support))
    c1 = frequent.select(F.col("__i").alias("p1"),
                         F.col("__cnt").alias("cnt1"))
    c2 = frequent.select(F.col("__i").alias("p2"),
                         F.col("__cnt").alias("cnt2"))
    out = (pairs.join(c1, "p1").join(c2, "p2")
           .crossJoin(F.broadcast(n_baskets)))
    return out.select(
        "p1", "p2", "pair_cnt", "cnt1", "cnt2",
        F.round(F.col("pair_cnt") / F.col("__n"), round_dp)
        .cast("double").alias("support"),
        F.round(F.col("pair_cnt") / F.col("cnt1"), round_dp)
        .cast("double").alias("conf_1_2"),
        F.round(F.col("pair_cnt") / F.col("cnt2"), round_dp)
        .cast("double").alias("conf_2_1"),
        F.round(F.col("pair_cnt") * F.col("__n")
                / (F.col("cnt1") * F.col("cnt2")), round_dp)
        .cast("double").alias("lift"),
    )
