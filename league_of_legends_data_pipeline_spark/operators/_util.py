"""Shared operator helpers."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def default_parallelism(df: DataFrame) -> int:
    """Explicit partition count for compute-spreading repartitions.

    A column-only ``repartition(col)`` is fair game for AQE partition
    coalescing, which collapses small-but-compute-heavy stages back to one
    task; an explicit count is not coalesced.
    """
    return df.sparkSession.sparkContext.defaultParallelism


def jaccard_verified_pairs(cands: DataFrame, a_col: str, b_col: str,
                           threshold: float) -> DataFrame:
    """Exact Jaccard on two array columns of candidate pairs, filtered to
    ``>= threshold`` → (id_a, id_b, jaccard).

    The intersection is aliased BEFORE the filter: ``i/(s-i)`` mentions the
    intersect twice, and filtering on the raw expression would push BOTH
    copies into the join condition — with the alias the pushed-down
    predicate evaluates array_intersect once per candidate pair, and
    downstream operators move two ints instead of the arrays.
    """
    inter = F.size(F.array_intersect(a_col, b_col))
    sizes = F.size(a_col) + F.size(b_col)
    return (
        cands.select("id_a", "id_b", inter.alias("__i"), sizes.alias("__s"))
        .withColumn("jaccard", F.col("__i") / (F.col("__s") - F.col("__i")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
