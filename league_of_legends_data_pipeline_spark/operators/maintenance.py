"""Table-maintenance planning — the lakehouse OPTIMIZE surface: small-file
compaction planning over a file listing. At 100 TB the small-file problem
is the #1 operational tax on a streaming-ingested table (every micro-batch
writes per-partition files; scans then pay per-file open cost), and the
fix is a deterministic plan: group co-partition files in write order into
target-size bins, rewrite each multi-file bin as one file.

The planner is pure DataFrame logic over file METADATA (path, partition,
size) — plans for a million files are a million rows, trivially
distributed; the expensive rewrite step executes the plan elsewhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def plan_compaction(files: DataFrame, group_cols: list[str],
                    size_col: str, order_cols: list[str],
                    target_bytes: int) -> DataFrame:
    """Assign every file a compaction bin: within each ``group_cols``
    partition, walk files in ``order_cols`` order and cut a new bin each
    time the running size crosses ``target_bytes`` —
    ``bin = floor(cum_size_before_this_file / target) + 1``, the
    deterministic first-fit-in-order rule (what Delta/Iceberg OPTIMIZE
    bin-packing does, minus the rewrite). Adds ``bin`` and
    ``cum_bytes``; files bigger than the target get a bin of their own
    by construction (their successor's offset has crossed the line).

    Scale shape: one window (partitioned by the group — parallel across
    partitions, sorted within; a partition's file list is metadata-tiny).
    """
    w = (Window.partitionBy(*group_cols).orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(size_col).over(w)
    return (files
            .withColumn("cum_bytes", cum.cast("long"))
            .withColumn(
                "bin",
                (F.floor((F.col("cum_bytes") - F.col(size_col))
                         / F.lit(target_bytes)) + 1).cast("long")))


def compaction_report(files: DataFrame, group_cols: list[str],
                      size_col: str, order_cols: list[str],
                      target_bytes: int) -> DataFrame:
    """Per-bin compaction summary: (group..., bin, n_files, total_bytes,
    compactable) — ``compactable`` marks bins that would actually merge
    (>= 2 files). The report a maintenance scheduler turns into rewrite
    jobs, ordered for stable output."""
    planned = plan_compaction(files, group_cols, size_col, order_cols,
                              target_bytes)
    return (planned.groupBy(*group_cols, "bin")
            .agg(F.count(F.lit(1)).alias("n_files"),
                 F.sum(size_col).cast("long").alias("total_bytes"))
            .withColumn("compactable", F.col("n_files") >= 2))


def small_file_stats(files: DataFrame, group_cols: list[str],
                     size_col: str, small_bytes: int) -> DataFrame:
    """Per-group small-file health: (group..., n_files, n_small,
    small_fraction, total_bytes, avg_bytes) — the trigger metric for
    scheduling compaction at all."""
    small = (F.col(size_col) < small_bytes).cast("long")
    return (files.groupBy(*group_cols)
            .agg(F.count(F.lit(1)).alias("n_files"),
                 F.sum(small).alias("n_small"),
                 F.sum(size_col).cast("long").alias("total_bytes"))
            .select(*group_cols, "n_files", "n_small",
                    F.round(F.col("n_small") / F.col("n_files"), 6)
                    .alias("small_fraction"),
                    "total_bytes",
                    F.round(F.col("total_bytes") / F.col("n_files"), 6)
                    .alias("avg_bytes")))


def zone_map_stats(df: DataFrame, group_cols: list[str],
                   value_col: str) -> DataFrame:
    """Per-"file" zone-map statistics — (group..., vmin, vmax, n_rows)
    for a value column, i.e. what parquet row-group footers / Iceberg
    manifests store. One partial-aggregating groupBy over metadata-sized
    groups."""
    return (df.groupBy(*group_cols)
            .agg(F.min(value_col).alias("vmin"),
                 F.max(value_col).alias("vmax"),
                 F.count(F.lit(1)).alias("n_rows")))


def zone_map_pruning_report(df: DataFrame, group_cols: list[str],
                            value_col: str,
                            predicates: list[tuple[float, float]]
                            ) -> DataFrame:
    """Scan-planning effectiveness report: for each half-open range
    predicate ``[lo, hi)`` over ``value_col``, how many files the zone
    maps prune (``vmax < lo OR vmin >= hi``), how many rows the
    surviving files would scan, and how many rows actually match —
    the data the layout optimizer (z-order, q149) is trying to improve.

    Returns (pred_id, lo, hi, n_files, n_pruned, rows_scanned,
    rows_matched). Two linear passes: the zone-map aggregate (metadata-
    sized), and ONE conditional-sum aggregate for all predicates' true
    match counts; predicates broadcast as a literal frame.
    """
    stats = zone_map_stats(df, group_cols, value_col)
    spark = df.sparkSession
    preds = spark.createDataFrame(
        [(i, float(lo), float(hi)) for i, (lo, hi) in enumerate(predicates)],
        ["pred_id", "lo", "hi"])
    pruned = (stats.join(F.broadcast(preds))
              .withColumn("__p", (F.col("vmax") < F.col("lo"))
                          | (F.col("vmin") >= F.col("hi")))
              .groupBy("pred_id", "lo", "hi")
              .agg(F.count(F.lit(1)).alias("n_files"),
                   F.sum(F.col("__p").cast("long")).alias("n_pruned"),
                   F.sum(F.when(~F.col("__p"), F.col("n_rows"))
                         .otherwise(0)).cast("long").alias("rows_scanned")))
    v = F.col(value_col)
    matched = df.agg(*[
        F.sum(((v >= F.lit(float(lo))) & (v < F.lit(float(hi))))
              .cast("long")).alias(f"__m{i}")
        for i, (lo, hi) in enumerate(predicates)])
    long_matched = (matched.select(F.explode(F.array(*[
        F.struct(F.lit(i).alias("pred_id"),
                 F.col(f"__m{i}").alias("rows_matched"))
        for i in range(len(predicates))])).alias("s")).select("s.*"))
    return (pruned.join(F.broadcast(long_matched), "pred_id")
            .select("pred_id", "lo", "hi", "n_files", "n_pruned",
                    "rows_scanned", "rows_matched"))
