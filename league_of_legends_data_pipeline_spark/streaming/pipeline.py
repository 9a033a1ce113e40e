"""Structured-Streaming variant of the load pipeline (SURVEY §2.11 T1).

The reference's Lambda fires per S3 ``ObjectCreated`` and routes each file
to one of three MySQL tables. Here the equivalent is a file-stream source
with ``trigger(availableNow=True)`` — each run drains all new files exactly
once (checkpoint-tracked offsets replace the leftovers queue, T4), and
``foreachBatch`` demuxes the three routed pipelines and appends to the
silver parquet tables with schema evolution.

Idempotency (T5): ``matchId`` is the natural key. Within a micro-batch
``dropDuplicates`` collapses replays; ACROSS batches each append first
anti-joins the batch against the sink's existing keys, so a match replayed
in a later file (the reference's leftover-drain double-fetch) cannot
double-insert. The key scan reads only the key columns (column-pruned) —
at very large sinks switch to ``dropDuplicatesWithinWatermark`` keyed
state or a Delta MERGE instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from league_of_legends_data_pipeline_spark.plans.etl import (
    event_rows, player_rows, rank_rows, timeline_rows,
)
from league_of_legends_data_pipeline_spark.sinks import evolve_append
from league_of_legends_data_pipeline_spark.sources.readers import RANK_STATS_DDL


def start_ingest(
    spark: SparkSession,
    source_glob: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Stream bronze envelope JSON → silver tables. Returns the query.

    ``schema`` must be the envelope schema (streaming JSON sources require
    an explicit schema — no inference mid-stream; SURVEY §7 hard part 1
    keeps bronze permissive by retaining unparsed files for re-read).
    """
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 64)  # T3 flow control
        .json(source_glob)
        .withColumn("_source_file", F.input_file_name())
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        demux_batch(batch_df, out_dir)

    writer = stream.writeStream.foreachBatch(process_batch) \
        .option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def demux_batch(envelopes: DataFrame, out_dir: str) -> None:
    """Route one micro-batch (F1) and append each silver table (K5).

    Runs as three Spark jobs over one cached batch — the batch is tiny
    relative to the tables, so caching it beats re-reading the JSON thrice.
    """
    spark = envelopes.sparkSession
    envelopes = envelopes.cache()
    try:
        matches = envelopes.filter(
            F.col("metadata.data_collection_type") == "match")
        timelines = envelopes.filter(
            F.col("metadata.data_collection_type") == "match_timeline")

        m = matches.select("_source_file", F.explode("matches").alias("m")) \
                   .select("m.*")
        t = timelines.select("_source_file", F.explode("matches").alias("m")) \
                     .select("m.*")

        if not m.isEmpty():
            evolve_append(
                spark,
                _minus_existing(
                    player_rows(m).dropDuplicates(["matchId", "puuid"]),
                    f"{out_dir}/player_data", ["matchId", "puuid"]),
                f"{out_dir}/player_data")
        if not t.isEmpty():
            evolve_append(
                spark,
                _minus_existing(
                    timeline_rows(t).dropDuplicates(["matchId", "puuid", "timestamp"]),
                    f"{out_dir}/timeline_data", ["matchId", "puuid", "timestamp"]),
                f"{out_dir}/timeline_data")
            evolve_append(
                spark,
                _minus_existing(event_rows(t), f"{out_dir}/events", ["matchId"]),
                f"{out_dir}/events")
    finally:
        envelopes.unpersist()


def _minus_existing(batch: DataFrame, path: str, keys: list[str]) -> DataFrame:
    """Cross-batch idempotency (T5): drop batch rows whose natural key is
    already in the sink — a file replayed in a later micro-batch (or a
    leftover re-drain) must not double-insert. Left-anti against the
    key-pruned sink scan; no-op when the sink doesn't exist yet."""
    try:
        existing = batch.sparkSession.read.parquet(path).select(*keys).distinct()
    except Exception:
        return batch
    return batch.join(existing, keys, "left_anti")


def start_ranks_ingest(
    spark: SparkSession,
    source_glob: str,
    out_dir: str,
    checkpoint_dir: str,
    stats_ddl: str = RANK_STATS_DDL,
):
    """Stream the third route (F1: ``player-maps`` objects → rank rows).

    Rank maps are whole-object JSON keyed by puuid, so they stream as
    wholetext and parse with ``from_json(map<string, struct>)`` — the same
    P6 map→rows explosion as the batch reader, checkpointed exactly-once.
    """
    stream = (
        spark.readStream.option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .text(source_glob)
    )
    parsed = stream.select(
        F.explode(F.from_json("value", f"map<string, struct<{stats_ddl}>>"))
         .alias("puuid", "stats")
    ).select("puuid", "stats.*")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            evolve_append(batch_df.sparkSession,
                          rank_rows(batch_df).dropDuplicates(["puuid"]),
                          f"{out_dir}/player_ranks_data")

    return (parsed.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())


def dedup_stream_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """At-least-once → effectively-once with BOUNDED state (SURVEY T5 at
    100 TB): natural-key dedup whose per-key state is dropped once the
    event-time watermark passes it.

    Plain ``dropDuplicates`` on a stream keeps every key seen forever —
    unbounded state that eventually OOMs a year-long ingest.
    ``dropDuplicatesWithinWatermark`` keeps a key only until the watermark
    (max event time - delay) passes its timestamp: replays and retries
    land within the delay window and are deduped; state stays O(keys per
    window). This is the documented scale switch from the batch-path
    anti-join idempotency in ``demux_batch``.
    """
    return stream.withWatermark(ts_col, watermark) \
                 .dropDuplicatesWithinWatermark(keys)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    max_delay: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner equi-join with an event-time interval bound —
    the attribution join (impression ⋈ click-within-N-minutes) that only
    works at scale because BOTH state stores are bounded.

    Unbounded stream-stream joins buffer every row of both sides forever.
    Two things bound the state here, and both are required:

    - watermarks on BOTH inputs: a buffered row is dropped once the other
      side's watermark guarantees no future match can arrive for it;
    - the interval condition ``right_ts ∈ [left_ts, left_ts + max_delay]``
      in the JOIN CONDITION itself (not a post-filter): Spark derives the
      state-eviction bound from the time-range predicate, so each side
      holds only ~(watermark + max_delay) of data per key.

    State shards by the equi-join keys across executors — the same
    shuffle partitioning as a batch join, but with a rolling time-bounded
    buffer instead of the whole table.
    """
    l_ = left.withWatermark(left_ts, watermark).alias("l")
    r_ = right.withWatermark(right_ts, watermark).alias("r")
    key_cond = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in keys]
    time_cond = [
        F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"),
        F.col(f"r.{right_ts}")
        <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}"),
    ]
    cond = key_cond[0]
    for c in key_cond[1:] + time_cond:
        cond = cond & c
    joined = l_.join(r_, cond, "inner")
    # The raw-condition join carries BOTH sides' identically-named equi-key
    # columns, making any unqualified downstream reference to a key column
    # ambiguous. Emit each key once (left side) plus the right side's
    # non-key columns, so the result behaves like an equi-join on `keys`.
    return joined.select(
        "l.*",
        *[F.col(f"r.{c}") for c in right.columns if c not in keys],
    )
