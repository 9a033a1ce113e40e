"""Bronze readers (SURVEY §2.1 S1/S2, §2.4 F1).

The reference GETs one JSON object at a time (``Utils/S3.py:244-268``) and
routes on the object key (``Lambda/lambda_function.py:95,110,204``). Here a
single ``spark.read.json`` over a path glob replaces both: Spark lists the
prefix, parallelizes the parse, and ``input_file_name()`` carries the key
for routing. Envelope unwrap is an ``explode`` — one row per match.

Scale notes: bronze is a many-small-JSON layer (≤200 matches/file from the
reference's batching). ``maxPartitionBytes`` + file coalescing let Spark
pack many small files into one task; the silver rewrite compacts to
properly-sized parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_envelopes(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read upload-envelope JSON files (Utils/S3.py:114-123) — one row per
    file — stamping ``_source_file`` provenance for key-based routing."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return (
        reader.option("recursiveFileLookup", "true").json(path)
        .withColumn("_source_file", F.input_file_name())
    )


def unwrap_matches(envelopes: DataFrame) -> DataFrame:
    """Envelope → one row per match document (explode of ``matches``),
    keeping upload metadata columns for lineage."""
    return envelopes.select(
        F.col("metadata.batch_id").alias("batch_id"),
        F.col("metadata.data_collection_type").alias("data_collection_type"),
        F.col("_source_file"),
        F.explode("matches").alias("m"),
    ).select("batch_id", "data_collection_type", "_source_file", "m.*")


def route(envelopes: DataFrame) -> dict[str, DataFrame]:
    """3-way key routing (F1, Lambda/lambda_function.py:95,110,204):
    ``player-maps`` → ranks; ``match_timelines`` → timelines; else matches.
    """
    return {
        "ranks": envelopes.filter(F.col("_source_file").contains("player-maps")),
        "timelines": envelopes.filter(
            ~F.col("_source_file").contains("player-maps")
            & F.col("_source_file").contains("match_timelines")),
        "matches": envelopes.filter(
            ~F.col("_source_file").contains("player-maps")
            & ~F.col("_source_file").contains("match_timelines")),
    }


RANK_STATS_DDL = (
    "leaguePoints bigint, player_rank string, tier string, wins bigint, "
    "losses bigint, veteran boolean, inactive boolean, freshBlood boolean, "
    "hotStreak boolean, time_stamp bigint"
)


def read_rank_map(spark: SparkSession, path: str, stats_ddl: str = RANK_STATS_DDL) -> DataFrame:
    """Rank map at rest is one JSON object ``{puuid: {stats…}}``
    (EC2/fetcher.py:105). JSON-inferring it as a struct would make one
    COLUMN per puuid; parse it as ``map<string, struct>`` and explode to
    rows instead (P6: map→rows, Lambda/lambda_function.py:102-105).
    All JVM-side: read.text(wholetext) → from_json(MapType) → explode.
    """
    raw = spark.read.text(path, wholetext=True)
    parsed = raw.select(
        F.from_json("value", f"map<string, struct<{stats_ddl}>>").alias("m"))
    return parsed.select(F.explode("m").alias("puuid", "stats")).select("puuid", "stats.*")
