"""Sinks (SURVEY §2.2).

- K2/K3: hive-date-partitioned parquet writes, partition date derived from
  IN-DATA event time (``Utils/S3.py:152-194``) — never wall clock.
- K5: schema-evolving table append — the reference DESCRIBEs the table,
  ALTERs in new columns, and null-pads rows (``Utils/sql.py:24-43``). In
  Spark this is ``unionByName(allowMissingColumns=True)`` against the
  existing schema at write time plus ``mergeSchema`` on read; atomic
  all-or-nothing per file maps to Spark's job commit protocol
  (Lambda txn rollback, ``Lambda/lambda_function.py:329-382``).

Scale notes: dynamic partition overwrite keeps event-time partition
rewrites idempotent (replay-safe, T4/T5); a pre-write ``repartition`` on
the partition keys prevents the many-small-files explosion (every task
writing every partition) — at 1000 executors an unpartitioned write of a
date-partitioned table would otherwise emit tasks×dates files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COLS = ("year", "month", "day")


def with_event_date_parts(df: DataFrame, ts_col: str) -> DataFrame:
    """Derive year/month/day partition columns from an event-time column
    (C2; Utils/S3.py:93-95,185-188)."""
    return (
        df.withColumn("year", F.year(ts_col))
        .withColumn("month", F.month(ts_col))
        .withColumn("day", F.dayofmonth(ts_col))
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_cols: tuple[str, ...] = PARTITION_COLS,
    coalesce_per_partition: bool = True,
) -> None:
    """K2/K3: hive-partitioned parquet write. With dynamic partition
    overwrite (session default), ``mode='overwrite'`` replaces only the
    partitions present in ``df`` — the reference's overwrite-in-place
    object semantics (K4, Utils/S3.py:270-311), made atomic."""
    out = df
    if coalesce_per_partition:
        # co-locate each output partition's rows: one shuffle, few files
        out = df.repartition(*[F.col(c) for c in partition_cols])
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def evolve_append(spark: SparkSession, df: DataFrame, path: str) -> None:
    """K5: schema-evolving append. New columns appear in the table; rows
    lacking existing columns are null-padded — both directions, exactly
    ``align_row_data`` (Utils/sql.py:21-22) without custom code."""
    existing_schema = None
    if _table_exists(path):
        try:
            existing_schema = spark.read.parquet(path).schema
        except Exception:
            # remote path that does not exist yet (bootstrap append) — the
            # local-path branch of _table_exists answers definitively, the
            # remote branch only via this attempted read
            existing_schema = None
    if existing_schema is not None:
        empty_existing = spark.createDataFrame([], existing_schema)
        df = df.unionByName(empty_existing, allowMissingColumns=True)
    df.write.mode("append").parquet(path)


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a schema-evolved table: union of all file schemas."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def _table_exists(path: str) -> bool:
    if "://" not in path or path.startswith("file:"):
        p = path.removeprefix("file:")
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS"
            for _, _, files in os.walk(p) for f in files
        )
    # remote filesystems: attempt-read is the portable existence check
    return True
