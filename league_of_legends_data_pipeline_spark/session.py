"""SparkSession factory.

All engine entry points share one session shape: AQE on (runtime re-plan,
skew-join handling, partition coalescing), Arrow on (fast Pandas UDF /
toPandas), UTC session time zone (epoch math in the reference is UTC —
Utils/S3.py:154-176), and shuffle partitions sized for the local test
harness while remaining overridable for cluster deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "league_of_legends_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a real cluster, pass ``master=None`` and let spark-submit decide;
    locally defaults to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # dynamic partition overwrite: idempotent event-time partition rewrites
        # (reference overwrites S3 objects in place — Utils/S3.py:270-311)
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        # wide whole-stage-codegen (minhash/simhash hash ladders) fills the
        # JVM's default 240 MB code cache over a long session; once full the
        # JIT flushes/stops and late queries run partly interpreted (observed
        # as a 4-6x slowdown on codegen-heavy queries late in a ~100-query
        # run). One flag, fleet-wide effect: executors compile the same
        # generated classes.
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m")
        .config("spark.executor.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# The driver's parquet writes timestamps as TIMESTAMP(NANOS), which Spark's
# vectorized reader rejects; read them as raw nanos and convert to
# microsecond timestamps (matching DuckDB's TIMESTAMP semantics, which
# truncates ns→µs on read).
_NANO_TS_COLS = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}


# (session-identity, sf_dir, table) -> constructed DataFrame. A LOGICAL
# PLAN cache, not a data cache: every action on a memoized frame still
# scans the parquet files — nothing is persisted or precomputed. What it
# saves is the per-call driver work load_tables previously repaid on
# every one of the ~340 bench queries (re-listing the path, re-reading
# the footer schema, re-analyzing the normalization projection,
# re-registering the temp view): ~270 ms/table on the r13 VM, ~100+ s
# across a bench run. Keyed on (id(session), applicationId) so a new
# session/process can never see another session's plans; within one
# process the file listing is snapshotted at first use, which is exactly
# the bench/parity contract (testdata is immutable for a run).
_TABLE_CACHE: dict = {}


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict:
    """Load the driver-generated parquet tables and register temp views."""
    names = names or [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # pin UTC even on a caller-provided vanilla session: DuckDB's oracle
    # timestamps are timezone-naive, and year()/window() over a non-UTC
    # session timezone would shift event-time-derived results
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    key_base = (id(spark), spark.sparkContext.applicationId, sf_dir)
    out = {}
    for name in names:
        key = key_base + (name,)
        df = _TABLE_CACHE.get(key)
        if df is None:
            df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
            # ONE select for the whole normalization (nano-ts rewrite +
            # NTZ cast): each withColumn used to trigger its own full
            # plan re-analysis per column
            nano = set(_NANO_TS_COLS.get(name, []))
            dtypes = df.dtypes
            cols, changed = [], False
            for c, dtype in dtypes:
                if c in nano and dtype == "bigint":
                    cols.append(F.expr(f"timestamp_micros({c} div 1000)")
                                .alias(c))
                    changed = True
                elif dtype == "timestamp_ntz":
                    # see normalize_ntz: session tz is pinned UTC, so the
                    # cast is value-preserving
                    cols.append(F.col(c).cast("timestamp").alias(c))
                    changed = True
                else:
                    cols.append(F.col(c))
            if changed:
                df = df.select(*cols)
            df.createOrReplaceTempView(name)
            _TABLE_CACHE[key] = df
        out[name] = df
    return out


def normalize_ntz(df):
    """Cast any TIMESTAMP_NTZ column to TIMESTAMP (session tz is pinned UTC,
    so the cast is value-preserving).

    The driver's generated parquet has drifted between rounds — round-1 data
    was TIMESTAMP(NANOS) (read as bigint under ``nanosAsLong``), round-3 data
    is ``timestamp[us]``, which Spark 4 infers as TIMESTAMP_NTZ. NTZ is
    rejected by ``withWatermark`` (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) and
    ``unix_micros``; normalizing at load keeps every downstream plan on the
    instant-typed TIMESTAMP the engine expects.
    """
    for c, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df
