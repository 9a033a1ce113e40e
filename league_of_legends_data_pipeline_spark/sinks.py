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

import functools
import operator
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


def drop_managed_table(spark: SparkSession, table: str) -> None:
    """Drop a managed table AND its warehouse location.

    With the in-memory (non-Hive) catalog a new session forgets managed
    tables but their ``spark-warehouse/<table>`` directories persist, so
    the next ``saveAsTable`` — even ``mode=overwrite`` — fails with
    LOCATION_ALREADY_EXISTS. Deleting the leftover location through the
    Hadoop FS API keeps table-producing operators (e.g. the near-dup
    admission index) re-runnable from any fresh session.
    """
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(warehouse + "/" + table.lower())
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a hash-bucketed (optionally sorted) managed table.

    Bucketing is the pre-shuffle: rows are hash-distributed into
    ``num_buckets`` files by ``bucket_cols`` at WRITE time, so every
    subsequent equi-join or aggregation on those columns skips its
    exchange — the join that dominates a fact-to-fact workload shuffles
    zero bytes instead of the full table, every run, forever. At 100 TB
    that converts the recurring O(table) shuffle into a one-time write
    cost; with ``sort_cols`` the sort-merge join's sort is also
    pre-paid. Both sides must bucket identically (same cols, same count)
    for the exchange-free plan; ``tests/test_sinks_state.py`` asserts the
    executed join plan contains no Exchange.
    """
    # Align write partitions with buckets first: without this, every
    # input partition emits its own file per bucket it touches — up to
    # tasks x num_buckets files (observed 1024 x ~8 KB for the r12 band
    # index at sf0.1, the §6 small-file problem at both write and every
    # subsequent bucketed scan). repartition(n, cols) and bucketBy(n,
    # cols) share Murmur3-pmod-n placement, so each task then holds
    # exactly one bucket: num_buckets files total, content unchanged.
    w = (df.repartition(num_buckets, *bucket_cols)
         .write.mode(mode).bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def compact_partitions(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: tuple[str, ...] = PARTITION_COLS,
) -> None:
    """Rewrite a hive-partitioned parquet table with size-targeted files.

    The reference's sink emits one object per <=200-match batch / one per
    match (Utils/S3.py:101-111,190-194) — the classic small-file problem
    SURVEY §4 flags; at 100 TB an uncompacted day partition can hold
    millions of KB-sized files and the scan dies on open() overhead.

    Sizing is measured, not guessed: a ``binaryFile`` read lists every
    parquet file with its length distributedly (content column pruned away
    — no data is read), aggregated per hive partition. Each partition gets
    ``ceil(bytes / target)`` output files via a deterministic row-hash
    salt, so a 10 GB day becomes ~80 files of ~128 MB while a 3 KB day
    collapses to one — one shuffle keyed (partition, salt), every task
    writing exactly one file.

    Writes to ``dest_path`` (a table cannot atomically overwrite itself
    while being read); swap is the caller's rename/metastore flip.
    """
    listing = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(src_path)
        .select("path", "length")
    )
    part_expr = F.concat_ws("/", *[
        F.regexp_extract("path", rf"{c}=([^/]+)", 1) for c in partition_cols
    ])
    sizes = {
        r["part"]: int(r["bytes"])
        for r in listing.groupBy(part_expr.alias("part"))
                        .agg(F.sum("length").alias("bytes")).collect()
    }  # one row per hive partition — bounded metadata, not data
    n_files = {p: max(1, -(-b // target_file_bytes)) for p, b in sizes.items()}

    df = spark.read.parquet(src_path)
    key = F.concat_ws("/", *[F.col(c).cast("string") for c in partition_cols])
    n_map = F.create_map(*[F.lit(x) for kv in n_files.items() for x in kv])
    data_cols = [c for c in df.columns if c not in partition_cols]
    salt = F.pmod(F.abs(F.xxhash64(*data_cols)), F.coalesce(n_map[key], F.lit(1)))
    (
        df.withColumn("__salt", salt)
        .repartition(*[F.col(c) for c in partition_cols], F.col("__salt"))
        .drop("__salt")
        .write.mode("overwrite").partitionBy(*partition_cols).parquet(dest_path)
    )


def merge_frames(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE semantics over DataFrames: rows of ``target`` whose key appears
    in ``updates`` are replaced by the update row (whole-row CDC image),
    unmatched updates are inserted, and updates flagged true in
    ``delete_col`` delete their key. Schema evolves both directions
    (``unionByName(allowMissingColumns=True)`` — K5 semantics).

    One shuffle on the key (anti-join) + a union: cheaper than the
    full-outer-join-and-coalesce formulation when updates carry complete
    row images, which is the CDC norm.
    """
    upd = updates
    if delete_col is not None:
        upd = updates.filter(~F.coalesce(F.col(delete_col), F.lit(False))) \
                     .drop(delete_col)
        updates = updates.drop(delete_col)
    kept = target.join(updates.select(*key_cols).distinct(), key_cols, "left_anti")
    return kept.unionByName(upd, allowMissingColumns=True)


def merge_upsert(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key_cols: list[str],
    partition_cols: tuple[str, ...] = PARTITION_COLS,
    delete_col: str | None = None,
) -> None:
    """CDC MERGE INTO a hive-partitioned parquet table, rewriting ONLY the
    partitions the updates touch.

    The 100 TB lever is the partition pruning on BOTH ends: the target scan
    reads just the impacted partitions (an IN-list over the updates'
    distinct partition tuples — bounded metadata, collected once), and
    dynamic partition overwrite replaces just those directories. A day of
    updates against a year of data reads and rewrites one day, not the
    table. Requires partition-stable keys (partition columns derived from
    immutable event time — K3's contract), else a moved key would leave its
    old row behind.

    Edge: a partition whose every row is deleted produces no output rows,
    so dynamic overwrite leaves it untouched — drop such partitions
    explicitly. Stock parquet has no multi-writer transaction; concurrent
    mergers need a table format (Delta/Iceberg) or an external lock.
    """
    if not _table_exists(path):
        # bootstrap: the first batch of a foreachBatch streaming MERGE
        # arrives before any table exists — applying MERGE semantics to
        # an empty target is exactly "insert the non-deletes"
        inserts = updates
        if delete_col is not None:
            inserts = (updates.filter(~F.coalesce(F.col(delete_col),
                                                  F.lit(False)))
                       .drop(delete_col))
        (inserts.repartition(*[F.col(c) for c in partition_cols])
                .write.mode("overwrite")
                .partitionBy(*partition_cols).parquet(path))
        return
    parts = [tuple(r) for r in
             updates.select(*partition_cols).distinct().collect()]
    if not parts:
        return
    in_impacted = functools.reduce(operator.or_, [
        functools.reduce(operator.and_, [
            F.col(c) == F.lit(v) for c, v in zip(partition_cols, p)
        ]) for p in parts
    ])
    target = read_evolved(spark, path).filter(in_impacted)
    merged = merge_frames(target, updates, key_cols, delete_col)
    # materialize before overwriting the files the plan reads from
    merged = merged.persist()
    merged.count()
    try:
        (merged.repartition(*[F.col(c) for c in partition_cols])
               .write.mode("overwrite")
               .option("partitionOverwriteMode", "dynamic")
               .partitionBy(*partition_cols).parquet(path))
    finally:
        merged.unpersist()


def _table_exists(path: str) -> bool:
    if "://" not in path or path.startswith("file:"):
        p = path.removeprefix("file:")
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS"
            for _, _, files in os.walk(p) for f in files
        )
    # remote filesystems: attempt-read is the portable existence check
    return True


def zorder_value(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Add a ``__z`` column: the Z-order (Morton) index of the rows'
    positions along ``cols``, ``bits`` bits per column.

    Each column is bucketed into 2^bits quantile buckets via
    ``approxQuantile`` boundaries (one pass per column, sketch-based — no
    global sort), then the bucket ids' bits are interleaved. Rows close in
    __z are close in EVERY named column, which is what makes min/max file
    skipping work on multi-column predicates after :func:`write_zordered`.
    """
    n_buckets = 1 << bits
    out = df
    step = 1.0 / n_buckets
    # the sketch error must be well under a bucket's rank width or adjacent
    # boundaries collapse to the same value (measured: 0.01 error with 256
    # buckets left only ~70 distinct buckets on a uniform column)
    err = step / 4
    for ci, c in enumerate(cols):
        qs = [step * i for i in range(1, n_buckets)]
        bounds = df.approxQuantile(c, qs, err) if dict(df.dtypes)[c] != "timestamp" \
            else df.select(F.unix_micros(F.col(c)).alias(c)).approxQuantile(c, qs, err)
        # strictly increasing boundary subset (quantiles repeat on skew)
        uniq: list[float] = []
        for b in bounds:
            if not uniq or b > uniq[-1]:
                uniq.append(b)
        val = F.unix_micros(F.col(c)) if dict(df.dtypes)[c] == "timestamp" else F.col(c)
        bucket = F.lit(0)
        for b in uniq:  # ≤255 comparisons, all codegen'd; rank = #bounds below
            bucket = bucket + F.when(val > F.lit(b), 1).otherwise(0)
        out = out.withColumn(f"__zb{ci}", bucket.cast("long"))
    interleaved = F.lit(0).cast("long")
    for j in range(bits):
        for ci in range(len(cols)):
            interleaved = interleaved + (
                F.shiftright(F.col(f"__zb{ci}"), j).bitwiseAND(F.lit(1))
                * F.lit(1 << (j * len(cols) + ci))
            )
    return out.withColumn("__z", interleaved).drop(
        *[f"__zb{ci}" for ci in range(len(cols))])


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 8,
) -> None:
    """Z-order-clustered parquet write: range-partition by the Morton index
    into ``n_files`` tasks and sort each file by it.

    The payoff at 100 TB is FILE SKIPPING on multi-column predicates:
    parquet min/max footer stats become selective on every z-ordered
    column at once (a single-column sort makes them selective on one).
    A point/range query on any indexed column then prunes most files at
    planning time — no data read. This is the same layout lever as Delta
    OPTIMIZE ZORDER BY, built from stock Spark: quantile-bucket → bit
    interleave → repartitionByRange → sortWithinPartitions.
    """
    z = zorder_value(df, cols, bits)
    (z.repartitionByRange(n_files, "__z")
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path))


# ---------------------------------------------------------------------------
# JDBC parity (S10 source / K5 sink over a SQL database)
# ---------------------------------------------------------------------------

def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    driver: str | None = None,
    batch_size: int = 10_000,
) -> None:
    """JDBC sink — parity with the reference's MySQL insert path
    (``Utils/sql.py:24-43``), which row-loops ``INSERT`` statements from
    Python. Spark's JDBC writer issues batched prepared statements from
    EVERY executor in parallel; ``batch_size`` rows per round-trip is the
    knob that matters at scale (the default 1000 leaves a 100 TB load
    dominated by network round-trips).

    The writer inherits ``df``'s parallelism: repartition before calling
    if the target DB can't take one connection per partition.
    """
    opts = {"url": url, "dbtable": table, "batchsize": str(batch_size)}
    if driver:
        opts["driver"] = driver
    df.write.format("jdbc").options(**opts).mode(mode).save()


# Spark dtype -> ANSI-ish DDL type for ALTER TABLE ADD. VARCHAR(255) for
# strings is deliberate reference parity (Utils/sql.py:46-62 infers
# VARCHAR(255) as the string/default type).
_JDBC_DDL_TYPES = {
    "tinyint": "SMALLINT", "smallint": "SMALLINT", "int": "INTEGER",
    "bigint": "BIGINT", "float": "REAL", "double": "DOUBLE",
    "string": "VARCHAR(255)", "boolean": "BOOLEAN",
    "date": "DATE", "timestamp": "TIMESTAMP", "timestamp_ntz": "TIMESTAMP",
}

# Lossless type-widening lattice for drifting batches (K5): a target
# column is widened when an incoming batch's type is STRICTLY wider along
# one of these edges — integer ladder, float→double, and any integer →
# double (the reference's overflow promotion, Utils/sql.py:49-52,
# generalized from "INT hit its max" to "batch declared a wider type").
# Anything not reachable here (string vs int, boolean vs numeric, ...)
# is a REJECT: the append raises instead of silently coercing.
_JDBC_WIDEN_TO = {
    "tinyint": {"smallint", "int", "bigint", "double"},
    "smallint": {"int", "bigint", "double"},
    "int": {"bigint", "double"},
    "bigint": {"double"},
    "float": {"double"},
}


def jdbc_evolve_append(
    spark: SparkSession,
    df: DataFrame,
    url: str,
    table: str,
    driver: str | None = None,
    batch_size: int = 10_000,
) -> None:
    """K5 parity for the JDBC sink: schema-evolving append.

    The reference's MySQL path DESCRIBEs the target, ``ALTER TABLE ADD``s
    any unseen column with an inferred type, null-pads rows, then batch
    inserts (``Utils/sql.py:24-43``; ``Lambda/lambda_function.py:308-395``).
    The parquet path (:func:`evolve_append`) already evolves; a plain
    ``jdbc_write(mode="append")`` with new columns fails instead. This
    mirrors the reference:

    1. read the target's columns from JDBC metadata (zero-row subquery —
       schema only, no data moves);
    2. ``ALTER TABLE ADD COLUMN`` each dataframe column the table lacks
       (one DDL statement per column over a single driver-side connection —
       DDL is metadata, never data-sized);
    3. null-pad dataframe columns the table has but the frame lacks
       (``align_row_data`` both directions, Utils/sql.py:21-22);
    4. batched parallel append from every executor.

    Bootstraps the table (plain create) when it does not exist yet.
    Column-name matching is case-insensitive: JDBC engines fold unquoted
    identifiers (Derby/Oracle up, Postgres down).
    """
    opts = {"url": url}
    if driver:
        opts["driver"] = driver
    try:
        target = spark.read.format("jdbc").options(
            dbtable=f"(SELECT * FROM {table} WHERE 1=0) probe", **opts).load()
    except Exception:
        # no target yet: bootstrap is a plain create-and-write
        jdbc_write(df, url, table, mode="errorifexists", driver=driver,
                   batch_size=batch_size)
        return

    by_lower = {c.lower(): f for c in target.columns
                for f in [target.schema[c]]}
    new_cols = [f for f in df.schema.fields if f.name.lower() not in by_lower]
    # drifting-type batches (K5, reference Utils/sql.py:49-52): a column
    # arriving with a STRICTLY wider type on the lossless lattice widens
    # the target column; same/narrower types up-cast frame-side below; an
    # incompatible drift (string vs int, ...) is rejected loudly.
    widen_cols = []
    for f in df.schema.fields:
        tgt = by_lower.get(f.name.lower())
        if tgt is None:
            continue
        have, want = tgt.dataType.simpleString(), f.dataType.simpleString()
        if have == want:
            continue
        if want in _JDBC_WIDEN_TO.get(have, ()):
            widen_cols.append((tgt.name, want))
        elif have not in _JDBC_WIDEN_TO.get(want, ()):
            raise ValueError(
                f"jdbc_evolve_append: column {f.name!r} drifted from "
                f"{have} to {want}, which is not a lossless widening — "
                f"rejecting (cast the batch explicitly to coerce)")
    if new_cols or widen_cols:
        # DDL goes over one driver-side JDBC connection (Spark's writer
        # has no ALTER surface); the JVM driver class is already on the
        # classpath because the read above used it.
        jvm = spark._sc._gateway.jvm
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            stmt = conn.createStatement()
            for f in new_cols:
                ddl_type = _JDBC_DDL_TYPES.get(
                    f.dataType.simpleString(), "VARCHAR(255)")
                # ANSI-quote the column: Spark's JDBC writer emits quoted
                # (case-exact) identifiers on INSERT, so the added column
                # must be created case-exact too
                q = '"' + f.name.replace('"', '""') + '"'
                stmt.executeUpdate(
                    f"ALTER TABLE {table} ADD COLUMN {q} {ddl_type}")
            for name, want in widen_cols:
                _jdbc_widen_column(conn, stmt, table, name,
                                   _JDBC_DDL_TYPES[want])
            stmt.close()
        finally:
            conn.close()
        if widen_cols:
            # re-probe: the null-pad below must see the widened types
            target = spark.read.format("jdbc").options(
                dbtable=f"(SELECT * FROM {table} WHERE 1=0) probe",
                **opts).load()

    # null-pad target columns the frame lacks, with the TARGET's types;
    # up-cast frame columns that are NARROWER than the target (the
    # mirror of widening: an int batch appends cleanly into a column
    # already widened to bigint by an earlier batch)
    frame_types = {f.name.lower(): f.dataType.simpleString()
                   for f in df.schema.fields}
    for f in target.schema.fields:
        have = frame_types.get(f.name.lower())
        if have is None:
            df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        elif have != f.dataType.simpleString():
            df = df.withColumn(f.name, F.col(f.name).cast(f.dataType))
    jdbc_write(df, url, table, mode="append", driver=driver,
               batch_size=batch_size)


def _jdbc_widen_column(conn, stmt, table: str, name: str,
                       ddl_type: str) -> None:
    """Widen one column's declared type via driver-side DDL.

    Tries the engine's native in-place widen first, across the three
    common dialect spellings (``ALTER COLUMN … SET DATA TYPE`` —
    standard/Derby/DB2; ``ALTER COLUMN … TYPE`` — Postgres;
    ``MODIFY`` — MySQL/MariaDB). Engines that restrict all of them
    (Derby allows SET DATA TYPE only for VARCHAR length growth) fall
    back to the add-copy-swap dance: ADD a column of the wider type, one
    engine-side UPDATE to copy (runs inside the database — no data
    crosses Spark), DROP the old column, RENAME the new one into place.

    The whole fallback runs in ONE transaction (autocommit off,
    commit/rollback): a failure mid-dance — e.g. an engine whose RENAME
    dialect is not one of the two tried — rolls the table back to its
    pre-widen shape instead of stranding data in a half-swapped
    ``__widen_*`` column with the original column already dropped.
    Engines with non-transactional DDL (MySQL implicitly commits each
    DDL statement) never reach the fallback: MODIFY succeeds in-place
    above. Column order may change; Spark's JDBC writer lists column
    names on INSERT, so order is irrelevant.
    """
    q = '"' + name.replace('"', '""') + '"'
    for widen_sql in (
        f"ALTER TABLE {table} ALTER COLUMN {q} SET DATA TYPE {ddl_type}",
        f"ALTER TABLE {table} ALTER COLUMN {q} TYPE {ddl_type}",
        f"ALTER TABLE {table} MODIFY {q} {ddl_type}",
    ):
        try:
            stmt.executeUpdate(widen_sql)
            return
        except Exception:
            pass
    tmp = f"__widen_{name}"
    qt = '"' + tmp.replace('"', '""') + '"'
    conn.setAutoCommit(False)
    try:
        stmt.executeUpdate(f"ALTER TABLE {table} ADD COLUMN {qt} {ddl_type}")
        stmt.executeUpdate(f"UPDATE {table} SET {qt} = {q}")
        stmt.executeUpdate(f"ALTER TABLE {table} DROP COLUMN {q}")
        # The two RENAME spellings are tried in the SAME open transaction,
        # and PostgreSQL-style engines abort the whole transaction on the
        # first statement error — a bare retry would then fail with
        # "transaction aborted" and the widen would always roll back on
        # exactly the engines that need the second spelling. Bracket the
        # first attempt in a savepoint: release on success, rollback-to on
        # failure so the transaction is live again for the Derby spelling.
        # Engines without savepoint support raise from setSavepoint itself;
        # for those, fall back to the bare try/except (they are also the
        # engines whose error handling doesn't poison the transaction).
        try:
            sp = conn.setSavepoint()
        except Exception:
            sp = None
        try:
            # standard / Postgres / MySQL 8 / Oracle spelling first
            stmt.executeUpdate(
                f"ALTER TABLE {table} RENAME COLUMN {qt} TO {q}")
            if sp is not None:
                try:
                    conn.releaseSavepoint(sp)
                except Exception:
                    pass  # release is advisory; commit below subsumes it
        except Exception:
            if sp is not None:
                try:
                    conn.rollback(sp)
                except Exception:
                    # Rollback-to-savepoint can itself fail (e.g. the
                    # engine invalidated the savepoint via an implicit
                    # DDL commit). Don't let that mask the RENAME
                    # failure or skip the Derby spelling: proceed to the
                    # second attempt — if the transaction really is dead
                    # it surfaces its own error there, and the outer
                    # handler still restores the table.
                    pass
            # Derby's spelling
            stmt.executeUpdate(f"RENAME COLUMN {table}.{qt} TO {q}")
        conn.commit()
    except Exception:
        conn.rollback()
        raise
    finally:
        conn.setAutoCommit(True)


def jdbc_read(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """JDBC source (S10 parity). Without ``partition_column`` the read is a
    single connection — fine for dimension tables, a bottleneck for facts.
    With it, Spark splits the scan into ``num_partitions`` range-predicate
    queries executed in parallel, which is the only way a JDBC scan keeps a
    large cluster busy; bounds default to the column's min/max via one
    cheap agg query when not given.
    """
    opts = {"url": url, "dbtable": table}
    if driver:
        opts["driver"] = driver
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # push the agg INTO the database via a dbtable subquery: the v1
            # JDBC relation does not push down aggregates, so min/max over
            # the loaded relation would scan the whole table through one
            # connection — the opposite of "one cheap agg query". The
            # column is ANSI-double-quoted because Spark's JDBC writer
            # creates quoted (case-exact) identifiers, which unquoted
            # references would case-fold away from (Derby/Postgres/Oracle).
            q = '"' + partition_column.replace('"', '""') + '"'
            bounds_opts = dict(opts, dbtable=(
                f"(SELECT MIN({q}) AS lo, "
                f"MAX({q}) AS hi FROM {table}) b"))
            bounds = spark.read.format("jdbc").options(**bounds_opts) \
                .load().first()
            lower_bound = bounds[0] if lower_bound is None else lower_bound
            upper_bound = bounds[1] if upper_bound is None else upper_bound
            if lower_bound is None or upper_bound is None:
                raise ValueError(
                    f"cannot auto-partition JDBC read of {table}: "
                    f"MIN/MAX({partition_column}) returned NULL (empty "
                    f"table?) — pass explicit lower_bound/upper_bound or "
                    f"drop partition_column")
        opts.update({
            "partitionColumn": partition_column,
            "numPartitions": str(num_partitions),
            "lowerBound": str(lower_bound),
            "upperBound": str(upper_bound),
        })
    return spark.read.format("jdbc").options(**opts).load()
