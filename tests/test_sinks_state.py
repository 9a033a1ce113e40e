"""Sinks (K2/K3/K5 semantics) and incremental-run state (T2/T9)."""

import os

from pyspark.sql import functions as F

from league_of_legends_data_pipeline_spark import state as st
from league_of_legends_data_pipeline_spark.sinks import (
    evolve_append, read_evolved, with_event_date_parts, write_partitioned,
)


def test_schema_evolution_both_directions(spark, tmp_path):
    """K5: batch 2 adds a column (table evolves), batch 3 lacks one
    (null-padded) — Utils/sql.py:10-22 semantics."""
    path = str(tmp_path / "tbl")
    b1 = spark.createDataFrame([(1, "a")], ["id", "x"])
    b2 = spark.createDataFrame([(2, "b", 9.5)], ["id", "x", "y"])
    b3 = spark.createDataFrame([(3,)], ["id"])
    for b in (b1, b2, b3):
        evolve_append(spark, b, path)
    out = read_evolved(spark, path)
    assert set(out.columns) == {"id", "x", "y"}
    rows = {r["id"]: r.asDict() for r in out.collect()}
    assert rows[1] == {"id": 1, "x": "a", "y": None}
    assert rows[2] == {"id": 2, "x": "b", "y": 9.5}
    assert rows[3] == {"id": 3, "x": None, "y": None}


def test_event_time_partitioned_write_and_dynamic_overwrite(spark, tmp_path):
    path = str(tmp_path / "events")
    df = spark.createDataFrame(
        [(1, "2024-09-10 12:00:00"), (2, "2024-09-11 13:00:00")],
        ["id", "ts_str"],
    ).withColumn("ts", F.to_timestamp("ts_str"))
    write_partitioned(with_event_date_parts(df, "ts"), path)
    # hive layout from event time, not wall clock
    assert os.path.isdir(os.path.join(path, "year=2024", "month=9", "day=10"))
    assert spark.read.parquet(path).count() == 2

    # dynamic partition overwrite: replacing day=10 leaves day=11 intact (K4)
    df2 = spark.createDataFrame([(99, "2024-09-10 01:00:00")], ["id", "ts_str"]) \
               .withColumn("ts", F.to_timestamp("ts_str"))
    write_partitioned(with_event_date_parts(df2, "ts"), path, mode="overwrite")
    out = spark.read.parquet(path)
    assert out.count() == 2
    assert {r["id"] for r in out.collect()} == {99, 2}


def test_single_file_per_partition(spark, tmp_path):
    """The pre-write repartition must prevent tasks×dates small files."""
    path = str(tmp_path / "compact")
    df = spark.range(0, 10_000, 1, 16).withColumn(
        "ts", F.expr("timestamp'2024-09-10 00:00:00' + make_interval(0, 0, 0, CAST(id % 3 AS INT))"))
    write_partitioned(with_event_date_parts(df, "ts"), path)
    for d in (10, 11, 12):
        part = os.path.join(path, "year=2024", "month=9", f"day={d}")
        n_files = len([f for f in os.listdir(part) if f.endswith(".parquet")])
        assert n_files == 1, f"day={d} has {n_files} files"


def test_window_advance_and_clamp(tmp_path):
    p = str(tmp_path / "w.json")
    w = st.Window(1000, 1000 + st.NORMAL_ADVANCE_S)
    st.save_window(p, w)
    w2 = st.load_window(p)
    assert w2 == w
    now = w.end_epoch + st.ACCELERATE_ADVANCE_S + 5000
    nxt, caught = st.advance_window(w2, now)
    assert nxt.start_epoch == w.end_epoch
    assert nxt.end_epoch == w.end_epoch + st.NORMAL_ADVANCE_S and not caught
    acc, caught2 = st.advance_window(nxt, nxt.end_epoch + 100, accelerate=True)
    assert acc.end_epoch == nxt.end_epoch + 100 and caught2  # clamped at now


def test_exit_code_state_machine():
    assert st.next_mode(0) == st.next_mode(7) == st.next_mode(8) == "production"
    assert st.next_mode(1) == "backfill_accelerate"


def test_compact_partitions_targets_file_sizes(spark, tmp_path):
    from league_of_legends_data_pipeline_spark import sinks

    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    df = spark.range(0, 2000).select(
        F.col("id"),
        (F.col("id") % 2 + 2024).cast("int").alias("year"),
        F.lit(1).alias("month"), F.lit(1).alias("day"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    # deliberately fragment: many tasks × every partition
    df.repartition(16).write.partitionBy("year", "month", "day").parquet(src)
    import glob
    n_src = len(glob.glob(f"{src}/**/*.parquet", recursive=True))
    assert n_src >= 20  # genuinely fragmented input

    sinks.compact_partitions(spark, src, dest, target_file_bytes=64 * 1024)
    n_dest = len(glob.glob(f"{dest}/**/*.parquet", recursive=True))
    assert n_dest < n_src
    # per-partition file count obeys ceil(bytes/target) sizing: with a 64KB
    # target and ~2KB of data per partition, each collapses to one file
    for part in glob.glob(f"{dest}/year=*/month=*/day=*"):
        assert len(glob.glob(f"{part}/*.parquet")) == 1
    # content identical
    a = spark.read.parquet(src).orderBy("id").collect()
    b = spark.read.parquet(dest).orderBy("id").collect()
    assert a == b


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    from league_of_legends_data_pipeline_spark import sinks

    orders = spark.range(0, 1000).select(
        F.col("id").alias("o_id"), (F.col("id") % 7).alias("o_v"))
    items = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("o_id"), F.col("id").alias("l_id"))
    sinks.write_bucketed(orders, "b_orders", ["o_id"], num_buckets=8,
                         sort_cols=["o_id"])
    sinks.write_bucketed(items, "b_items", ["o_id"], num_buckets=8,
                         sort_cols=["o_id"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force sort-merge (tiny test tables would broadcast, and a
        # broadcast join never uses bucketing) — the 100 TB case this
        # sink exists for is exactly the too-big-to-broadcast join
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(spark.table("b_items"), "o_id")
        assert joined.count() == 5000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located: bucketing pre-paid the shuffle
        assert "Bucketed: true" in plan
        # contrast: the same join on unbucketed data shuffles both sides
        plain = orders.join(items, "o_id")
        plain.count()
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")


def test_zorder_write_tightens_per_file_ranges_on_both_columns(spark, tmp_path):
    """Z-ordered layout must make parquet min/max footer stats selective on
    BOTH indexed columns simultaneously — the property file skipping needs.
    Measured: mean per-file coverage fraction of each column's global range,
    z-ordered vs the natural (insertion-order) layout."""
    import pyarrow.parquet as pq

    from league_of_legends_data_pipeline_spark.sinks import write_zordered

    n = 20_000
    # two independent uniform columns: natural order is sorted by a (rowid),
    # so a-ranges are tight but b-ranges cover ~everything per file
    df = spark.range(n).select(
        F.col("id").alias("a"),
        F.pmod(F.col("id") * 2654435761, F.lit(n)).alias("b"),
    )
    plain, zord = str(tmp_path / "plain"), str(tmp_path / "zord")
    df.repartitionByRange(8, "a").sortWithinPartitions("a") \
      .write.mode("overwrite").parquet(plain)
    write_zordered(df, zord, ["a", "b"], n_files=8)

    def mean_coverage(path, col):
        import os
        spans = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
            spans.append((hi - lo) / n)
        return sum(spans) / len(spans)

    # the a-sorted layout: perfect on a, useless on b
    assert mean_coverage(plain, "a") < 0.2
    assert mean_coverage(plain, "b") > 0.8
    # z-order: BOTH columns substantially tighter than the useless case,
    # neither as tight as a dedicated single-column sort — the trade.
    # Margin 0.7 (not 0.6): the z-value repartitionByRange samples its
    # boundaries, so one straggler file can widen a column's mean
    # coverage under load — observed one 0.6-flake in ~6 suite runs;
    # the property being pinned is "far below the 0.8 useless bound".
    za, zb = mean_coverage(zord, "a"), mean_coverage(zord, "b")
    assert za < 0.7 and zb < 0.7, (za, zb)


def test_merge_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    """CDC MERGE into a hive-partitioned table: update + insert + delete land
    in the touched partition; untouched partition files are byte-identical
    (never rewritten) — the partition-pruning property that makes a day of
    updates against a year of data affordable."""
    from league_of_legends_data_pipeline_spark.sinks import merge_upsert

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "2024-09-10 08:00:00", "a"),
         (2, "2024-09-11 08:00:00", "b"),
         (3, "2024-09-11 09:00:00", "c"),
         (4, "2024-09-12 08:00:00", "d")],
        ["id", "ts_str", "payload"],
    ).withColumn("ts", F.to_timestamp("ts_str")).drop("ts_str")
    write_partitioned(with_event_date_parts(base, "ts"), path)

    def listing(day):
        d = os.path.join(path, "year=2024", "month=9", f"day={day}")
        return {f: os.path.getmtime(os.path.join(d, f))
                for f in os.listdir(d) if f.endswith(".parquet")}

    before_d10, before_d12 = listing(10), listing(12)

    # day=11: update id=2, delete id=3, insert id=5 with a NEW column
    updates = spark.createDataFrame(
        [(2, "2024-09-11 08:00:00", "b2", "note-b", False),
         (3, "2024-09-11 09:00:00", None, None, True),
         (5, "2024-09-11 10:00:00", "e", "note-e", False)],
        ["id", "ts_str", "payload", "note", "_deleted"],
    ).withColumn("ts", F.to_timestamp("ts_str")).drop("ts_str")
    merge_upsert(spark, with_event_date_parts(updates, "ts"), path,
                 key_cols=["id"], delete_col="_deleted")

    out = read_evolved(spark, path)
    rows = {r["id"]: r.asDict() for r in out.collect()}
    assert set(rows) == {1, 2, 4, 5}              # 3 deleted, 5 inserted
    assert rows[2]["payload"] == "b2" and rows[2]["note"] == "note-b"
    assert rows[5]["note"] == "note-e"
    assert rows[1]["note"] is None                # schema evolved, null-padded
    # untouched partitions: same files, same mtimes — provably not rewritten
    assert listing(10) == before_d10
    assert listing(12) == before_d12


def test_snapshot_table_time_travel_and_rollback(spark, tmp_path):
    """Versioned table: immutable data files + one atomic manifest swap per
    commit. Time travel reproduces any historic snapshot; rollback is a new
    metadata-only commit; an overwrite never disturbs earlier readers."""
    from league_of_legends_data_pipeline_spark.snapshots import (
        snapshot_read, snapshot_rollback, snapshot_versions, snapshot_write,
    )

    tbl = str(tmp_path / "tbl")
    v0 = snapshot_write(spark.createDataFrame([(1, "a")], ["id", "x"]), tbl)
    v1 = snapshot_write(spark.createDataFrame([(2, "b")], ["id", "x"]), tbl)
    assert (v0, v1) == (0, 1)
    assert sorted(r["id"] for r in snapshot_read(spark, tbl).collect()) == [1, 2]
    assert [r["id"] for r in snapshot_read(spark, tbl, 0).collect()] == [1]

    # overwrite starts fresh but v0/v1 stay exactly readable
    v2 = snapshot_write(spark.createDataFrame([(9, "z")], ["id", "x"]),
                        tbl, mode="overwrite")
    assert [r["id"] for r in snapshot_read(spark, tbl).collect()] == [9]
    assert sorted(r["id"] for r in snapshot_read(spark, tbl, v1).collect()) == [1, 2]

    # rollback to v1: new commit, history intact, latest == v1 contents
    v3 = snapshot_rollback(tbl, v1)
    assert snapshot_versions(tbl) == [0, 1, 2, 3]
    assert sorted(r["id"] for r in snapshot_read(spark, tbl).collect()) == [1, 2]
    assert [r["id"] for r in snapshot_read(spark, tbl, v2).collect()] == [9]
    assert v3 == 3


def test_snapshot_diff_change_data_feed(spark, tmp_path):
    """CDF between versions: insert / delete / update pre+post images."""
    from league_of_legends_data_pipeline_spark.snapshots import (
        snapshot_diff, snapshot_write,
    )

    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["id", "x"]), tbl)
    snapshot_write(spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], ["id", "x"]), tbl, mode="overwrite")

    rows = {(r["id"], r["_change_type"]): r["x"]
            for r in snapshot_diff(spark, tbl, 0, 1, ["id"]).collect()}
    assert rows == {
        (2, "update_preimage"): "b", (2, "update_postimage"): "B",
        (3, "delete"): "c", (4, "insert"): "d",
    }
