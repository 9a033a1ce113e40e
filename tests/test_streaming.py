"""Structured-Streaming ingest (T1/T3/T5): file stream + availableNow +
foreachBatch demux, exactly-once across restarts via checkpoint."""

import os

from pyspark.sql import functions as F

from league_of_legends_data_pipeline_spark.sources.fixtures import (
    make_match, write_fixtures,
)
from league_of_legends_data_pipeline_spark.streaming.pipeline import (
    start_ingest, start_ranks_ingest,
)


def _envelope_schema(spark, fixtures_dir):
    # union schema over both envelope kinds (streaming needs it declared)
    return spark.read.option("recursiveFileLookup", "true").json(
        [os.path.join(fixtures_dir, "matches"),
         os.path.join(fixtures_dir, "match_timelines")]).schema


def test_stream_ingest_available_now(spark, fixtures_dir, tmp_path):
    out_dir = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")
    schema = _envelope_schema(spark, fixtures_dir)
    glob = os.path.join(fixtures_dir, "{matches,match_timelines}")

    q = start_ingest(spark, glob, schema, out_dir, ckpt)
    q.awaitTermination(120)

    player = spark.read.option("mergeSchema", "true").parquet(f"{out_dir}/player_data")
    timeline = spark.read.option("mergeSchema", "true").parquet(f"{out_dir}/timeline_data")
    events = spark.read.option("mergeSchema", "true").parquet(f"{out_dir}/events")
    # 13 match docs total but one is a replayed duplicate → 12 × 10 rows
    assert player.select("matchId").distinct().count() == 12
    assert player.count() == 120
    assert timeline.count() == 6 * 5 * 10  # 6 timelines × 5 frames × 10 players
    assert events.count() > 0

    # restart with same checkpoint and no new files → no double-processing
    q2 = start_ingest(spark, glob, schema, out_dir, ckpt)
    q2.awaitTermination(120)
    assert spark.read.option("mergeSchema", "true") \
        .parquet(f"{out_dir}/player_data").count() == 120


def test_stream_ranks_route(spark, fixtures_dir, tmp_path):
    import json

    out_dir = str(tmp_path / "silver_r")
    ckpt = str(tmp_path / "ckpt_r")
    glob = os.path.join(fixtures_dir, "player-maps")
    start_ranks_ingest(spark, glob, out_dir, ckpt).awaitTermination(120)
    ranks = spark.read.parquet(f"{out_dir}/player_ranks_data")
    with open(os.path.join(fixtures_dir, "player-maps", "ranked_map.json")) as f:
        raw = json.load(f)
    assert ranks.count() == len(raw)
    r = ranks.filter(F.col("puuid") == "puuid-0001").collect()[0]
    assert r["tier"] == raw["puuid-0001"]["tier"]
    # restart: checkpoint prevents re-ingest
    start_ranks_ingest(spark, glob, out_dir, ckpt).awaitTermination(120)
    assert spark.read.parquet(f"{out_dir}/player_ranks_data").count() == len(raw)


def test_stream_picks_up_new_files_only(spark, fixtures_dir, tmp_path):
    import json
    import random

    out_dir = str(tmp_path / "silver2")
    ckpt = str(tmp_path / "ckpt2")
    src = str(tmp_path / "bronze2")
    write_fixtures(src, n_matches=4, matches_per_file=2, n_timelines=2)
    schema = _envelope_schema(spark, src)
    glob = os.path.join(src, "{matches,match_timelines}")

    start_ingest(spark, glob, schema, out_dir, ckpt).awaitTermination(120)
    n0 = spark.read.parquet(f"{out_dir}/player_data").count()

    # drop one NEW match file; only its rows are appended on the next run
    rng = random.Random(7)
    newm = make_match(rng, 900)
    extra = os.path.join(src, "matches", "year=2024", "month=09", "day=29")
    os.makedirs(extra, exist_ok=True)
    with open(os.path.join(extra, "batch_x_matches.json"), "w") as f:
        json.dump({
            "metadata": {"upload_timestamp": "2024-09-29T00:00:00+00:00",
                         "match_count": 1, "batch_id": "x",
                         "s3_key": "matches/.../batch_x_matches.json",
                         "data_collection_type": "match"},
            "matches": [newm],
        }, f)

    start_ingest(spark, glob, schema, out_dir, ckpt).awaitTermination(120)
    out = spark.read.option("mergeSchema", "true").parquet(f"{out_dir}/player_data")
    assert out.count() == n0 + 10
    assert out.filter(F.col("matchId") == newm["metadata"]["matchId"]).count() == 10

    # cross-batch replay (T5): re-deliver the SAME match in yet another
    # file in a later micro-batch — the sink anti-join must reject it
    replay_dir = os.path.join(src, "matches", "year=2024", "month=09", "day=30")
    os.makedirs(replay_dir, exist_ok=True)
    with open(os.path.join(replay_dir, "batch_y_matches.json"), "w") as f:
        json.dump({
            "metadata": {"upload_timestamp": "2024-09-30T00:00:00+00:00",
                         "match_count": 1, "batch_id": "y",
                         "s3_key": "matches/.../batch_y_matches.json",
                         "data_collection_type": "match"},
            "matches": [newm],
        }, f)
    start_ingest(spark, glob, schema, out_dir, ckpt).awaitTermination(120)
    out2 = spark.read.option("mergeSchema", "true").parquet(f"{out_dir}/player_data")
    assert out2.count() == n0 + 10  # no double-insert
    assert out2.filter(F.col("matchId") == newm["metadata"]["matchId"]).count() == 10


def test_per_key_cap_stateful_across_batches(spark, tmp_path):
    """applyInPandasWithState quota: state survives micro-batches — a key
    whose quota fills in batch 1 admits nothing from batch 2."""
    import json
    import time

    from league_of_legends_data_pipeline_spark.streaming.stateful import per_key_cap

    src = tmp_path / "docs"
    src.mkdir()
    # two files, forced into separate micro-batches via maxFilesPerTrigger=1
    # (file-source ordering is by modification time — make it unambiguous)
    f1 = src / "a.json"
    f1.write_text("\n".join(json.dumps({"doc_id": i, "lang": "en"})
                            for i in range(10)))
    time.sleep(1.1)
    f2 = src / "b.json"
    f2.write_text("\n".join(
        [json.dumps({"doc_id": 100 + i, "lang": "en"}) for i in range(10)]
        + [json.dumps({"doc_id": 200 + i, "lang": "fr"}) for i in range(4)]))

    stream = (spark.readStream.schema("doc_id long, lang string")
              .option("maxFilesPerTrigger", 1).json(str(src)))
    capped = per_key_cap(stream, ["lang"], "doc_id", cap=6)
    q = (capped.writeStream.format("memory").queryName("cap_test")
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(120)

    rows = spark.table("cap_test").collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    # en filled its quota from the older file (batch 1), smallest ids first
    assert sorted(by_lang["en"]) == [0, 1, 2, 3, 4, 5]
    # fr arrived only in batch 2 and is under quota
    assert sorted(by_lang["fr"]) == [200, 201, 202, 203]


def test_dedup_within_watermark_bounds_state(spark, tmp_path):
    import json
    import os
    import time

    from league_of_legends_data_pipeline_spark.streaming.pipeline import (
        dedup_stream_within_watermark,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")

    def write_file(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    # batch 1: m1 twice (in-window replay) + m2
    write_file("a.json", [
        {"matchId": "m1", "ts": "2024-01-01T10:00:00.000Z", "v": 1},
        {"matchId": "m1", "ts": "2024-01-01T10:01:00.000Z", "v": 2},
        {"matchId": "m2", "ts": "2024-01-01T10:02:00.000Z", "v": 3},
    ])
    schema = "matchId STRING, ts STRING, v LONG"
    stream = (spark.readStream.schema(schema).json(src)
              .withColumn("ts", F.to_timestamp("ts")))
    deduped = dedup_stream_within_watermark(stream, ["matchId"], "ts", "10 minutes")
    out = str(tmp_path / "out")
    # file sink (not memory): supports checkpoint recovery, so the dedup
    # state genuinely persists across the restart below
    q = (deduped.writeStream.format("parquet").option("path", out)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)

    # batch 2 (restart from checkpoint): m1 replayed ACROSS batches but
    # within the watermark delay → still deduped; m3 is new; watermark
    # state from batch 1 persisted via the checkpoint
    write_file("b.json", [
        {"matchId": "m1", "ts": "2024-01-01T10:03:00.000Z", "v": 4},
        {"matchId": "m3", "ts": "2024-01-01T10:04:00.000Z", "v": 5},
    ])
    q = (deduped.writeStream.format("parquet").option("path", out)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)

    rows = {r["matchId"]: r["v"] for r in spark.read.parquet(out).collect()}
    assert set(rows) == {"m1", "m2", "m3"}
    assert rows["m1"] == 1  # first occurrence won; replays dropped


def test_decayed_counter_stream_matches_batch(spark, tmp_path):
    """Batch/stream duality: the keyed-state decayed counter over two
    micro-batches must converge to the batch decayed_group_sum result on
    the same rows (within the batch side's 1e-6 micro-unit rounding)."""
    import json
    import time

    from league_of_legends_data_pipeline_spark.operators.joins import (
        decayed_group_sum,
    )
    from league_of_legends_data_pipeline_spark.streaming.stateful import (
        decayed_counter,
    )

    rows = [
        {"user_id": 1, "ts": "2024-01-31 00:00:00", "value": 10.0},
        {"user_id": 1, "ts": "2024-01-18 12:00:00", "value": 4.0},
        {"user_id": 2, "ts": "2024-01-25 06:30:00", "value": -3.0},
        {"user_id": 1, "ts": "2024-01-05 00:00:00", "value": 7.5},
        {"user_id": 2, "ts": "2024-01-29 18:00:00", "value": 2.25},
        {"user_id": 3, "ts": "2024-01-02 03:00:00", "value": 100.0},
    ]
    src = tmp_path / "events"
    src.mkdir()
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows[:3]))
    time.sleep(1.1)
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in rows[3:]))

    schema = "user_id long, ts timestamp, value double"
    lam, t_ref = 0.099021, "2024-02-01 00:00:00"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).json(str(src)))
    out = decayed_counter(stream, ["user_id"], "ts", "value", t_ref, lam)
    q = (out.writeStream.format("memory").queryName("decay_test")
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(120)

    # latest emission per key = highest n_events
    emitted = {}
    for r in spark.table("decay_test").collect():
        prev = emitted.get(r["user_id"])
        if prev is None or r["n_events"] > prev["n_events"]:
            emitted[r["user_id"]] = r

    import datetime as dt

    batch_df = spark.createDataFrame(
        [(r["user_id"],
          dt.datetime.strptime(r["ts"], "%Y-%m-%d %H:%M:%S"),
          r["value"]) for r in rows], schema)
    want = {r["user_id"]: r for r in decayed_group_sum(
        batch_df, "user_id", "value", "ts", t_ref, lam).collect()}

    assert set(emitted) == set(want) == {1, 2, 3}
    for uid in want:
        assert emitted[uid]["n_events"] == want[uid]["n_events"]
        # batch side rounds per-event micro-units; stream sums raw doubles
        assert abs(emitted[uid]["decayed_sum"] - want[uid]["decayed_sum"]) \
            < 1e-5 * max(1.0, abs(want[uid]["decayed_sum"]))
    # state really carried across batches: user 1 saw rows in both files
    assert emitted[1]["n_events"] == 3


def test_stream_stream_interval_join_attribution(spark, tmp_path):
    """Impression ⋈ click-within-10-min as a real two-stream join: both
    sides watermarked, the time bound in the join condition (bounded
    state), matches exactly the batch interval join on the same data."""
    import json
    import os

    from league_of_legends_data_pipeline_spark.streaming.pipeline import (
        stream_interval_join,
    )

    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    os.makedirs(imp_dir)
    os.makedirs(clk_dir)

    def write(d, name, rows):
        with open(os.path.join(d, name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    write(imp_dir, "a.json", [
        {"user": "u1", "ad": "a1", "ts": "2024-01-01T10:00:00.000Z"},
        {"user": "u2", "ad": "a2", "ts": "2024-01-01T10:01:00.000Z"},
        {"user": "u3", "ad": "a3", "ts": "2024-01-01T10:02:00.000Z"},
    ])
    write(clk_dir, "b.json", [
        # u1 clicks 5 min after impression -> match
        {"user": "u1", "ts": "2024-01-01T10:05:00.000Z"},
        # u2 clicks 20 min after -> outside the interval, no match
        {"user": "u2", "ts": "2024-01-01T10:21:00.000Z"},
        # u3 clicks 1 min BEFORE its impression -> no match
        {"user": "u3", "ts": "2024-01-01T10:01:00.000Z"},
    ])
    imp_schema = "user STRING, ad STRING, ts STRING"
    clk_schema = "user STRING, ts STRING"
    imps = (spark.readStream.schema(imp_schema).json(imp_dir)
            .withColumn("imp_ts", F.to_timestamp("ts")).drop("ts"))
    clks = (spark.readStream.schema(clk_schema).json(clk_dir)
            .withColumn("clk_ts", F.to_timestamp("ts")).drop("ts"))
    joined = stream_interval_join(imps, clks, ["user"], "imp_ts", "clk_ts",
                                  max_delay="10 minutes",
                                  watermark="10 minutes")
    # the join emits each equi-key ONCE — unqualified references resolve
    assert joined.columns.count("user") == 1
    out = joined.select("user", "ad", "imp_ts", "clk_ts")
    name = "attrib_join"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    rows = spark.table(name).collect()
    assert [(r["user"], r["ad"]) for r in rows] == [("u1", "a1")]
    # batch dual: identical result from the same condition on static reads
    bi = (spark.read.schema(imp_schema).json(imp_dir)
          .withColumn("imp_ts", F.to_timestamp("ts")).drop("ts"))
    bc = (spark.read.schema(clk_schema).json(clk_dir)
          .withColumn("clk_ts", F.to_timestamp("ts")).drop("ts"))
    batch = (bi.alias("l").join(
        bc.alias("r"),
        (F.col("l.user") == F.col("r.user"))
        & (F.col("clk_ts") >= F.col("imp_ts"))
        & (F.col("clk_ts") <= F.col("imp_ts") + F.expr("INTERVAL 10 minutes")),
        "inner").select("l.user", "ad", "imp_ts", "clk_ts").collect())
    assert sorted((r["user"], r["ad"]) for r in batch) \
        == sorted((r["user"], r["ad"]) for r in rows)


def test_foreachbatch_streaming_merge_equals_batch_merges(spark, tmp_path):
    """Streaming CDC upserts applied through foreachBatch + merge_upsert
    must land the same final table as applying the same batches
    sequentially in batch mode — the T-tier 'streaming MERGE sink'
    (stock Structured Streaming has no MERGE sink; foreachBatch is the
    documented composition point).

    Two update files arrive as a stream: batch 1 inserts keys 1-3,
    batch 2 updates key 2, deletes key 3, inserts key 4. Final table:
    keys {1, 2(updated), 4}.
    """
    import pyspark.sql.functions as F

    from league_of_legends_data_pipeline_spark.sinks import merge_upsert

    target = str(tmp_path / "target")
    src = str(tmp_path / "updates")
    b1 = spark.createDataFrame(
        [(1, "a", False), (2, "b", False), (3, "c", False)],
        "k long, v string, is_delete boolean") \
        .withColumn("year", F.lit(2026)).withColumn("month", F.lit(1)) \
        .withColumn("day", F.lit(1))
    b2 = spark.createDataFrame(
        [(2, "b2", False), (3, None, True), (4, "d", False)],
        "k long, v string, is_delete boolean") \
        .withColumn("year", F.lit(2026)).withColumn("month", F.lit(1)) \
        .withColumn("day", F.lit(1))
    # two files, mtime-ordered so maxFilesPerTrigger=1 yields two batches
    import os
    b1.coalesce(1).write.mode("append").parquet(src)
    for p in os.listdir(src):
        if p.endswith(".parquet"):
            os.utime(os.path.join(src, p), (1_000_000, 1_000_000))
    b2.coalesce(1).write.mode("append").parquet(src)

    def apply_batch(batch_df, batch_id):
        merge_upsert(batch_df.sparkSession, batch_df, target,
                     key_cols=["k"], delete_col="is_delete")

    q = (spark.readStream.schema(b1.schema)
         .option("maxFilesPerTrigger", 1).parquet(src)
         .writeStream.foreachBatch(apply_batch)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(300)

    final = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert final == {1: "a", 2: "b2", 4: "d"}


def test_ewma_state_carries_across_batches(spark, tmp_path):
    """ewma_state: the fold's z survives micro-batch boundaries — day 3
    arriving in batch 2 continues the recursion from batch 1's state,
    reproducing the batch recursion z1=x1, z_t = .2x + .8z exactly."""
    import json
    import time

    from league_of_legends_data_pipeline_spark.streaming.stateful import (
        ewma_state,
    )

    src = tmp_path / "ev"
    src.mkdir()
    # batch 1: day1 x10 rows, day2 x20 rows; batch 2: day3 x30 rows
    f1 = src / "a.json"
    f1.write_text("\n".join(
        [json.dumps({"event_type": "k", "day": "2024-01-01"})] * 10
        + [json.dumps({"event_type": "k", "day": "2024-01-02"})] * 20))
    time.sleep(1.1)
    f2 = src / "b.json"
    f2.write_text("\n".join(
        [json.dumps({"event_type": "k", "day": "2024-01-03"})] * 30))

    stream = (spark.readStream.schema("event_type string, day string")
              .option("maxFilesPerTrigger", 1).json(str(src)))
    out = ewma_state(stream, ["event_type"], "day", lam=0.2)
    q = (out.writeStream.format("memory").queryName("ewma_test")
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(120)

    rows = {r.day: r for r in spark.table("ewma_test").collect()}
    # z1 = 10 (seed); z2 = .2*20 + .8*10 = 12; z3 = .2*30 + .8*12 = 15.6
    assert rows["2024-01-01"].ewma == 10.0 and rows["2024-01-01"].n == 10
    assert rows["2024-01-02"].ewma == 12.0
    assert rows["2024-01-03"].ewma == 0.2 * 30 + 0.8 * 12.0


def test_ewma_state_rejects_out_of_order_day(spark, tmp_path):
    """r9 advice: the EWMA fold is order-dependent; a micro-batch
    delivering a day at or before the last folded one must raise (the
    state now carries last_day), not silently diverge from the batch
    recursion."""
    import json
    import time

    import pytest

    from league_of_legends_data_pipeline_spark.streaming.stateful import (
        ewma_state,
    )

    src = tmp_path / "ev"
    src.mkdir()
    # batch 1 folds day 2; batch 2 then delivers day 1 — out of order
    f1 = src / "a.json"
    f1.write_text(json.dumps({"event_type": "k", "day": "2024-01-02"}))
    time.sleep(1.1)
    f2 = src / "b.json"
    f2.write_text(json.dumps({"event_type": "k", "day": "2024-01-01"}))

    stream = (spark.readStream.schema("event_type string, day string")
              .option("maxFilesPerTrigger", 1).json(str(src)))
    out = ewma_state(stream, ["event_type"], "day", lam=0.2)
    q = (out.writeStream.format("memory").queryName("ewma_ooo_test")
         .outputMode("append").trigger(availableNow=True).start())
    with pytest.raises(Exception, match="out-of-order day"):
        q.awaitTermination(120)


def test_episode_state_timeout_and_gap_paths(spark):
    """q310 at sf0.001: the stream must emit through BOTH paths (gap
    episodes in the data batch, timeout episodes in the no-data batch
    after the watermark advances), never emit a still-open episode
    (end_day within gap+1 of the horizon unless gap-closed), and be
    deterministic across runs."""
    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    # sf0.01 for the path mix: sf0.001's corpus has no island ending
    # 2+ days before the horizon, so its timeout path is legitimately
    # empty (the oracle agrees — 45 gap rows)
    rows = (QUERIES["q310_streaming_episodes"]
            .spark(spark, "/root/testdata/sf0.01").collect())
    assert rows, "no episodes emitted"
    by = {r.closed_by for r in rows}
    assert by == {"gap", "timeout"}, f"missing an emission path: {by}"

    ev = pd.read_parquet("/root/testdata/sf0.01/events.parquet")
    horizon = ev.ts.dt.normalize().max()
    for r in rows:
        end = pd.Timestamp(r.end_day)
        start = pd.Timestamp(r.start_day)
        assert start <= end
        assert r.n_days >= 1 and r.n_events >= r.n_days
        # consecutive-day runs: span == n_days - 1 (gap 1 splits more)
        assert (end - start).days == r.n_days - 1
        if r.closed_by == "timeout":
            # watermark-flushed: horizon must be >= end + 2 days
            assert (horizon - end).days >= 2

    again = (QUERIES["q310_streaming_episodes"]
             .spark(spark, "/root/testdata/sf0.01").collect())
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def _episode_stream_from_days(spark, src_dir, rows):
    """Build the episode_state input stream from one json file per
    micro-batch (maxFilesPerTrigger=1 keeps file order = batch order)."""
    import json
    import time

    src_dir.mkdir()
    for i, batch in enumerate(rows):
        f = src_dir / f"b{i:02d}.json"
        f.write_text("\n".join(json.dumps(r) for r in batch))
        time.sleep(1.1)  # distinct mtimes pin the batch order

    stream = (spark.readStream.schema("user_id long, day string")
              .option("maxFilesPerTrigger", 1).json(str(src_dir)))
    day_ts = F.to_timestamp("day")
    return (stream.select(
        "user_id", day_ts.alias("day_ts"),
        F.datediff(day_ts.cast("date"), F.lit("1970-01-01"))
        .cast("long").alias("epoch_day"),
        F.lit(1).cast("long").alias("one"))
        .withWatermark("day_ts", "0 seconds"))


def test_episode_state_drops_late_day(spark, tmp_path):
    """r11 advice: a later micro-batch delivering a day BEFORE the
    episode's last folded day must be DROPPED, not raise —
    applyInPandasWithState does not filter pre-watermark rows, so a
    raise turns one duplicated/late upstream event into a poison pill
    that crashes the query on every restart. The stray day must also
    not leak into n_events (it belongs to an earlier episode)."""
    from league_of_legends_data_pipeline_spark.streaming.stateful import (
        episode_state,
    )

    stream = _episode_stream_from_days(spark, tmp_path / "ev", [
        [{"user_id": 1, "day": "2024-01-05"}],
        [{"user_id": 1, "day": "2024-01-03"}],   # late: must be dropped
        [{"user_id": 1, "day": "2024-01-09"}],   # gap-closes day-5 episode
    ])
    out = episode_state(stream, "user_id", "epoch_day", "one", gap_days=1)
    q = (out.writeStream.format("memory").queryName("episode_late_drop")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM episode_late_drop").collect()
    assert len(got) == 1, got
    r = got[0]
    # the day-5 episode closes by gap with ONLY its own event counted —
    # the late day-3 row neither extended it nor inflated n_events
    assert (r.start_day, r.end_day, r.n_events, r.n_days, r.closed_by) \
        == ("2024-01-05", "2024-01-05", 1, 1, "gap")


def test_episode_state_duplicate_day_folds_events_only(spark, tmp_path):
    """Same-day redelivery across micro-batches (ed == last_ed) is valid
    at-least-once input: it adds events to the open episode but must not
    extend n_days or move end_day (the docstring's promised multi-batch
    case)."""
    from league_of_legends_data_pipeline_spark.streaming.stateful import (
        episode_state,
    )

    stream = _episode_stream_from_days(spark, tmp_path / "ev", [
        [{"user_id": 1, "day": "2024-01-05"},
         {"user_id": 1, "day": "2024-01-06"}],
        [{"user_id": 1, "day": "2024-01-06"}],   # duplicate of the fold day
        [{"user_id": 1, "day": "2024-01-09"}],   # gap-closes the episode
    ])
    out = episode_state(stream, "user_id", "epoch_day", "one", gap_days=1)
    q = (out.writeStream.format("memory").queryName("episode_dup_day")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM episode_dup_day").collect()
    assert len(got) == 1, got
    r = got[0]
    # 3 events (two distinct days + one redelivery), but n_days stays 2
    assert (r.start_day, r.end_day, r.n_events, r.n_days, r.closed_by) \
        == ("2024-01-05", "2024-01-06", 3, 2, "gap")
