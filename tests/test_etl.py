"""End-to-end golden tests for the silver ETL plans (SURVEY §3.2) on the
deterministic bronze fixtures, with pure-Python oracles re-deriving the
expected rows from the same JSON."""

import json
import os

import pytest
from pyspark.sql import functions as F

from league_of_legends_data_pipeline_spark.plans.etl import (
    dedup_matchlist, event_rows, leftover_matchlist, player_rows, rank_rows,
    timeline_rows, top_players,
)
from league_of_legends_data_pipeline_spark.sources.readers import (
    read_envelopes, read_rank_map, route, unwrap_matches,
)


def load_raw(fixtures_dir, sub):
    out = []
    for root, _, files in os.walk(os.path.join(fixtures_dir, sub)):
        for fn in sorted(files):
            with open(os.path.join(root, fn)) as f:
                out.append(json.load(f))
    return out


@pytest.fixture(scope="module")
def matches_df(spark, fixtures_dir):
    env = read_envelopes(spark, os.path.join(fixtures_dir, "matches"))
    return unwrap_matches(env)


@pytest.fixture(scope="module")
def timelines_df(spark, fixtures_dir):
    env = read_envelopes(spark, os.path.join(fixtures_dir, "match_timelines"))
    return unwrap_matches(env)


def test_routing(spark, fixtures_dir):
    env = read_envelopes(
        spark, [os.path.join(fixtures_dir, "matches"),
                os.path.join(fixtures_dir, "match_timelines")])
    routed = route(env)
    n_match_files = sum(len(fs) for _, _, fs in os.walk(os.path.join(fixtures_dir, "matches")))
    n_tl_files = sum(len(fs) for _, _, fs in os.walk(os.path.join(fixtures_dir, "match_timelines")))
    assert routed["matches"].count() == n_match_files
    assert routed["timelines"].count() == n_tl_files
    assert routed["ranks"].count() == 0


def test_player_rows_shape_and_values(matches_df, fixtures_dir):
    out = player_rows(matches_df)
    rows = {(r["matchId"], r["puuid"]): r.asDict() for r in out.collect()}

    envs = load_raw(fixtures_dir, "matches")
    raw = [m for e in envs for m in e["matches"]]
    # one row per (match, participant) incl. the duplicated match file
    assert len(out.collect()) == 10 * len(raw)

    m0 = raw[0]
    p0 = m0["info"]["participants"][0]
    key = (m0["metadata"]["matchId"], p0["puuid"])
    r = rows[key]
    # graft (P5)
    assert r["gameCreation"] == m0["info"]["gameCreation"]
    assert r["gameVersion"] == "14.18.1"
    # flatten + prefix strip (P1/P4): challenges_kda → kda;
    # challenges_kills collides with participant kills → keeps prefixed name
    assert r["kda"] == p0["challenges"]["kda"]
    assert r["kills"] == p0["kills"]
    assert r["challenges_kills"] == p0["challenges"]["kills"]
    # blacklist (F4): legendaryItemUsed / SWARM / playerAugment dropped
    assert not [c for c in r if "legendaryItemUsed" in c or "SWARM" in c
                or "playerAugment" in c]
    # perk pivot (P2)
    assert r["Primary_slot_1_perk"] == p0["perks"]["styles"][0]["selections"][0]["perk"]
    assert r["statPerks_offense"] == p0["perks"]["statPerks"]["offense"]
    # bigint passthrough (no INT/BIGINT split)
    assert r["totalPlayTime"] == p0["totalPlayTime"] > 2**31


def test_player_rows_schema_drift(matches_df):
    # newStatFromPatch exists only in seq%3==0 matches → nullable elsewhere
    out = player_rows(matches_df)
    assert "newStatFromPatch" in out.columns
    n_null = out.filter(F.col("newStatFromPatch").isNull()).count()
    assert 0 < n_null < out.count()


def test_timeline_rows_all_frames(timelines_df, fixtures_dir):
    """The reference emits only the LAST frame's rows (indentation bug,
    SURVEY §7.5); we implement the intent — all frames × 10 participants."""
    out = timeline_rows(timelines_df)
    envs = load_raw(fixtures_dir, "match_timelines")
    raw = [m for e in envs for m in e["matches"]]
    want_rows = sum(len(m["info"]["frames"]) * 10 for m in raw)
    assert out.count() == want_rows

    m0 = raw[0]
    mid = m0["metadata"]["matchId"]
    lookup = {p["participantId"]: p["puuid"] for p in m0["info"]["participants"]}
    r = out.filter((F.col("matchId") == mid) & (F.col("timestamp") == 60000)
                   & (F.col("participantId") == 3)).collect()[0]
    pf = m0["info"]["frames"][1]["participantFrames"]["3"]
    assert r["puuid"] == lookup[3]          # J1 broadcast lookup
    assert r["totalGold"] == pf["totalGold"]
    assert r["abilityPower"] == pf["championStats"]["abilityPower"]  # P3 splat
    assert r["totalDamageDone"] == pf["damageStats"]["totalDamageDone"]
    assert r["x"] == pf["position"]["x"]


def test_event_rows_event_time_partitioning(timelines_df, fixtures_dir):
    out = event_rows(timelines_df)
    envs = load_raw(fixtures_dir, "match_timelines")
    raw = [m for e in envs for m in e["matches"]]
    want = sum(len(f["events"]) for m in raw for f in m["info"]["frames"])
    assert out.count() == want

    # ms/s heuristic: every sec-scale-anchored match (seq%4==3) must land on
    # the same calendar date as its ms-scale twin would
    import datetime
    for m in raw:
        anchor = m["info"]["frames"][0]["events"][0]["realTimestamp"]
        anchor_s = anchor // 1000 if anchor > 10_000_000_000 else anchor
        d = datetime.datetime.fromtimestamp(anchor_s, datetime.timezone.utc)
        got = out.filter(F.col("matchId") == m["metadata"]["matchId"]) \
                 .select("year", "month", "day").distinct().collect()
        assert (got[0]["year"], got[0]["month"]) == (d.year, d.month)

    # heterogeneous union: type-specific sparse fields present and nullable
    assert {"itemId", "killerId", "victimId"} <= set(out.columns)
    kills = out.filter(F.col("type") == "CHAMPION_KILL")
    if kills.count():
        assert kills.filter(F.col("killerId").isNull()).count() == 0
        assert kills.filter(F.col("itemId").isNotNull()).count() == 0


def test_rank_map_explode_and_top_players(spark, fixtures_dir):
    ranks = rank_rows(read_rank_map(
        spark, os.path.join(fixtures_dir, "player-maps", "ranked_map.json")))
    with open(os.path.join(fixtures_dir, "player-maps", "ranked_map.json")) as f:
        raw = json.load(f)
    assert ranks.count() == len(raw)
    one = ranks.filter(F.col("puuid") == "puuid-0000").collect()[0]
    assert one["leaguePoints"] == raw["puuid-0000"]["leaguePoints"]
    assert one["tier"] == raw["puuid-0000"]["tier"]

    top = top_players(ranks, 20).collect()
    assert len(top) == 20
    # L3: ordered by tier priority then LP desc — verify against python sort
    order = {"CHALLENGER": 0, "GRANDMASTER": 1, "MASTER": 2, "DIAMOND": 3}
    want = sorted(raw.items(), key=lambda kv: (order[kv[1]["tier"]],
                                               -kv[1]["leaguePoints"], kv[0]))[:20]
    assert [r["puuid"] for r in top] == [k for k, _ in want]


def test_vertical_split_roundtrip(matches_df):
    from league_of_legends_data_pipeline_spark.plans.etl import (
        reassemble_split, vertical_split,
    )

    wide = player_rows(matches_df).dropDuplicates(["matchId", "puuid"])
    parts = vertical_split(wide)
    assert set(parts) == {"basicStats", "challenges", "legendaryItems",
                          "perkMissionStats"}
    # every non-key column lands in exactly one split (P7), keys in all (P8)
    key_cols = {"matchId", "championName"}
    seen = []
    for name, df in parts.items():
        assert key_cols <= set(df.columns)
        seen.extend(c for c in df.columns if c not in key_cols)
    assert sorted(seen) == sorted(c for c in wide.columns if c not in key_cols)
    assert not [c for c in parts["legendaryItems"].columns
                if c not in key_cols]  # blacklist removed these upstream
    assert any(c.startswith("Primary") for c in parts["perkMissionStats"].columns)

    # J3 round-trip: reassembly on (matchId, championName) restores the
    # wide multiset when the key is unique (filter dup champs per match)
    from pyspark.sql import Window, functions as F
    uniq = wide.withColumn(
        "__n", F.count(F.lit(1)).over(
            Window.partitionBy("matchId", "championName"))
    ).filter(F.col("__n") == 1).drop("__n")
    parts_u = vertical_split(uniq)
    back = reassemble_split(parts_u)
    assert back.count() == uniq.count()
    assert set(back.columns) == set(uniq.columns)


def test_matchlist_dedup_and_leftovers(spark, fixtures_dir):
    with open(os.path.join(fixtures_dir, "matchlists", "matchlist.json")) as f:
        raw = json.load(f)["matchlist"]
    ml = spark.createDataFrame([(m,) for m in raw], ["matchId"])
    distinct = dedup_matchlist(ml)
    assert distinct.count() == len(set(raw)) < len(raw)

    processed = spark.createDataFrame([(m,) for m in sorted(set(raw))[:3]], ["matchId"])
    left = leftover_matchlist(ml, processed)
    assert left.count() == len(set(raw)) - 3
