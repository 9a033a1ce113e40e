"""Gold-layer analytics over fixture-built silver tables, checked against
DuckDB on the same rows (end-to-end: bronze JSON → silver → gold)."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from league_of_legends_data_pipeline_spark.plans.etl import (
    player_rows, rank_rows, timeline_rows,
)
from league_of_legends_data_pipeline_spark.plans.gold import (
    champion_winrate, gold_diff_timeline, match_id_time_regression,
    rank_enriched_players,
)
from league_of_legends_data_pipeline_spark.sources.readers import (
    read_envelopes, read_rank_map, unwrap_matches,
)


@pytest.fixture(scope="module")
def silver(spark, fixtures_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("silver"))
    m = unwrap_matches(read_envelopes(spark, os.path.join(fixtures_dir, "matches")))
    t = unwrap_matches(read_envelopes(spark, os.path.join(fixtures_dir, "match_timelines")))
    player_rows(m).dropDuplicates(["matchId", "puuid"]).write.parquet(f"{out}/player_data")
    timeline_rows(t).write.parquet(f"{out}/timeline_data")
    rank_rows(read_rank_map(
        spark, os.path.join(fixtures_dir, "player-maps", "ranked_map.json"))
    ).write.parquet(f"{out}/player_ranks_data")
    return out


def _duck(silver):
    con = duckdb.connect()
    for t in ("player_data", "timeline_data", "player_ranks_data"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{silver}/{t}/*.parquet'")
    return con


def test_champion_winrate_matches_duckdb(spark, silver):
    got = champion_winrate(spark.read.parquet(f"{silver}/player_data")).collect()
    want = _duck(silver).execute("""
        SELECT championName, count(*) games,
               round(avg(CAST(win AS DOUBLE)), 6) win_rate,
               round(avg((kills + assists) / greatest(deaths, 1)), 6) avg_kda
        FROM player_data GROUP BY championName
        ORDER BY games DESC, championName
    """).fetchall()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_regression_slope_positive(spark, silver):
    r = match_id_time_regression(
        spark.read.parquet(f"{silver}/player_data")).collect()[0]
    # fixture game ids increase 1 per hour of gameCreation → slope 1/3.6e6
    assert r["slope"] == pytest.approx(1 / 3_600_000, rel=1e-3)  # rounded 10dp
    assert r["n_matches"] == 12


def test_gold_diff_timeline(spark, silver):
    td = spark.read.parquet(f"{silver}/timeline_data")
    out = gold_diff_timeline(td)
    # first frame delta = totalGold - 0; shares sum to 1 per (match, frame)
    sums = out.groupBy("matchId", "timestamp") \
        .agg(F.round(F.sum("gold_share"), 4).alias("s")).collect()
    assert all(abs(r["s"] - 1.0) < 1e-3 for r in sums)
    first = out.filter(F.col("frame_seq") == 1).collect()
    assert all(r["gold_delta"] == r["totalGold"] for r in first)


def test_rank_enrichment_broadcast(spark, silver):
    pd = spark.read.parquet(f"{silver}/player_data")
    ranks = spark.read.parquet(f"{silver}/player_ranks_data")
    out = rank_enriched_players(pd, ranks)
    assert out.count() == pd.count()  # left join keeps all rows
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # every fixture puuid exists in the 300-player rank map
    assert out.filter(F.col("tier").isNull()).count() == 0
