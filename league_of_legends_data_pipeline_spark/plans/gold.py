"""Gold-layer analytics over the silver tables (SURVEY §3.3, §2.7).

The reference's only observed consumption is ``SELECT * FROM BasicStats``
into a notebook that then does ordinal indexing, a polyfit regression, and
a hand-counted pie chart (``CollectionTests/dsa.ipynb``). These plans are
that analysis surface done relationally — plus the window-function
time-series stats the reference's data model implies but never built
(gold-diff deltas over ``timeline_data``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def champion_winrate(player_data: DataFrame) -> DataFrame:
    """Games and win rate per champion (dsa.ipynb cell 5 analogue)."""
    return (
        player_data.groupBy("championName")
        .agg(
            F.count(F.lit(1)).alias("games"),
            F.round(F.avg(F.col("win").cast("double")), 6).alias("win_rate"),
            F.round(F.avg((F.col("kills") + F.col("assists"))
                          / F.greatest(F.col("deaths"), F.lit(1))), 6).alias("avg_kda"),
        )
        .orderBy(F.col("games").desc(), "championName")
    )


def match_id_time_regression(player_data: DataFrame) -> DataFrame:
    """gameId-vs-creation-time least-squares slope (dsa.ipynb cell 4:
    np.polyfit(creationTime, gameId, 1)) as one distributed aggregate."""
    base = player_data.select(
        F.regexp_replace("matchId", "^NA1_", "").cast("double").alias("game_id"),
        F.col("gameCreation").cast("double").alias("t"),
    ).dropDuplicates(["game_id"])
    return base.agg(
        F.round(F.expr("regr_slope(game_id, t)"), 10).alias("slope"),
        F.round(F.expr("regr_intercept(game_id, t)"), 4).alias("intercept"),
        F.count(F.lit(1)).alias("n_matches"),
    )


def gold_diff_timeline(timeline_data: DataFrame) -> DataFrame:
    """Per (match, participant, frame): gold delta vs previous frame and
    cumulative share of team gold — the window-function surface SURVEY §2.7
    says the reference implies but never implemented."""
    w = W.partitionBy("matchId", "puuid").orderBy("timestamp")
    per_frame = W.partitionBy("matchId", "timestamp")
    return timeline_data.select(
        "matchId", "puuid", "timestamp", "totalGold",
        (F.col("totalGold") - F.lag("totalGold", 1, 0).over(w)).alias("gold_delta"),
        F.round(F.col("totalGold")
                / F.sum("totalGold").over(per_frame), 6).alias("gold_share"),
        F.row_number().over(w).alias("frame_seq"),
    )


def rank_enriched_players(player_data: DataFrame, player_ranks: DataFrame) -> DataFrame:
    """J2 deferred dimension join: player-match rows + rank dimension."""
    dim = player_ranks.select("puuid", "tier", "player_rank", "leaguePoints")
    return player_data.join(F.broadcast(dim), "puuid", "left")
