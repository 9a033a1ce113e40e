"""Silver-layer ETL plans — the reference's Lambda pipeline re-expressed as
declarative DataFrame transforms (SURVEY §3.2).

Three routed pipelines (``Lambda/lambda_function.py:95,110,204``):

- matches   → ``player_data``    (1 row per match × participant)
- timelines → ``timeline_data``  (1 row per match × participant × frame)
              + ``events``       (1 row per timeline event, event-time parts)
- rank map  → ``player_ranks_data`` (1 row per puuid)

Everything is column expressions + one explode chain + one broadcast join;
no UDFs, no driver-side loops. At scale each plan is a single scan with
nested-schema pruning: only referenced leaves of the (very wide) match
struct are read from parquet/JSON.

NOTE (SURVEY §7 hard part 5): the reference only emits the LAST frame's
participant rows — an indentation bug (``Lambda/lambda_function.py:145``
iterates after the frames loop ends). We implement the evident intent (all
frames → rows); tests record the divergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from league_of_legends_data_pipeline_spark.functions.flatten import (
    pivot_perks, strip_prefixes,
)

# epoch ms/s disambiguation threshold (Utils/S3.py:154-172)
MS_EPOCH_THRESHOLD = 10_000_000_000


def normalize_epoch_seconds(col) -> "F.Column":
    """Epoch value of unknown scale → seconds (C1): > 1e10 means ms."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c > MS_EPOCH_THRESHOLD, (c / 1000).cast("long")).otherwise(c.cast("long"))


def player_rows(matches: DataFrame) -> DataFrame:
    """Match documents → wide ``player_data`` rows.

    Steps (all projections): explode participants → perk pivot (P2) →
    recursive flatten (P1, blacklist applied) → prefix strip (P4) →
    match-level graft (P5, Lambda/lambda_function.py:246-256).
    """
    exploded = matches.select(
        F.col("metadata.dataVersion").alias("dataVersion"),
        F.col("metadata.matchId").alias("matchId"),
        F.col("info.gameCreation").alias("gameCreation"),
        F.col("info.gameDuration").alias("gameDuration"),
        F.col("info.gameVersion").alias("gameVersion"),
        F.col("info.mapId").alias("mapId"),
        F.col("source"),
        F.explode("info.participants").alias("p"),
    )
    p_schema = exploded.schema["p"].dataType
    graft = ["dataVersion", "matchId", "gameCreation", "gameDuration",
             "gameVersion", "mapId", "source"]
    wide = exploded.select(
        *graft, *_requalify(p_schema), *pivot_perks(F.col("p.perks")))
    return strip_prefixes(wide)


def _requalify(p_schema):
    """flatten_exprs over the participant struct, rebased onto column ``p``."""
    from league_of_legends_data_pipeline_spark.functions.flatten import (
        DEFAULT_BLACKLIST, _walk,
    )
    cols = []
    seen: set[str] = set()
    for f in p_schema.fields:
        if f.name == "perks":  # handled by pivot_perks
            continue
        for name, expr in _walk(F.col("p").getField(f.name), f.dataType,
                                f.name, DEFAULT_BLACKLIST, 0, "_"):
            if name not in seen:
                seen.add(name)
                cols.append(expr.alias(name))
    return cols


def timeline_rows(timelines: DataFrame) -> DataFrame:
    """Timeline documents → per-(match, participant, frame) time-series rows.

    participantFrames is ``map<string, struct>`` keyed "1".."10"
    (Lambda/lambda_function.py:145-148): explode the map, cast the key to
    int, broadcast-join the 10-row participantId→puuid lookup (J1), then
    splat championStats/damageStats/position (P3).
    """
    pre = timelines.select(
        F.col("metadata.matchId").alias("matchId"),
        F.col("info.endOfGameResult").alias("endOfGameResult"),
        F.col("info.participants").alias("participants"),
        F.explode("info.frames").alias("frame"),
    )
    # JSON inference reads the numeric-string-keyed participantFrames map as
    # a STRUCT with fields "1".."10"; a declared silver schema reads it as a
    # true map. Accept both (struct → map via map_from_entries).
    from pyspark.sql.types import MapType, StructType

    pf_type = None
    for f in pre.schema["frame"].dataType.fields:  # type: ignore[union-attr]
        if f.name == "participantFrames":
            pf_type = f.dataType
    if isinstance(pf_type, StructType):
        pf_map = F.map_from_entries(F.array(*[
            F.struct(F.lit(f.name).alias("key"),
                     F.col(f"frame.participantFrames.`{f.name}`").alias("value"))
            for f in pf_type.fields
        ]))
    elif isinstance(pf_type, MapType):
        pf_map = F.col("frame.participantFrames")
    else:
        raise TypeError(f"participantFrames must be struct or map, got {pf_type}")
    frames = pre.select(
        "matchId", "endOfGameResult", "participants",
        F.col("frame.timestamp").alias("timestamp"),
        F.explode(pf_map).alias("pf_key", "pf"),
    )
    # J1 lookup stays inside the row (participants array travels with the
    # match): element_at avoids any join at all — the 10-entry array is the
    # broadcast side, resolved per-row. int(key) cast per the reference's
    # lookup[int(key)] trap (SURVEY §7 hard part 3).
    pid = F.col("pf_key").cast("int")
    puuid = F.element_at(
        F.map_from_entries(F.transform(
            "participants",
            lambda x: F.struct(x["participantId"].cast("int"), x["puuid"]))),
        pid,
    )
    pf_schema = frames.schema["pf"].dataType
    splat: list[tuple[str, F.Column]] = []  # (name, expr) — name known here
    seen: set[str] = {"participantId"}  # emitted explicitly from the map key
    for f in pf_schema.fields:  # type: ignore[union-attr]
        if f.name in ("championStats", "damageStats"):
            for sub in f.dataType.fields:
                if sub.name not in seen:
                    seen.add(sub.name)
                    splat.append((sub.name, F.col(f"pf.{f.name}.{sub.name}")))
        elif f.name == "position":
            splat.extend([("x", F.col("pf.position.x")),
                          ("y", F.col("pf.position.y"))])
        elif f.name not in seen:
            seen.add(f.name)
            splat.append((f.name, F.col(f"pf.{f.name}")))
    return frames.select(
        pid.alias("participantId"),
        puuid.alias("puuid"),
        "timestamp", "matchId", "endOfGameResult",
        *[expr.alias(name) for name, expr in splat],
    )


def event_rows(timelines: DataFrame) -> DataFrame:
    """Timeline documents → one row per event, with event-time partition
    parts (K3 semantics: date from in-data realTimestamp, ms/s normalized —
    Utils/S3.py:152-194 — NOT wall clock).

    The per-match realTimestamp anchor comes from the first event of frame 0
    (Lambda/lambda_function.py:127-133); each event's wall-clock time is
    anchor + in-game offset.
    """
    base = timelines.select(
        F.col("metadata.matchId").alias("matchId"),
        F.col("source"),
        F.col("info.frameInterval").alias("frameInterval"),
        F.col("info.endOfGameResult").alias("endOfGameResult"),
        # anchor: first realTimestamp in frame 0's events (fallback 0).
        # F.get throughout: ANSI mode (Spark 4 default) makes getItem THROW
        # on an empty events array / missing frame instead of returning null
        F.coalesce(
            F.get(F.get(F.col("info.frames"), 0).getField("events")
                  .getField("realTimestamp"), 0),
            F.lit(0),
        ).alias("realTimestamp0"),
        F.explode("info.frames").alias("frame"),
    ).select(
        "matchId", "source", "frameInterval", "endOfGameResult", "realTimestamp0",
        F.explode("frame.events").alias("event"),
    )
    anchor_s = normalize_epoch_seconds("realTimestamp0")
    event_ts = F.to_timestamp(F.from_unixtime(
        anchor_s + (F.col("event.timestamp") / 1000).cast("long")))
    return (
        base.select(
            "matchId", "source", "frameInterval", "endOfGameResult",
            event_ts.alias("event_ts"), "event.*",
        )
        .withColumn("year", F.year("event_ts"))
        .withColumn("month", F.month("event_ts"))
        .withColumn("day", F.dayofmonth("event_ts"))
    )


def rank_rows(rank_map_rows: DataFrame) -> DataFrame:
    """player_ranks_data: exploded rank map is already row-shaped; stamp the
    ingest time_stamp if absent (P11, EC2/fetcher.py:98-101)."""
    df = rank_map_rows
    if "time_stamp" not in df.columns:
        df = df.withColumn("time_stamp", F.unix_timestamp(F.current_timestamp()))
    return df


TIER_ORDER = ["CHALLENGER", "GRANDMASTER", "MASTER", "DIAMOND", "EMERALD",
              "PLATINUM", "GOLD", "SILVER", "BRONZE", "IRON"]


def top_players(ranks: DataFrame, limit: int) -> DataFrame:
    """Ordered-limit player cap (L1/L3): the reference's implicit
    challenger→…→DIAMOND-IV priority made explicit (SURVEY §7 hard part 6).
    Total order: tier rank, then leaguePoints desc, then puuid. Unknown or
    NULL tiers sort LAST — array_position returns 0/NULL for them, which
    ascending order would otherwise put ahead of CHALLENGER."""
    pos = F.array_position(
        F.array(*[F.lit(t) for t in TIER_ORDER]), F.col("tier"))
    tier_rank = F.when(pos.isNull() | (pos == 0),
                       F.lit(len(TIER_ORDER) + 1)).otherwise(pos)
    return (
        ranks.withColumn("__tier_rank", tier_rank)
        .orderBy(F.col("__tier_rank").asc(), F.col("leaguePoints").desc(), F.col("puuid"))
        .limit(limit)
        .drop("__tier_rank")
    )


def head_n(df: DataFrame, group_col: str, order_cols: list[str],
           n: int = 1000) -> DataFrame:
    """Head-N truncation per group (L2): the reference caps each uploaded
    log at its first 1000 lines (500 on the retry path —
    ``ec2_deploy/scripts/utils.sh:141-171``); the engine form keeps the
    first ``n`` rows of every group in ``order_cols`` order.

    Plan shape: row_number over (group, order) + filter — Spark rewrites
    rank-limit filters into WindowGroupLimit, so each shuffle partition
    drops rows past ``n`` BEFORE the full sort state builds; no global
    sort, no driver materialization, state per group is O(n)."""
    w = W.partitionBy(group_col).orderBy(*order_cols)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n)
            .drop("__rn"))


def dedup_matchlist(matchlist: DataFrame, id_col: str = "matchId") -> DataFrame:
    """A1/T5: distinct match ids (same match seen by ≤10 players)."""
    return matchlist.select(id_col).distinct()


def leftover_matchlist(matchlist: DataFrame, processed: DataFrame,
                       id_col: str = "matchId") -> DataFrame:
    """J4/U3: unprocessed work = matchlist ∖ processed, as a left-anti join
    (EC2/processor.py:110,184 persists exactly this remainder)."""
    return matchlist.select(id_col).distinct().join(
        processed.select(id_col).distinct(), id_col, "left_anti")


# Legacy split design (Utils/json.py:72-100): one wide row → 4 tables by
# column-name predicate, each carrying the (matchId, championName) keys.
SPLIT_PREDICATES = {
    "legendaryItems": lambda c: "legendaryItemUsed" in c,
    "perkMissionStats": lambda c: c.startswith(("perks", "Primary", "Secondary",
                                                "statPerks", "missions")),
    "challenges": lambda c: c.startswith("challenges") or c in (
        "kda", "goldPerMinute"),
}


def vertical_split(
    wide: DataFrame,
    join_keys: tuple[str, ...] = ("matchId", "championName"),
    predicates: dict | None = None,
) -> dict[str, DataFrame]:
    """P7/P8: split a wide row into per-prefix tables ('basicStats' gets the
    remainder), each including the join keys for reassembly (add_join_keys,
    Utils/json.py:93-100). Four pure projections — the scan is shared and
    column-pruned per table."""
    predicates = predicates or SPLIT_PREDICATES
    out: dict[str, DataFrame] = {}
    claimed: set[str] = set()
    for name, pred in predicates.items():
        cols = [c for c in wide.columns if c not in join_keys and pred(c)]
        claimed.update(cols)
        out[name] = wide.select(*join_keys, *cols)
    rest = [c for c in wide.columns if c not in claimed and c not in join_keys]
    out["basicStats"] = wide.select(*join_keys, *rest)
    return out


def reassemble_split(tables: dict[str, DataFrame],
                     join_keys: tuple[str, ...] = ("matchId", "championName")) -> DataFrame:
    """J3: multi-way equi-join of the split tables back into the wide row."""
    names = sorted(tables)
    df = tables[names[0]]
    for n in names[1:]:
        df = df.join(tables[n], list(join_keys))
    return df
