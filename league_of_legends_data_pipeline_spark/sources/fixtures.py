"""Deterministic domain-shaped fixture generator (FIXTURES.md §1-5).

Synthesizes the reference pipeline's bronze inputs — match-v5 batch
envelopes, timeline-v5 envelopes, league-entry rank maps, matchlist work
queues, and the bookmark window — as JSON files, seed-stable (seed=42) so
golden tests are reproducible.

Shapes mirror how the reference reads/writes each structure:
envelope ``Utils/S3.py:114-123``; match ``Lambda/lambda_function.py:226-258``;
timeline ``Lambda/lambda_function.py:110-202``; ranks ``EC2/fetcher.py:41-105``;
matchlist ``EC2/fetcher.py:136-144``; window ``test.py:7-16``.
"""

from __future__ import annotations

import json
import os
import random

CHAMPIONS = ["Ahri", "Garen", "Jinx", "LeeSin", "Lux", "Thresh", "Yasuo", "Zed"]
TIERS = ["CHALLENGER", "GRANDMASTER", "MASTER", "DIAMOND"]
EVENT_TYPES = ["ITEM_PURCHASED", "CHAMPION_KILL", "WARD_PLACED", "SKILL_LEVEL_UP"]
BASE_EPOCH_MS = 1_726_000_000_000  # 2024-09-10T21:46:40Z


def _perks(rng: random.Random) -> dict:
    def sel():
        return {"perk": rng.randint(8000, 8500), "var1": rng.randint(0, 100),
                "var2": rng.randint(0, 100), "var3": rng.randint(0, 100)}
    return {
        "statPerks": {"defense": rng.choice([5001, 5002]),
                      "flex": rng.choice([5008, 5005]),
                      "offense": rng.choice([5005, 5007])},
        "styles": [
            {"style": rng.choice([8000, 8100, 8200]), "selections": [sel() for _ in range(4)]},
            {"style": rng.choice([8300, 8400]), "selections": [sel() for _ in range(2)]},
        ],
    }


def _participant(rng: random.Random, pid: int, drift: bool, puuid: str) -> dict:
    p = {
        "participantId": pid,
        "puuid": puuid,
        "championName": rng.choice(CHAMPIONS),
        "win": rng.random() < 0.5,
        "kills": rng.randint(0, 20),
        "deaths": rng.randint(0, 15),
        "assists": rng.randint(0, 30),
        "goldEarned": rng.randint(4000, 25000),
        # int beyond 2^31 — the reference's INT→BIGINT promotion edge
        # (Utils/sql.py:49); uniformly bigint in our engine
        "totalPlayTime": 3_000_000_000 + rng.randint(0, 10**9),
        "challenges": {
            "kda": round(rng.uniform(0, 10), 4),
            "goldPerMinute": round(rng.uniform(200, 800), 4),
            "kills": rng.randint(0, 20),  # collides with top-level after strip
            # blacklist member inside a nested struct (Utils/json.py:28)
            "legendaryItemUsed": [rng.randint(3000, 4000)],
            "SWARM_kills": rng.randint(0, 5),
        },
        "missions": {"playerScore0": rng.randint(0, 10),
                     "missionValue": rng.randint(0, 1000)},
        "perks": _perks(rng),
        "playerAugment1": rng.randint(0, 50),  # blacklisted top-level
    }
    if drift:  # schema drift: field present in only some matches
        p["newStatFromPatch"] = rng.randint(0, 99)
    return p


def make_match(rng: random.Random, match_seq: int, source: str = "prod") -> dict:
    drift = match_seq % 3 == 0
    puuids = [f"puuid-{i:04d}" for i in rng.sample(range(300), 10)]
    return {
        "metadata": {"dataVersion": "2", "matchId": f"NA1_{5_000_000_000 + match_seq}"},
        "source": source,
        "info": {
            "gameCreation": BASE_EPOCH_MS + match_seq * 3_600_000,
            "gameDuration": rng.randint(900, 3000),
            "gameVersion": "14.18.1",
            "mapId": 11,
            "endOfGameResult": "GameComplete",
            "participants": [_participant(rng, pid, drift, puuids[pid - 1])
                             for pid in range(1, 11)],
        },
    }


def make_timeline(rng: random.Random, match_seq: int, n_frames: int = 5,
                  source: str = "prod", sec_scale_ts: bool = False) -> dict:
    match_id = f"NA1_{5_000_000_000 + match_seq}"
    tl_puuids = [f"puuid-{i:04d}" for i in rng.sample(range(300), 10)]
    participants = [{"participantId": pid, "puuid": tl_puuids[pid - 1]}
                    for pid in range(1, 11)]
    real0 = BASE_EPOCH_MS + match_seq * 3_600_000
    if sec_scale_ts:
        real0 //= 1000  # s-scale epoch — ms/s heuristic input (Utils/S3.py:154-158)
    frames = []
    for fi in range(n_frames):
        events = []
        if fi > 0:  # frame 0 empty → realTimestamp fallback path
            for _ in range(rng.randint(1, 4)):
                et = rng.choice(EVENT_TYPES)
                ev = {"type": et, "timestamp": fi * 60_000 + rng.randint(0, 59_999)}
                if et == "CHAMPION_KILL":  # disjoint sparse fields per type
                    ev.update({"killerId": rng.randint(1, 10), "victimId": rng.randint(1, 10),
                               "position": {"x": rng.randint(0, 15000), "y": rng.randint(0, 15000)}})
                elif et == "ITEM_PURCHASED":
                    ev.update({"participantId": rng.randint(1, 10), "itemId": rng.randint(1000, 4000)})
                events.append(ev)
        else:
            events.append({"type": "PAUSE_END", "timestamp": 0, "realTimestamp": real0})
        frames.append({
            "timestamp": fi * 60_000,
            "events": events,
            "participantFrames": {
                str(pid): {
                    "participantId": pid,
                    "totalGold": 500 + fi * rng.randint(200, 400),
                    "xp": fi * rng.randint(400, 600),
                    "level": min(18, 1 + fi),
                    "minionsKilled": fi * rng.randint(5, 9),
                    "jungleMinionsKilled": fi * rng.randint(0, 3),
                    "championStats": {"abilityPower": rng.randint(0, 600),
                                      "armor": rng.randint(20, 300),
                                      "attackDamage": rng.randint(50, 400),
                                      "health": rng.randint(500, 3000),
                                      "healthMax": rng.randint(500, 3000),
                                      "movementSpeed": rng.randint(325, 500)},
                    "damageStats": {"totalDamageDone": fi * rng.randint(1000, 4000),
                                    "totalDamageTaken": fi * rng.randint(500, 3000),
                                    "trueDamageDone": fi * rng.randint(0, 500)},
                    "position": {"x": rng.randint(0, 15000), "y": rng.randint(0, 15000)},
                } for pid in range(1, 11)
            },
        })
    return {
        "metadata": {"matchId": match_id},
        "source": source,
        "info": {"endOfGameResult": "GameComplete", "frameInterval": 60_000,
                 "participants": participants, "frames": frames},
    }


def _envelope(matches: list[dict], kind: str, batch_id: str) -> dict:
    return {
        "metadata": {
            "upload_timestamp": "2024-09-10T21:46:40+00:00",
            "match_count": len(matches),
            "batch_id": batch_id,
            "s3_key": f"matches/year=2024/month=09/day=10/batch_{batch_id}_{kind}.json",
            "data_collection_type": kind,
        },
        "matches": matches,
    }


def make_rank_map(rng: random.Random, n_players: int = 300) -> dict:
    """At-rest map form puuid → stats (EC2/fetcher.py:105)."""
    out = {}
    for i in range(n_players):
        out[f"puuid-{i:04d}"] = {
            "leaguePoints": rng.randint(0, 1500),
            "player_rank": rng.choice(["I", "II", "III", "IV"]),
            "tier": rng.choice(TIERS),
            "wins": rng.randint(0, 500),
            "losses": rng.randint(0, 500),
            "veteran": rng.random() < 0.2,
            "inactive": rng.random() < 0.05,
            "freshBlood": rng.random() < 0.1,
            "hotStreak": rng.random() < 0.15,
            "time_stamp": BASE_EPOCH_MS // 1000,
        }
    return out


def write_fixtures(
    out_dir: str,
    n_matches: int = 12,
    matches_per_file: int = 4,
    n_timelines: int = 6,
    timelines_per_file: int = 3,
    seed: int = 42,
) -> dict[str, str]:
    """Write the full bronze fixture set under ``out_dir``; returns paths.

    Layout mirrors the reference's hive keys: ``matches/year=…/`` batch
    envelopes (matches + match_timelines, routed by key substring — F1),
    ``player-maps/`` rank map, ``matchlists/`` work queue.
    """
    rng = random.Random(seed)
    paths = {
        "matches": os.path.join(out_dir, "matches"),
        "timelines": os.path.join(out_dir, "match_timelines"),
        "player_maps": os.path.join(out_dir, "player-maps"),
        "matchlists": os.path.join(out_dir, "matchlists"),
    }
    for p in paths.values():
        os.makedirs(p, exist_ok=True)

    match_ids = []
    matches = [make_match(rng, i) for i in range(n_matches)]
    # duplicate matchId across files (dedup T5): re-emit the first match
    matches.append(make_match(random.Random(seed), 0))
    for b, i in enumerate(range(0, len(matches), matches_per_file)):
        batch = matches[i:i + matches_per_file]
        fp = os.path.join(paths["matches"], f"year=2024/month=09/day=1{b}")
        os.makedirs(fp, exist_ok=True)
        with open(os.path.join(fp, f"batch_{b}_matches.json"), "w") as f:
            json.dump(_envelope(batch, "match", f"b{b}"), f)
    match_ids = sorted({m["metadata"]["matchId"] for m in matches})

    timelines = [make_timeline(rng, i, sec_scale_ts=(i % 4 == 3)) for i in range(n_timelines)]
    for b, i in enumerate(range(0, len(timelines), timelines_per_file)):
        batch = timelines[i:i + timelines_per_file]
        fp = os.path.join(paths["timelines"], f"year=2024/month=09/day=1{b}")
        os.makedirs(fp, exist_ok=True)
        with open(os.path.join(fp, f"batch_{b}_match_timelines.json"), "w") as f:
            json.dump(_envelope(batch, "match_timeline", f"t{b}"), f)

    with open(os.path.join(paths["player_maps"], "ranked_map.json"), "w") as f:
        json.dump(make_rank_map(rng), f)
    with open(os.path.join(paths["matchlists"], "matchlist.json"), "w") as f:
        json.dump({"matchlist": match_ids + match_ids[:2]}, f)  # dups → A1 dedup
    with open(os.path.join(out_dir, "next_window.json"), "w") as f:
        json.dump({"start_epoch": BASE_EPOCH_MS // 1000,
                   "end_epoch": BASE_EPOCH_MS // 1000 + 2 * 86400}, f)
    return paths
