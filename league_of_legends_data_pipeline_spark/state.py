"""Incremental-run state (SURVEY §2.11 T2/T9).

The reference advances a sliding ingestion window ``next_window.json``
(+2 days normal, +4 accelerate, clamped at now — never ingests the future)
per run (``ec2_deploy/scripts/functions.sh:107-155``), and a run-state
machine maps container exit codes to the next mode
(``functions.sh:163-203``). Both are tiny driver-side concerns; Spark's
streaming checkpoint replaces them in streaming mode, but batch-incremental
runs keep this bookmark.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

DAY_S = 86_400
NORMAL_ADVANCE_S = 2 * DAY_S
ACCELERATE_ADVANCE_S = 4 * DAY_S


@dataclass
class Window:
    start_epoch: int
    end_epoch: int


def load_window(path: str) -> Window:
    with open(path) as f:
        d = json.load(f)
    return Window(int(d["start_epoch"]), int(d["end_epoch"]))


def save_window(path: str, w: Window) -> None:
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump({"start_epoch": w.start_epoch, "end_epoch": w.end_epoch}, f)
    os.replace(tmp, path)  # atomic, like the reference's overwrite (K4)


def advance_window(w: Window, now_epoch: int, accelerate: bool = False) -> tuple[Window, bool]:
    """Advance the bookmark; returns (new_window, caught_up).

    ``caught_up`` True = the window end reached wall clock — the
    reference's SLOWDOWN trigger (functions.sh:115-147) that halves cron
    cadence. The end never passes ``now``.
    """
    step = ACCELERATE_ADVANCE_S if accelerate else NORMAL_ADVANCE_S
    new_start = w.end_epoch
    new_end = min(w.end_epoch + step, now_epoch)
    return Window(new_start, new_end), new_end >= now_epoch


# Exit-code contract (EC2/processor.py:17,61; EC2/leftover.py:17,22;
# functions.sh:172-193): 0 ok, 7 processor-manual, 8 leftover-skip →
# production; 1 critical → backfill + accelerate.
PRODUCTION_CODES = {0, 7, 8}


def next_mode(exit_code: int) -> str:
    return "production" if exit_code in PRODUCTION_CODES else "backfill_accelerate"
