"""Incremental batch driver (SURVEY §3.1 / §2.11 T2+T9).

The reference's EC2 run is: load the bookmark window → collect one
window's worth of data → process → advance the bookmark (+2d, +4d in
accelerate, clamped at now) → map the exit code to the next run mode.
This is that loop with Spark doing the processing: each run ingests the
bronze files whose event-date partitions fall inside the window, demuxes
them into the silver tables, and advances the bookmark atomically only
after the write succeeds (crash before the advance → clean re-run, the
demux idempotency absorbs the replay).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from league_of_legends_data_pipeline_spark import state as st
from league_of_legends_data_pipeline_spark.sources.readers import read_envelopes
from league_of_legends_data_pipeline_spark.streaming.pipeline import demux_batch


@dataclass
class RunResult:
    window: st.Window
    caught_up: bool
    next_mode: str
    files_seen: int


def run_incremental(
    spark: SparkSession,
    bronze_glob: str | list[str],
    out_dir: str,
    window_path: str,
    accelerate: bool = False,
    now_epoch: int | None = None,
) -> RunResult:
    """One incremental run over the bookmark window.

    Files are selected by the match-level ``gameCreation`` epoch falling
    inside [start, end) — in-data event time, like the reference's
    window-parameterized API fetch (the pushed-down ``startTime/endTime``
    of SURVEY S5). Returns the advanced window and next run mode.
    """
    now_epoch = int(time.time()) if now_epoch is None else now_epoch
    w = st.load_window(window_path)

    env = read_envelopes(spark, bronze_glob)
    in_window = env.filter(
        F.exists(
            "matches",
            lambda m: (m["info"]["gameCreation"] / 1000 >= F.lit(w.start_epoch))
            & (m["info"]["gameCreation"] / 1000 < F.lit(w.end_epoch)),
        )
    )
    n_files = in_window.select("_source_file").distinct().count()
    exit_code = 0
    if n_files:
        try:
            demux_batch(in_window, out_dir)
        except Exception:
            exit_code = 1
            raise
    nxt, caught_up = st.advance_window(w, now_epoch, accelerate=accelerate)
    st.save_window(window_path, nxt)  # atomic replace — commit point
    return RunResult(window=nxt, caught_up=caught_up,
                     next_mode=st.next_mode(exit_code), files_seen=n_files)
