"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.11: the reference's micro-batch state — leftover queues, counter
high-water marks — generalized to keyed streaming state).

``per_key_cap`` is the training-data quota operator: admit at most ``cap``
rows per key across the whole stream (cap documents per domain/language —
a standard data-mixing step an LLM pipeline runs at ingest). Built-in
``dropDuplicates`` can't express it (it is a cap of 1 with no ordering);
window functions can't either in streaming (no global row_number over an
unbounded stream) — keyed state is the right primitive.

Scale notes
-----------
- State per key is ONE long (rows admitted so far): millions of keys fit
  in tens of MB of state store; no row content is retained.
- Rows flow through Arrow batches (``applyInPandasWithState``), never
  row-at-a-time Python.
- Admission is deterministic within a micro-batch (sorted by ``order_col``
  before the cut); across micro-batches it is arrival-order — the batch
  oracle (row_number <= cap) matches exactly when a key's rows arrive in
  one batch, which `availableNow` over a single file guarantees.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def per_key_cap(
    stream: DataFrame,
    key_cols: list[str],
    order_col: str,
    cap: int,
) -> DataFrame:
    """Admit at most ``cap`` rows per ``key_cols`` group over the stream's
    lifetime, preferring the smallest ``order_col`` values within each
    micro-batch. Output schema == input schema.
    """
    schema = stream.schema

    def admit(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (admitted,) = state.get if state.exists else (0,)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(order_col, kind="mergesort")
        room = max(cap - admitted, 0)
        out = batch.iloc[:room]
        state.update((admitted + len(out),))
        if len(out):
            yield out

    return stream.groupBy(*key_cols).applyInPandasWithState(
        admit,
        outputStructType=schema,
        stateStructType="admitted long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def decayed_counter(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    t_ref: str,
    lam_per_day: float,
) -> DataFrame:
    """Streaming dual of ``operators.joins.decayed_group_sum``: per-key
    exponentially-decayed value sum, maintained as keyed state across
    micro-batches. Emits (key..., n_events, decayed_sum) after each batch
    touching the key; the latest emission per key is the current score.

    The decay recurrence is re-anchored at the fixed reference instant
    (acc += value * exp(-lam * (t_ref - ts))), so state is ONE (double,
    long) pair per key and contributions are order- and batching-
    independent — the stream converges to exactly what the batch operator
    computes over the same rows (up to float summation order; the batch
    side's micro-unit rounding differs by < 1e-6 per event, asserted in
    the duality test). Anchoring at t_ref instead of "now" keeps the
    operator deterministic and replayable; shifting an anchored score to
    any later instant is one multiplication.
    """
    import math

    import pandas as pd  # noqa: F811 (module-level import is for type use)

    key_schema = ", ".join(
        f"{c} {dict((f.name, f.dataType.simpleString()) for f in stream.schema)[c]}"
        for c in key_cols)
    out_schema = f"{key_schema}, n_events long, decayed_sum double"

    def step(key, pdfs, state: GroupState):
        acc, n = state.get if state.exists else (0.0, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        ts = pd.to_datetime(batch[ts_col]).astype("int64") // 1000  # micros
        ref = pd.Timestamp(t_ref).value // 1000
        age_days = (ref - ts) / 86_400_000_000.0
        import numpy as np

        acc += float(np.sum(batch[value_col].to_numpy()
                            * np.exp(-lam_per_day * age_days.to_numpy())))
        n += len(batch)
        state.update((acc, n))
        yield pd.DataFrame([{**{c: k for c, k in zip(key_cols, key)},
                             "n_events": n, "decayed_sum": acc}])

    return stream.groupBy(*key_cols).applyInPandasWithState(
        step,
        outputStructType=out_schema,
        stateStructType="acc double, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_state(
    stream: DataFrame,
    key_cols: list[str],
    day_col: str,
    lam: float,
) -> DataFrame:
    """Streaming EWMA over per-day row counts, one keyed fold per group —
    the streaming dual of ``operators.timeseries.ewma_chart`` seeded at
    the first observation (z_1 = x_1) so a single forward pass needs no
    global mean. State per key is ONE (double, long, string) triple: the
    running z, a seeded flag, and the last folded day (the ordering
    guard); day counts aggregate inside the Arrow batch before the fold,
    so emitted rows are day-dimension-sized.

    Ordering contract: days fold in sorted order within a micro-batch and
    in arrival order across batches — identical to the batch recursion
    when each key drains in one batch (``availableNow`` over a single
    file), which is how the declared query runs it. The contract is
    ENFORCED (r9 advice): state carries the last folded day, and a
    micro-batch delivering a day at or before it raises instead of
    silently continuing the recursion out of order — the z fold is not
    commutative, so a late day would diverge from the batch oracle with
    no signal. The z recursion is plain IEEE-double arithmetic in day
    order, so the oracle running the same recursion reproduces it
    bit-for-bit.
    """
    key_schema = ", ".join(
        f"{c} {dict((f.name, f.dataType.simpleString()) for f in stream.schema)[c]}"
        for c in key_cols)
    out_schema = f"{key_schema}, {day_col} string, n long, ewma double"

    def fold(key, pdfs, state: GroupState):
        z, seeded, last_day = (state.get if state.exists
                               else (0.0, 0, ""))
        batch = pd.concat(list(pdfs), ignore_index=True)
        counts = batch.groupby(day_col).size().sort_index()
        rows = []
        for day, n in counts.items():
            if seeded and str(day) <= last_day:
                raise ValueError(
                    f"ewma_state: out-of-order day {day!r} for key "
                    f"{key!r} (already folded through {last_day!r}); "
                    "the EWMA recursion is order-dependent — re-deliver "
                    "days in event-time order or rebuild from batch")
            x = float(n)
            z = x if not seeded else lam * x + (1.0 - lam) * z
            seeded = 1
            last_day = str(day)
            rows.append({**{c: k for c, k in zip(key_cols, key)},
                         day_col: day, "n": int(n), "ewma": z})
        state.update((z, seeded, last_day))
        if rows:
            yield pd.DataFrame(rows)

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType="z double, seeded long, last_day string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def episode_state(
    stream: DataFrame,
    key_col: str,
    epoch_day_col: str,
    count_col: str,
    gap_days: int = 1,
) -> DataFrame:
    """Streaming activity-episode sessionization with EVENT-TIME
    TIMEOUTS: consecutive-activity runs per key, split when the day gap
    exceeds ``gap_days``. The third keyed-state operator next to
    ``per_key_cap`` (NoTimeout quota) and ``ewma_state`` (NoTimeout
    fold) — this one exercises ``GroupStateTimeout.EventTimeTimeout``:
    an episode the data can no longer extend is flushed by the
    WATERMARK, not by a later event for the same key.

    Input must carry a watermark (``withWatermark`` on the day-midnight
    timestamp) and ``epoch_day_col`` as integer days since 1970-01-01
    (JVM-computed — the Arrow batch ships ints, never date objects).
    Emits (key, start_day, end_day, n_events, n_days, closed_by) where
    closed_by is 'gap' (a later event for the key ended it) or
    'timeout' (the watermark passed midnight of ``end_day + gap_days
    + 1``, so no in-watermark event can extend it). Episodes still
    open at end of stream are NOT emitted — the honest streaming
    contract; the batch oracle mirrors it by excluding each key's
    final island when the corpus horizon is within the gap window.

    Late/duplicate input (at-least-once upstreams): a day EQUAL to the
    fold's last day adds its events to the open episode (same-day
    redelivery is indistinguishable from a same-day split across
    micro-batches); a day STRICTLY BEFORE the fold's last day is
    DROPPED — ``applyInPandasWithState`` does not filter pre-watermark
    rows itself, and folding the stray day in would corrupt the open
    episode with events belonging to an earlier (possibly already
    emitted) one. This mirrors the late-row drop of Spark's watermarked
    windowed aggregates; exactly-once day counts need an exactly-once
    upstream.

    State per key is 4 longs + a day count; emissions are
    episode-sized. Timeout timestamps are day-midnight exact, so the
    flush boundary is integer-deterministic (no float watermark math).
    """
    out_schema = (f"{key_col} long, start_day string, end_day string, "
                  "n_events long, n_days long, closed_by string")

    def _day_str(ed: int) -> str:
        return pd.Timestamp(int(ed), unit="D").strftime("%Y-%m-%d")

    def fold(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            start_ed, last_ed, n_ev, n_dy = state.get
            state.remove()
            yield pd.DataFrame([{key_col: key[0],
                                 "start_day": _day_str(start_ed),
                                 "end_day": _day_str(last_ed),
                                 "n_events": int(n_ev),
                                 "n_days": int(n_dy),
                                 "closed_by": "timeout"}])
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        per_day = (batch.groupby(epoch_day_col)[count_col].sum()
                   .sort_index())
        if state.exists:
            start_ed, last_ed, n_ev, n_dy = state.get
        else:
            start_ed = last_ed = n_ev = n_dy = None
        rows = []
        for ed, cnt in per_day.items():
            ed = int(ed)
            # cross-batch late-day guard (r10 ADVICE, softened per r11
            # ADVICE): per_day is sorted within a batch, so ed < last_ed
            # means a LATER batch delivered a day behind the fold —
            # possible because applyInPandasWithState does NOT drop
            # pre-watermark rows (Spark only uses the watermark for
            # timeouts here), so one duplicated/late upstream event
            # would otherwise be a poison pill that crashes the query on
            # every restart. DROP the late day instead — the same
            # semantics Spark's own watermarked windowed aggregates give
            # late rows — because folding it in would corrupt n_events
            # of the CURRENT episode with events that belong to an
            # earlier (possibly already-emitted) one.
            # ed == last_ed (the same day split across batches) is valid
            # at-least-once input and correctly adds events only.
            if start_ed is not None and ed < last_ed:
                continue
            if start_ed is not None and ed - last_ed > gap_days:
                rows.append({key_col: key[0],
                             "start_day": _day_str(start_ed),
                             "end_day": _day_str(last_ed),
                             "n_events": int(n_ev),
                             "n_days": int(n_dy),
                             "closed_by": "gap"})
                start_ed = None
            if start_ed is None:
                start_ed, last_ed, n_ev, n_dy = ed, ed, 0, 0
            if ed > last_ed:
                n_dy += 1
                last_ed = ed
            elif n_dy == 0:
                # first day of a fresh episode: start_ed == last_ed ==
                # ed, so the > branch above cannot count it
                n_dy = 1
            n_ev += int(cnt)
        state.update((start_ed, last_ed, n_ev, n_dy))
        # flush boundary: once the watermark reaches midnight of
        # end_day + gap_days + 1, no in-watermark event can extend
        # this episode. Spark fires event-time timeouts only when the
        # watermark STRICTLY exceeds the set timestamp, so set it one
        # ms before that midnight — a watermark sitting exactly on the
        # boundary (horizon = end_day + gap_days + 1) then flushes,
        # keeping the day-granular contract integer-exact.
        state.setTimeoutTimestamp(
            (last_ed + gap_days + 1) * 86400 * 1000 - 1)
        if rows:
            yield pd.DataFrame(rows)

    return stream.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=("start_ed long, last_ed long, n_ev long, "
                         "n_dy long"),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
