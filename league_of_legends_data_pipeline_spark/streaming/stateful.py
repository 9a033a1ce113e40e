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
