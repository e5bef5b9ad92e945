"""Custom stateful streaming operators via ``applyInPandasWithState``.

The built-in streaming surface (windows, session_window, watermarks) covers
time-shaped state; these operators need *arbitrary* per-key state that no
built-in aggregation expresses — the documented growth path is
``applyInPandasWithState`` (Arrow-batched, state store-backed, exactly-once
under checkpointing).

``stream_first_seen`` is streaming exact-dedup: across all micro-batches,
emit only the FIRST row seen per key (e.g. a content digest) — the
incremental twin of ``operators/dedup.py:exact_dedup`` for a training-data
ingest pipeline where duplicate documents must be dropped at arrival time.
Per-key state is one boolean; with a state timeout it is bounded even for
unbounded key domains (late re-arrivals past the timeout re-emit, the same
trade-off any TTL'd dedup store makes).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StructField, StructType)


def stream_first_seen(events: DataFrame, key_col: str,
                      timeout: Optional[str] = None) -> DataFrame:
    """Emit only the first-arriving row per ``key_col`` across the stream.

    State per key: a single seen-marker (one long — the state store cost is
    ~16 bytes/key). ``timeout`` (e.g. ``"1 hour"``) evicts idle keys via
    ProcessingTimeTimeout so state stays bounded on unbounded key spaces;
    None keeps keys forever (exact dedup, state grows with distinct keys —
    at 100 TB pair with a TTL or a compacted upstream digest table).
    """
    out_schema = events.schema
    state_schema = StructType([StructField("seen", LongType())])
    conf = (GroupStateTimeout.ProcessingTimeTimeout if timeout
            else GroupStateTimeout.NoTimeout)

    def dedup(key, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        already = state.exists
        if not already:
            state.update((1,))
        if timeout:
            state.setTimeoutDuration(timeout)
        if already:
            return  # drop every row of a key we've already emitted
        for pdf in pdfs:
            if len(pdf):
                yield pdf.head(1)  # first physical arrival wins
                return

    return (events.groupBy(key_col)
            .applyInPandasWithState(dedup, out_schema, state_schema,
                                    "update", conf))
