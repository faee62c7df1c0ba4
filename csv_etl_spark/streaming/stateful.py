"""Custom stateful streaming operators via ``applyInPandasWithState``
(extension — the reference is batch-only; this is the Structured Streaming
escape hatch for semantics the built-in windowed aggregations can't express).

* stream_dedup_first — exact streaming deduplication: emit only the FIRST
  row ever seen per key, across micro-batches.  The per-key state is one
  boolean, so state size is O(distinct keys) — for a 100 TB/day ingest you
  bound it with the TTL (state for a key older than the timeout is dropped,
  trading exactness for bounded memory, the standard production knob).
  This is the streaming twin of operators/dedup.exact_dedup_by_key: dedup
  at ingest time instead of as a nightly batch.

* running_totals — per-key cumulative count/sum emitted every micro-batch
  (running aggregates over an unbounded stream — "complete"-mode semantics
  without holding the whole result, because state is one (count, sum) pair
  per key).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)
_DEDUP_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])

TOTALS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)
_TOTALS_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("s", T.DoubleType())]
)


def stream_dedup_first(
    events: DataFrame,
    key_cols: list[str] | None = None,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Emit the first event per key (default key: user_id, event_type),
    suppressing every later duplicate across micro-batches.

    Rows within one batch are ordered by (ts, event_id) before picking the
    first, so the result is deterministic regardless of partition order."""
    keys = key_cols or ["user_id", "event_type"]
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        already = state.exists and state.get[0]
        if not already:
            batch = pd.concat(list(pdfs), ignore_index=True)
            if len(batch):
                first = batch.sort_values(["ts", "event_id"]).head(1)
                state.update((True,))
                if ttl_ms:
                    state.setTimeoutDuration(ttl_ms)
                yield first[[f.name for f in DEDUP_OUT_SCHEMA.fields]]
        else:
            for _ in pdfs:  # drain
                pass
            if ttl_ms:
                state.setTimeoutDuration(ttl_ms)

    cols = [c for c in ("event_id", "ts", "user_id", "event_type", "value") if c]
    return (
        events.select(*cols)
        .groupBy(*keys)
        .applyInPandasWithState(
            fn, DEDUP_OUT_SCHEMA, _DEDUP_STATE_SCHEMA, "append", timeout
        )
    )


def running_totals(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key cumulative (count, sum(value)) emitted once per micro-batch
    in which the key appears."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        new_n, new_s = 0, 0.0
        for pdf in pdfs:
            new_n += len(pdf)
            new_s += float(pdf["value"].fillna(0.0).sum())
        if new_n:
            n, s = n + new_n, s + new_s
            state.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
            )

    return (
        events.select(key_col, "value")
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, TOTALS_OUT_SCHEMA, _TOTALS_STATE_SCHEMA, "update",
            GroupStateTimeout.NoTimeout,
        )
    )
