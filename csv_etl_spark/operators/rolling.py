"""Per-key ordered window analytics (lag / delta / bounded rolling frames).

The window-FRAME family (``ROWS BETWEEN n PRECEDING AND CURRENT ROW``)
that event analytics needs — session deltas, short-horizon moving
averages, per-entity sequence numbers.  Complements the existing window
coverage (top-k per group in ``window_top_orders``, streaming windows in
``streaming/``) with the frame-bounded aggregations neither uses.

Scale shape: ONE shuffle, keyed on the partition column.  The partition
key is per-entity (user_id-like, cardinality ~ corpus entities), so work
spreads across all reducers — never the low-cardinality or per-row-unique
window keys the plan audit flags.  Frames are row-bounded constants, so
per-row state during the sorted scan is O(frame), not O(partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_metrics(
    df: DataFrame,
    partition_col: str = "user_id",
    order_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
    frame_rows: int = 3,
) -> DataFrame:
    """Per-``partition_col`` ordered metrics over ``value_col``:

    * ``prev_value`` / ``delta`` — lag(1) and first difference;
    * ``rolling_sum`` / ``rolling_avg`` — over the last ``frame_rows``
      rows plus the current one (``ROWS BETWEEN frame_rows PRECEDING AND
      CURRENT ROW``);
    * ``seq`` — 1-based per-entity sequence number.

    Ordering is made total with ``tiebreak_col`` so results are
    deterministic under equal timestamps.  Float aggregates are rounded
    to 6 decimals: a bounded-frame sum of doubles can differ in the last
    bit between engines (sliding-add vs recompute), and the rounding
    pins a single portable representation."""
    w = Window.partitionBy(partition_col).orderBy(
        F.col(order_col).asc(), F.col(tiebreak_col).asc()
    )
    wf = w.rowsBetween(-frame_rows, 0)
    prev = F.lag(value_col, 1).over(w)
    return df.select(
        F.col(partition_col),
        F.col(tiebreak_col),
        F.col(value_col),
        prev.alias("prev_value"),
        F.round(F.col(value_col) - prev, 6).alias("delta"),
        F.round(F.sum(value_col).over(wf), 6).alias("rolling_sum"),
        F.round(F.avg(value_col).over(wf), 6).alias("rolling_avg"),
        F.row_number().over(w).cast("bigint").alias("seq"),
    )


def rolling_time_metrics(
    df: DataFrame,
    partition_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
    window_seconds: int = 600,
) -> DataFrame:
    """Time-RANGE frame analytics: per ``partition_col``, the sum/count of
    ``value_col`` over the trailing ``window_seconds`` (inclusive of the
    current row) plus the seconds elapsed since the previous event — the
    "activity in the last N minutes" shape that ROWS frames can't express
    when events are irregularly spaced.

    The frame is ``RANGE BETWEEN window_seconds PRECEDING AND CURRENT
    ROW`` over integer epoch seconds (engine-portable ordering; Spark's
    rangeBetween and ANSI RANGE ... PRECEDING agree on numeric order
    columns).  Events sharing one epoch second are RANGE-peers — both
    engines include all peers in the frame, so the result is
    deterministic without a tiebreak in the frame ordering (the lag/seq
    ordering still uses ``tiebreak_col``).  Same scale shape as
    ``rolling_metrics``: one shuffle on the per-entity key; per-row frame
    state bounded by events inside the time window."""
    epoch = F.unix_timestamp(F.col(ts_col)).alias("_epoch")
    d = df.select(
        F.col(partition_col), F.col(tiebreak_col), F.col(value_col), epoch
    )
    wr = (
        Window.partitionBy(partition_col)
        .orderBy(F.col("_epoch").asc())
        .rangeBetween(-window_seconds, 0)
    )
    wo = Window.partitionBy(partition_col).orderBy(
        F.col("_epoch").asc(), F.col(tiebreak_col).asc()
    )
    return d.select(
        F.col(partition_col),
        F.col(tiebreak_col),
        F.col(value_col),
        F.round(F.sum(value_col).over(wr), 6).alias("window_sum"),
        F.count(F.lit(1)).over(wr).cast("bigint").alias("window_n"),
        (F.col("_epoch") - F.lag("_epoch", 1).over(wo))
        .cast("bigint")
        .alias("secs_since_prev"),
    )


def sessionize_batch(
    df: DataFrame,
    partition_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based batch sessionization — the batch twin of
    ``streaming.events.sessionize`` (same 30-min-default gap semantic the
    reference-era analytics stack expects): consecutive events of one
    entity belong to one session while the gap between them is
    ≤ ``gap_seconds``; a larger gap (or the first event) starts a new
    session.  Returns one row per SESSION:

    ``(partition_col, session_seq, session_start, session_end, n_events,
    duration_secs)`` with ``session_seq`` 1-based in time order per
    entity and timestamps as epoch seconds (bigint — engine-portable,
    no timezone ambiguity in the compare).

    Classic two-window spelling: ``lag`` marks session starts, a running
    ``sum`` of the start flags numbers the sessions, then one groupBy
    collapses events to sessions.  Ordering is made total with
    ``tiebreak_col`` so equal timestamps sessionize deterministically.

    Scale shape: ONE shuffle on the per-entity key (both windows and the
    groupBy share the (partition_col, session_seq) prefix, so Catalyst
    reuses the exchange); per-row window state is O(1) (lag + running
    sum).  The session agg is map-side combinable.  Same 100 TB posture
    as ``rolling_metrics`` — per-entity partitions, never a global
    window."""
    epoch = F.unix_timestamp(F.col(ts_col)).alias("_epoch")
    d = df.select(F.col(partition_col), F.col(tiebreak_col), epoch)
    w = Window.partitionBy(partition_col).orderBy(
        F.col("_epoch").asc(), F.col(tiebreak_col).asc()
    )
    new_sess = (
        F.coalesce(
            (F.col("_epoch") - F.lag("_epoch", 1).over(w))
            > F.lit(int(gap_seconds)),
            F.lit(True),
        )
    ).cast("bigint")
    numbered = d.withColumn(
        "session_seq",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy(partition_col, "session_seq")
        .agg(
            F.min("_epoch").alias("session_start"),
            F.max("_epoch").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn(
            "duration_secs", F.col("session_end") - F.col("session_start")
        )
    )
