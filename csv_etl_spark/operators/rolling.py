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
