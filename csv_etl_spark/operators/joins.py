"""Temporal/range join operators — extensions beyond the reference (which
has no joins at all; its `lookup` transform is a degenerate broadcast join,
SURVEY §2.6).  These are the two join shapes a training-data pipeline needs
that plain equijoins don't cover.

* asof_join — "most recent right row at or before each left row" per key.
  Implemented WITHOUT a join: tag both sides, union, and run one window
  pass per key ordered by time, carrying the last-seen right payload
  forward.  One shuffle (by key), linear scan — the classic scalable as-of;
  a naive range join here would be O(L×R) per key.

* range_join_buckets — value-vs-interval join against a small interval
  table, broadcast + Catalyst's range-join support.  For big×big interval
  joins you'd bin both sides first (bin = floor(value/width)) to make it
  an equijoin on bin; the broadcast variant is the common dim-table case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the nearest right row sharing ``on``:
    ``direction="backward"`` (default) takes the latest right row with
    ``right_time <= left_time``; ``"forward"`` takes the earliest right
    row with ``right_time >= left_time`` — full pandas ``merge_asof``
    direction parity.  Output = left columns + ``asof_<col>`` for each
    right value column (+ ``asof_ts``).

    ``tolerance``: optional max lookback/lookahead (e.g. ``"1 hour"``) —
    matches farther than it are nulled, like pandas
    ``merge_asof(tolerance=...)``.

    Both directions are the same one-shuffle window scan, just time-
    reversed: forward orders the per-key scan by time DESC so the carried
    last-seen right payload is the SMALLEST right_time ≥ the left row
    (ties still order right-before-left, so an equal timestamp matches)."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    lcols = left.columns
    tagged_l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in right_values],
        F.lit(None).cast(right.schema[right_time].dataType).alias("_rt"),
    )
    tagged_r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(tagged_l.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_rv_{c}") for c in right_values],
        F.col(right_time).alias("_rt"),
    )
    unioned = tagged_l.unionByName(tagged_r)

    # right rows sort before left rows at equal timestamps → "at or before"
    # (backward) / "at or after" (forward, time-reversed scan)
    t_order = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(t_order, F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_k",
        "_t",
        "_is_left",
        "_lrow",
        *[F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_cv_{c}") for c in right_values],
        F.last("_rt", ignorenulls=True).over(w).alias("_c_rt"),
    ).filter(F.col("_is_left") == 1)

    within: Column = F.lit(True)
    if tolerance is not None:
        within = (
            F.col("_c_rt") >= F.col("_t") - F.expr(f"INTERVAL {tolerance}")
            if direction == "backward"
            else F.col("_c_rt") <= F.col("_t") + F.expr(f"INTERVAL {tolerance}")
        )

    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in lcols]
    out_cols += [
        F.when(within, F.col(f"_cv_{c}")).alias(f"asof_{c}") for c in right_values
    ]
    out_cols.append(F.when(within, F.col("_c_rt")).alias("asof_ts"))
    return carried.select(*out_cols)


def range_join_buckets(
    facts: DataFrame,
    buckets: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Attach the bucket row whose [lo, hi) interval contains
    ``facts[value_col]``.  Small interval table → broadcast; the predicate
    is a non-equi range condition Catalyst executes as a broadcast
    nested-loop with range pruning — fine when one side is tiny, which is
    the bucket/dim case by construction."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(buckets), cond, "left")
