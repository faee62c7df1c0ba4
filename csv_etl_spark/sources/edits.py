"""S9: point row-update in place (the dashboard's inline cell edit,
reference ``app.py:577-623``: rewrite a CSV with one row replaced), plus
the scale-correct generalization: set-based MERGE/upsert
(reference ROADMAP.md:29 plans "Batch insert/upsert for destinations").

The point update is an anti-pattern at scale but part of the reference
surface: read → ``when(line == n, new).otherwise(old)`` → single-file
overwrite, exactly the reference's semantics with atomic replace.
``merge_upsert`` is what you run instead at 100 TB: one anti-join + union
(both keyed — partition-parallel, no driver involvement), equivalent to
Delta's ``MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`` for
whole-row updates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_etl_spark.sources.csv_source import LINE_COL, read_spec_csv, with_line_numbers
from csv_etl_spark.sources.sinks import write_single_csv_file
from csv_etl_spark.specs import FileSpec


def update_csv_row(
    spark: SparkSession,
    file_path: str,
    line_number: int,
    new_values: dict[str, str],
    spec: FileSpec | None = None,
) -> None:
    """Replace the row at physical ``line_number`` (data starts at 2, like
    the reference's preview numbering) with ``new_values`` (column → new
    cell; unspecified columns keep their value)."""
    df = with_line_numbers(read_spec_csv(spark, file_path, spec))
    unknown = set(new_values) - set(df.columns)
    if unknown:
        raise ValueError(f"unknown columns in update: {sorted(unknown)}")
    updated = df.select(
        *[
            F.when(F.col(LINE_COL) == line_number, F.lit(new_values[c]))
            .otherwise(F.col(f"`{c}`"))
            .alias(c)
            if c in new_values
            else F.col(f"`{c}`")
            for c in df.columns
            if c != LINE_COL
        ],
        F.col(LINE_COL),
    )
    write_single_csv_file(updated, file_path, order_by=LINE_COL)


def merge_upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Set-based upsert: rows of ``updates`` replace same-key rows of
    ``target``; new keys are appended.

    Shape: target ANTI-JOIN updates (drop rows being replaced) ∪ updates.
    Both sides hash on the key — fully parallel, and with AQE the anti
    join broadcasts when ``updates`` is small (the common case: a daily
    correction batch against a huge fact table).  ``updates`` should be
    unique per key; duplicate keys are collapsed (dropDuplicates keeps an
    arbitrary one) so the output can never contain two rows per key."""
    if not keys:
        raise ValueError("merge_upsert needs at least one key column")
    kept = target.join(updates.select(*keys), keys, "left_anti")
    deduped = updates.dropDuplicates(keys)
    return kept.unionByName(deduped.select(*target.columns))


def scd2_history(
    updates: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Slowly-Changing-Dimension type-2 history materialization — the CDC
    companion to ``merge_upsert``: an update stream ``(key, ts, value)``
    becomes validity intervals ``(key, value, valid_from_us, valid_to_us,
    is_current)``.  Consecutive updates with an UNCHANGED value collapse
    into one interval (change detection via lag); the latest interval per
    key is open (``valid_to_us`` NULL, ``is_current`` true).

    Scale shape: two window passes over the SAME high-cardinality key
    partitioning — Catalyst plans ONE shuffle and sorts once; per-row
    state is O(1) (lag/lead).  Timestamps surface as epoch MICROSECONDS
    (exact integers on every engine — epoch-seconds doubles lose the
    microsecond digits)."""
    from pyspark.sql import Window

    tiebreak = [F.col(order_tiebreak)] if order_tiebreak else []
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), *tiebreak)
    changed = (
        updates.withColumn("_prev", F.lag(value_col).over(w))
        .filter(
            F.col("_prev").isNull() | (F.col(value_col) != F.col("_prev"))
        )
        .drop("_prev")
    )
    w2 = Window.partitionBy(key_col).orderBy(F.col(ts_col), *tiebreak)
    # parquet timestamps load as TIMESTAMP_NTZ; unix_micros wants TIMESTAMP.
    # The cast interprets in the session zone, which session.py pins to UTC —
    # so the micros match DuckDB's epoch_us on the same naive value.
    ts_utc = F.col(ts_col).cast("timestamp")
    lead_ts = F.lead(ts_col).over(w2)
    return changed.select(
        F.col(key_col),
        F.col(value_col),
        F.unix_micros(ts_utc).alias("valid_from_us"),
        F.unix_micros(lead_ts.cast("timestamp")).alias("valid_to_us"),
        lead_ts.isNull().alias("is_current"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Snapshot diff — classify every key across two table versions as
    ``added`` / ``removed`` / ``changed`` / ``unchanged``: the audit step
    between corpus or dimension snapshots (what did this rebuild touch?),
    and the input a CDC pipeline replays.

    ``compare_cols`` defaults to every non-key column the two frames
    share.  NULL-safe comparison (``eqNullSafe``), so NULL → value and
    value → NULL both classify as changed.

    Scale shape: ONE full outer join keyed on ``keys`` (shuffle both
    sides on the key hash, AQE-coalesced) and a map-only classification —
    no window, no collect.  Returns keys + ``status`` + each compared
    column as ``(old_<c>, new_<c>)`` pairs."""
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    o = old.select(*keys, *[F.col(c).alias(f"old_{c}") for c in compare_cols],
                   F.lit(True).alias("_in_old"))
    n = new.select(*keys, *[F.col(c).alias(f"new_{c}") for c in compare_cols],
                   F.lit(True).alias("_in_new"))
    joined = o.join(n, keys, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *keys,
        status.alias("status"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )
