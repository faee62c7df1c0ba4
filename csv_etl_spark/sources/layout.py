"""Output layout for scale: partitioned + clustered parquet writes.

At 100 TB the WRITE layout decides every later read's cost:

* ``write_partitioned`` — hive-style directory partitioning on a
  low-cardinality column (date, source): partition pruning turns
  point/range queries on that column into directory listings.
  ``maxRecordsPerFile`` bounds file sizes so a skewed partition doesn't
  produce one 2 TB file.

* ``write_clustered`` — the poor-man's Z-order for engines without Delta:
  ``repartitionByRange`` on the cluster key + ``sortWithinPartitions``.
  Every output file then covers a NARROW, mostly-disjoint key range, so
  parquet row-group min/max statistics let any engine skip files on key
  predicates (tested by reading the footers back — not assumed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    max_records_per_file: int | None = None,
) -> None:
    writer = df.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.partitionBy(*partition_by).parquet(path)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: str,
    num_files: int = 8,
) -> None:
    """Range-partition on ``cluster_by`` then sort within partitions, so
    each file's min/max footer stats cover a narrow key range."""
    (
        df.repartitionByRange(num_files, cluster_by)
        .sortWithinPartitions(cluster_by)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_value(df: DataFrame, cols: list[str], bits: int = 16):
    """Morton (Z-order) curve value over ``cols`` as a Column: each column
    is min-max scaled to a ``bits``-bit integer (global min/max — two
    scalars per column, collected once), then the bits interleave.  Rows
    close on the curve are close in EVERY dimension, which is what makes
    multi-column file skipping possible.

    The interleave is a fixed tree of shift/mask/or expressions
    (``bits × n_cols`` terms — ~32 nodes for 2×16, trivial for codegen);
    the scale step is map-only.  Returns (z Column, stats row) — the stats
    collect is the only driver traffic (2·n_cols doubles, model-sized)."""
    from functools import reduce

    from pyspark.sql import functions as F

    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"_mn_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"_mx_{c}")]
    stats = df.agg(*aggs).collect()[0]
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn, mx = stats[f"_mn_{c}"], stats[f"_mx_{c}"]
        span = (mx - mn) or 1.0
        s = F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * F.lit(float(top))).cast("long")
        scaled.append(F.greatest(F.lit(0), F.least(F.lit(top), s)))
    ncols = len(cols)
    terms = [
        F.shiftleft(F.shiftright(s, b).bitwiseAND(F.lit(1)), b * ncols + ci)
        for ci, s in enumerate(scaled)
        for b in range(bits)
    ]
    return reduce(lambda a, t: a.bitwiseOR(t), terms), stats


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Z-order clustered write — ``write_clustered`` generalized to MULTI-
    column skipping (the same layout Delta's OPTIMIZE ZORDER BY produces):
    range-partition + sort on the Morton value, so every output file covers
    a narrow range of the space-filling curve and its parquet min/max
    footers are selective on ALL ``zorder_by`` columns at once, where a
    linear sort is selective on only its leading column.

    One range shuffle (same cost as ``write_clustered``); the curve value
    is a pure expression.  The proof is footer-based like the clustered
    test: per-file ranges on the SECOND dimension shrink vs a linear-sort
    control (test_partitioning)."""
    z, _ = zorder_value(df, zorder_by, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_key_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of ``column`` per parquet file — reads footers only.
    Lets tests PROVE clustering produced skippable files."""
    import glob
    import os

    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                col = meta.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    return ranges
