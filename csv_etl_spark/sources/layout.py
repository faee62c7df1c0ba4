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
