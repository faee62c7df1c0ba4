"""S9: point row-update in place (the dashboard's inline cell edit,
reference ``app.py:577-623``: rewrite a CSV with one row replaced).

An anti-pattern at scale (SURVEY S10 notes Delta ``MERGE`` is the real
answer) but part of the reference surface: implemented as
read → ``when(line == n, new).otherwise(old)`` → single-file overwrite,
which is exactly the reference's semantics with atomic replace.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
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
