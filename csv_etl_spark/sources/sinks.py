"""CSV sink (S5-S7).

S5: header + fixed column order (reference ``loaders/csv_loader.py:14-23``,
``dynamic.py:338-343``).  ``single_file=True`` coalesces to one partition for
byte-parity with the reference's one-output-file model — correct for
golden tests, deliberately NOT the default: at scale you want one file per
partition.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_etl_spark.specs import ColumnType, FileSpec

# FIXTURES §5 / reference app.py:730-740 template dummy values
_TEMPLATE_VALUES = {
    ColumnType.STRING: lambda c: f"example_{c.name}",
    ColumnType.INTEGER: lambda c: "123",
    ColumnType.FLOAT: lambda c: "123.45",
    ColumnType.DATE: lambda c: "2024-01-15",
    ColumnType.DATETIME: lambda c: "2024-01-15T10:30:00",
    ColumnType.BOOLEAN: lambda c: "true",
    ColumnType.MONEY: lambda c: "99.99",
}


def write_spec_csv(
    df: DataFrame,
    path: str,
    spec: FileSpec | None = None,
    single_file: bool = False,
    order_by: str | None = None,
) -> None:
    """S5: write CSV with header.  Column order comes from the DataFrame
    (mapping order — reference uses the first result row's key order, which
    is mapping order).  ``order_by`` (e.g. the line column) restores input
    order before a single-file write, matching the reference's stable
    pass-through ordering."""
    out = df
    if spec is not None:
        ordered = [c for c in spec.column_names() if c in df.columns]
        ordered += [c for c in df.columns if c not in ordered]
        out = df.select(*ordered)
    if order_by and order_by in out.columns:
        out = out.orderBy(order_by).drop(order_by)
    writer = out.coalesce(1) if single_file else out
    writer.write.mode("overwrite").option("header", "true").csv(path)


def write_single_csv_file(df: DataFrame, file_path: str, order_by: str | None = None) -> None:
    """Write exactly one CSV file at ``file_path`` (reference emits one
    output file per input file).  Spark writes a directory; we promote the
    part file.  Golden-parity path only."""
    tmp = file_path + ".spark-tmp"
    write_spec_csv(df, tmp, single_file=True, order_by=order_by)
    part = next(Path(tmp).glob("part-*.csv"))
    Path(file_path).parent.mkdir(parents=True, exist_ok=True)
    shutil.move(str(part), file_path)
    shutil.rmtree(tmp, ignore_errors=True)


def template_dataframe(spark: SparkSession, spec: FileSpec) -> DataFrame:
    """S7: one dummy row per the spec's column types (reference
    ``app.py:715-747`` writes ``_template_<id>.csv``)."""
    row = tuple(_TEMPLATE_VALUES[c.type](c) for c in spec.columns)
    return spark.createDataFrame([row], spec.spark_schema(all_string=True))


def write_template_csv(spark: SparkSession, spec: FileSpec, directory: str) -> str:
    path = str(Path(directory) / f"_template_{spec.id}.csv")
    write_single_csv_file(template_dataframe(spark, spec), path)
    return path
