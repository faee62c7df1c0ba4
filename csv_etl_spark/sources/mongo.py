"""MongoDB source/destination (reference ROADMAP.md:24,31 — the last
roadmapped database family; PG/MySQL/SQLite/MSSQL ride the JDBC path in
``external.py``).

Spark has no built-in Mongo connector in this environment, so the scan
is an injected-client ``mapInPandas`` fan-out over ``_id``-range
partitions — the same partitioning contract as ``read_jdbc``
(partition_column/lower/upper/num_partitions, stride-sliced with the
first and last slices unbounded so no document outside [lower, upper)
is silently dropped), and the same test seam as ``read_api_json``
(the client is a zero-arg FACTORY constructed on the executor, so
tests inject a fake and production injects
``lambda: pymongo.MongoClient(uri)`` without this module importing
pymongo at all).

Scale shape: one executor task per range slice, each issuing one
bounded ``find`` — the document-store analogue of the JDBC partitioned
scan.  Results surface as an ALL-STRING DataFrame in declared column
order (the reference's header-keyed all-string scan contract,
sources.json parity — typing happens downstream in the mapping layer,
csv_source.py:26 discipline).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def mongo_range_partitions(
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
) -> list[tuple[int | None, int | None]]:
    """Stride-slice [lower_bound, upper_bound) into ``num_partitions``
    (lo, hi) half-open ranges on the partition column — Spark's JDBC
    partitioning contract: the FIRST slice has ``lo=None`` (unbounded
    below) and the LAST ``hi=None`` (unbounded above), so rows outside
    the caller's bound estimate still land in a partition instead of
    vanishing.  Pure function; unit-tested without a live server."""
    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    if upper_bound <= lower_bound:
        raise ValueError("upper_bound must be > lower_bound")
    if num_partitions == 1:
        return [(None, None)]
    stride = (upper_bound - lower_bound) / num_partitions
    cuts = [round(lower_bound + stride * i) for i in range(1, num_partitions)]
    bounds: list[tuple[int | None, int | None]] = []
    prev: int | None = None
    for c in cuts:
        bounds.append((prev, c))
        prev = c
    bounds.append((prev, None))
    return bounds


def _range_filter(
    partition_column: str, lo: Any, hi: Any, query: dict | None
) -> dict:
    """Merge a (lo, hi] range predicate on the partition column into the
    caller's base query (the JDBC ``WHERE col >= lo AND col < hi`` shape
    as a Mongo filter document)."""
    rng: dict[str, Any] = {}
    if lo is not None:
        rng["$gte"] = lo
    if hi is not None:
        rng["$lt"] = hi
    out = dict(query or {})
    if rng:
        # merge with any caller predicate on the same column
        existing = out.get(partition_column)
        if isinstance(existing, dict):
            out[partition_column] = {**existing, **rng}
        elif existing is not None:
            # equality predicate + range: INTERSECT them.  Keeping the
            # bare equality in every slice would return each matching
            # document once per partition (num_partitions x duplication)
            # because all slices then issue the identical filter; Mongo
            # accepts $eq alongside range operators in one operator doc,
            # so the value survives in exactly the slice whose [lo, hi)
            # contains it and matches nothing elsewhere.
            out[partition_column] = {"$eq": existing, **rng}
        else:
            out[partition_column] = rng
    return out


def read_mongo(
    spark: SparkSession,
    client_factory: Callable[[], Any],
    database: str,
    collection: str,
    columns: list[str],
    partition_column: str = "_id",
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 1,
    query: dict | None = None,
) -> DataFrame:
    """Partitioned scan of one Mongo collection into an all-string
    DataFrame with exactly ``columns`` in declared order.

    ``client_factory`` is a zero-arg picklable callable run ON THE
    EXECUTOR once per task (e.g. ``functools.partial(pymongo.
    MongoClient, uri)``); each task issues one ``find`` bounded to its
    ``partition_column`` range slice.  Unpartitioned (``num_partitions
    == 1``, the default) needs no bounds; a partitioned read requires
    both bounds, mirroring ``jdbc_options``'s all-or-nothing rule.
    Missing fields surface as NULL (document stores are schemaless;
    the declared column list IS the schema, reference sources.json
    parity)."""
    if num_partitions > 1:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned Mongo read needs lower_bound AND upper_bound "
                "(the jdbc_options contract)"
            )
        bounds = mongo_range_partitions(lower_bound, upper_bound, num_partitions)
    else:
        bounds = [(None, None)]

    schema = T.StructType([T.StructField(c, T.StringType()) for c in columns])
    projection = {c: 1 for c in columns}
    if "_id" not in projection:
        projection["_id"] = 0

    def fetch(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = None
        for pdf in iterator:
            if client is None and len(pdf):
                client = client_factory()
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                flt = _range_filter(
                    partition_column,
                    None if pd.isna(lo) else int(lo),
                    None if pd.isna(hi) else int(hi),
                    query,
                )
                docs = list(client[database][collection].find(flt, projection))
                yield pd.DataFrame(
                    {
                        c: [
                            None if d.get(c) is None else str(d.get(c))
                            for d in docs
                        ]
                        for c in columns
                    },
                    dtype=object,
                )

    bounds_df = spark.createDataFrame(
        [(lo, hi) for lo, hi in bounds], schema="lo long, hi long"
    )
    return bounds_df.repartition(len(bounds)).mapInPandas(fetch, schema)


def write_mongo(
    df: DataFrame,
    client_factory: Callable[[], Any],
    database: str,
    collection: str,
    batch_size: int = 1000,
) -> int:
    """Append every row of ``df`` to one collection via per-partition
    ``insert_many`` batches (one client per task, executor-side —
    the destination half of ROADMAP.md:31).  Returns the number of
    documents written (the sink-count contract of sinks.write_csv).

    This is an ACTION: rows stream executor→Mongo directly, never
    through the driver."""
    cols = df.columns

    def insert(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = None
        n = 0
        for pdf in iterator:
            if client is None and len(pdf):
                client = client_factory()
            records = pdf[cols].to_dict("records")
            for i in range(0, len(records), batch_size):
                client[database][collection].insert_many(
                    records[i : i + batch_size]
                )
            n += len(records)
        yield pd.DataFrame({"n": [n]})

    counts = df.mapInPandas(insert, "n long")
    return sum(r["n"] for r in counts.collect())  # ≤ n_partitions rows
