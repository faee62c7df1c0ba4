"""External source connectors (extension; reference ROADMAP.md:15-45 plans
database sources/destinations, Excel, XML, and REST API endpoints).

Everything follows the engine's data-model contract: rows arrive all-string
(typing happens inside compiled transforms), so any of these can feed any
compiled mapping unchanged.

Scale notes per connector:

* JDBC — Spark's built-in partitioned JDBC scan: with
  (partition_column, lower/upper bound, num_partitions) the table is read
  by N executors in parallel, each with its own WHERE range.  This is the
  100 TB-capable path (modulo the database's own throughput).
* XML — stdlib ElementTree parse per file, distributed via
  ``binaryFile`` + ``mapInPandas`` so a directory of XML files scans in
  parallel (one file = one task; XML is not line-splittable, so per-file
  is the natural parallel grain — same model as spark-xml's file mode).
* Excel — REAL reader with zero codec dependencies: .xlsx is ZIP-of-XML
  (ECMA-376), parsed with stdlib zipfile + ElementTree (sources/xlsx.py),
  distributed per file via ``binaryFile`` + ``mapInPandas`` exactly like
  the XML path (a workbook is not splittable; file = parallel grain).
* REST API — driver-side fetch (an API endpoint is not a distributed
  source); result lands in a DataFrame and scales out from there.  For
  paginated bulk APIs you'd fan page-fetches out via a parallelized RDD of
  page URLs — ``api_pages_to_df`` does exactly that.
* Google Sheets — the CSV-export endpoint of a published/link-shared
  sheet, fetched driver-side (a sheet is capped at 10M cells — never a
  distributed-scan problem) and parallelized from there.  Private sheets
  need OAuth and belong behind a credential store — out of scope here;
  the URL builder + reader cover the published-sheet path the reference
  ROADMAP plans.
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from csv_etl_spark.specs import FileSpec


# ---------------------------------------------------------------------------
# JDBC (reference ROADMAP.md:17-29 database sources)
# ---------------------------------------------------------------------------


def jdbc_options(
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10000,
    query: str | None = None,
) -> dict[str, str]:
    """Assemble the option map for a (possibly partitioned) JDBC scan.

    Pure function so the partitioning contract is unit-testable without a
    live database: partitioned reads require all four of partition_column/
    lowerBound/upperBound/numPartitions, and ``query`` and ``table`` are
    mutually exclusive (Spark's own constraint)."""
    if query and table:
        raise ValueError("pass either table or query, not both")
    opts: dict[str, str] = {"url": url, "fetchsize": str(fetchsize)}
    if table:
        opts["dbtable"] = table
    if query:
        opts["query"] = query
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    part = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(p is not None for p in part):
        if any(p is None for p in part):
            raise ValueError(
                "partitioned JDBC read needs partition_column, lower_bound, "
                "upper_bound AND num_partitions"
            )
        if query:
            raise ValueError("partitioned read requires dbtable, not query")
        opts.update(
            partitionColumn=str(partition_column),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def read_jdbc(spark: SparkSession, **kwargs) -> DataFrame:
    """Partitioned JDBC scan (see jdbc_options for the knobs)."""
    return spark.read.format("jdbc").options(**jdbc_options(**kwargs)).load()


# ---------------------------------------------------------------------------
# XML (reference ROADMAP.md:41 "XML files")
# ---------------------------------------------------------------------------


def read_spec_xml(
    spark: SparkSession,
    path: str,
    spec: FileSpec | None = None,
    row_tag: str = "row",
) -> DataFrame:
    """All-string XML scan: every ``<row_tag>`` element becomes a row; its
    child elements' text become columns.  Distributed per file via
    binaryFile + mapInPandas (XML cannot split within a file)."""
    cols = spec.column_names() if spec else None
    files = spark.read.format("binaryFile").option("pathGlobFilter", "*.xml").load(path)

    known_cols = cols  # close over; None = discover from data

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                root = ET.fromstring(bytes(blob).decode("utf-8"))
                elems = root.iter(row_tag) if root.tag != row_tag else [root]
                for el in elems:
                    rows.append({child.tag: child.text for child in el})
            if known_cols is None:
                raise ValueError(
                    "read_spec_xml without a spec needs explicit columns; "
                    "pass a FileSpec so the schema is declared"
                )
            yield pd.DataFrame(
                {c: [r.get(c) for r in rows] for c in known_cols}, dtype=object
            )

    if cols is None:
        raise ValueError("read_spec_xml requires a FileSpec (declared schema)")
    schema = T.StructType([T.StructField(c, T.StringType()) for c in cols])
    return files.select("content").mapInPandas(parse, schema)


# ---------------------------------------------------------------------------
# Excel (reference ROADMAP.md:39) — dependency-free OOXML parser
# ---------------------------------------------------------------------------


def read_spec_excel(
    spark: SparkSession,
    path: str,
    spec: FileSpec | None = None,
    sheet: str | int = 0,
    has_header: bool = True,
) -> DataFrame:
    """All-string Excel scan — a REAL implementation with no Excel-codec
    dependency: .xlsx is ZIP-of-XML (ECMA-376 SpreadsheetML), parsed with
    stdlib zipfile + ElementTree (csv_etl_spark.sources.xlsx).

    Distributed per file via binaryFile + mapInPandas like the XML path
    (a workbook is not splittable; one file = one task).  Header row keys
    the columns (csv.DictReader semantics, reference dynamic.py:298-302);
    with a ``spec``, its declared columns select/rename the output and a
    file/spec mismatch yields nulls — matching the CSV scan contract.
    Without a spec, the schema is discovered from the first file's header
    (one driver-side peek)."""
    from pathlib import Path

    from csv_etl_spark.sources.xlsx import xlsx_dicts, xlsx_header

    p = Path(path)
    if p.is_dir():
        files = (
            spark.read.format("binaryFile").option("pathGlobFilter", "*.xlsx").load(str(p))
        )
    else:
        files = spark.read.format("binaryFile").load(str(p))

    if spec is not None:
        cols = spec.column_names()
    else:
        first = min(p.glob("*.xlsx")) if p.is_dir() else p
        cols = xlsx_header(first.read_bytes(), sheet)
        if not cols:
            raise ValueError(f"no header row found in {first}")

    known_cols = list(cols)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for blob in pdf["content"]:
                rows.extend(xlsx_dicts(bytes(blob), sheet, has_header))
            yield pd.DataFrame(
                {c: [r.get(c) for r in rows] for c in known_cols}, dtype=object
            )

    schema = T.StructType([T.StructField(c, T.StringType()) for c in known_cols])
    return files.select("content").mapInPandas(parse, schema)


# ---------------------------------------------------------------------------
# REST API (reference ROADMAP.md:42 "REST API endpoints")
# ---------------------------------------------------------------------------


def _rows_to_string_df(spark: SparkSession, rows: list[dict], columns: list[str] | None) -> DataFrame:
    if columns is None:
        seen: dict[str, None] = {}
        for r in rows:
            for k in r:
                seen.setdefault(k)
        columns = list(seen)
    schema = T.StructType([T.StructField(c, T.StringType()) for c in columns])
    data = [
        tuple(None if r.get(c) is None else str(r.get(c)) for c in columns) for r in rows
    ]
    return spark.createDataFrame(data, schema)


def read_api_json(
    spark: SparkSession,
    url: str,
    columns: list[str] | None = None,
    record_path: str | None = None,
    timeout: int = 30,
) -> DataFrame:
    """Fetch one JSON endpoint (array of objects, or an object whose
    ``record_path`` key holds the array) into an all-string DataFrame."""
    import requests

    payload = requests.get(url, timeout=timeout).json()
    if record_path is not None:
        payload = payload[record_path]
    if not isinstance(payload, list):
        raise ValueError("endpoint did not return a JSON array of records")
    return _rows_to_string_df(spark, payload, columns)


def api_pages_to_df(
    spark: SparkSession,
    urls: list[str],
    columns: list[str],
    timeout: int = 30,
) -> DataFrame:
    """Paginated-API fan-out: the page-URL list is parallelized so each
    executor fetches its own pages — the bulk-extract pattern for APIs
    that shard by page/cursor."""
    schema = T.StructType([T.StructField(c, T.StringType()) for c in columns])

    def fetch(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import requests

        for pdf in iterator:
            rows: list[dict] = []
            for u in pdf["url"]:
                payload = requests.get(u, timeout=timeout).json()
                rows.extend(payload if isinstance(payload, list) else [payload])
            yield pd.DataFrame(
                {c: [None if r.get(c) is None else str(r.get(c)) for r in rows] for c in columns},
                dtype=object,
            )

    url_df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return url_df.repartition(max(len(urls), 1)).mapInPandas(fetch, schema)


# ---------------------------------------------------------------------------
# Google Sheets (reference ROADMAP.md:43 "Google Sheets")
# ---------------------------------------------------------------------------


def sheet_export_url(spreadsheet_id: str, gid: int = 0) -> str:
    """CSV-export URL for one tab of a published/link-shared spreadsheet."""
    return (
        "https://docs.google.com/spreadsheets/d/"
        f"{spreadsheet_id}/export?format=csv&gid={gid}"
    )


def read_google_sheet(
    spark: SparkSession,
    sheet: str,
    gid: int = 0,
    columns: list[str] | None = None,
    timeout: int = 30,
) -> DataFrame:
    """Read one sheet tab into an all-string DataFrame.

    ``sheet`` is a spreadsheet id or any full URL returning CSV (the
    export endpoint, or a test server).  Header row keys the columns —
    same contract as the CSV scan: all values strings, typing happens in
    compiled transforms, so a sheet can feed any mapping unchanged.
    ``columns`` overrides/paddings the projection like the REST reader
    (missing columns → null), matching the spec/file-mismatch semantics
    of the reference's DictReader."""
    import csv as _csv
    import io

    import requests

    url = sheet if "://" in sheet else sheet_export_url(sheet, gid)
    resp = requests.get(url, timeout=timeout)
    resp.raise_for_status()
    rdr = _csv.reader(io.StringIO(resp.text))
    table = [row for row in rdr]
    if not table:
        raise ValueError(f"sheet at {url} is empty (no header row)")
    header, data = table[0], table[1:]
    rows = [
        {h: (row[i] if i < len(row) else None) for i, h in enumerate(header)}
        for row in data
    ]
    return _rows_to_string_df(spark, rows, columns or header)


# ---------------------------------------------------------------------------
# JDBC destination (reference ROADMAP.md:24-33 database destinations,
# "Batch insert/upsert for destinations")
# ---------------------------------------------------------------------------


def jdbc_write_options(
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    batchsize: int = 10000,
    isolation_level: str = "READ_UNCOMMITTED",
    truncate: bool = False,
) -> dict[str, str]:
    """Option map for a batched JDBC write.

    ``batchsize`` controls rows per INSERT batch (each write task runs its
    own batched transaction — N partitions insert in parallel, the database
    is the throughput ceiling).  ``truncate`` keeps the table's DDL on
    overwrite instead of drop/recreate.  Pure function → unit-testable
    without a live database, like ``jdbc_options``."""
    if not table:
        raise ValueError("jdbc write needs a destination table")
    if batchsize < 1:
        raise ValueError("batchsize must be >= 1")
    opts = {
        "url": url,
        "dbtable": table,
        "batchsize": str(batchsize),
        "isolationLevel": isolation_level,
        "truncate": str(truncate).lower(),
    }
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    return opts


def write_jdbc(df: DataFrame, mode: str = "append", **kwargs) -> None:
    """Batched parallel JDBC write (see jdbc_write_options for knobs).

    mode="append" is the plain batch insert; for upsert semantics stage
    into a temp table and MERGE database-side, or pre-merge in Spark with
    ``sources.edits.merge_upsert`` and overwrite (truncate=True)."""
    df.write.format("jdbc").options(**jdbc_write_options(**kwargs)).mode(mode).save()


def _safe_ident(name: str) -> str:
    """Refuse identifiers that cannot be safely interpolated into the
    publish DDL (the staging/target names reach driver-side SQL)."""
    if not name or not all(c.isalnum() or c == "_" for c in name):
        raise ValueError(f"unsafe SQL identifier: {name!r}")
    return name


def write_jdbc_staged(
    df: DataFrame,
    table: str,
    connection_factory,
    publish: str = "rename",
    write_fn=None,
    **jdbc_kwargs,
) -> str:
    """Staged-ATOMIC JDBC write — transaction-with-rollback semantics for
    a parallel writer (reference ROADMAP.md:41 "Transaction support with
    rollback on errors", the last substantive roadmap item).

    Spark's JDBC writer commits PER PARTITION: a mid-write failure
    leaves the destination half-written, and no amount of isolationLevel
    tuning fixes that — atomicity has to come from staging.  Discipline:

    1. the full parallel write lands in ``<table>__stage`` (overwritten
       if a previous failed run left one behind) — partial failures
       corrupt only the stage;
    2. publish is ONE driver-side transaction through
       ``connection_factory`` (a zero-arg callable returning a DBAPI
       connection — e.g. ``functools.partial(psycopg2.connect, dsn)``):
       * ``publish="rename"``: drop target if present, rename stage →
         target (transactional DDL on PostgreSQL/SQLite; on MySQL,
         ``RENAME TABLE`` is itself atomic but implicitly commits — the
         swap is still all-or-nothing, the drop+rename pair is not:
         use ``delete_insert`` there for strict atomicity);
       * ``publish="delete_insert"``: ``DELETE FROM target; INSERT INTO
         target SELECT * FROM stage`` in one transaction (target must
         already exist; preserves grants/indexes/views on engines where
         rename would drop them), then the stage is dropped outside it;
    3. any failure before the commit rolls back and drops the stage —
       the target is never touched.

    ``write_fn(df, stage_table)`` overrides step 1 (tests inject a
    DBAPI-backed writer because no JDBC driver jar ships in-image; the
    default is the real ``write_jdbc`` overwrite).  Returns the staging
    table name it used.  At 100 TB the staged write is the same
    parallel-partition stream as before — the only serial section is
    the metadata swap."""
    target = _safe_ident(table)
    stage = _safe_ident(f"{table}__stage")
    if publish not in ("rename", "delete_insert"):
        raise ValueError("publish must be 'rename' or 'delete_insert'")
    def _drop_stage() -> None:
        conn = connection_factory()
        try:
            conn.cursor().execute(f"DROP TABLE IF EXISTS {stage}")
            conn.commit()
        finally:
            conn.close()

    try:
        if write_fn is not None:
            write_fn(df, stage)
        else:
            write_jdbc(df, mode="overwrite", table=stage, **jdbc_kwargs)
    except Exception:
        _drop_stage()
        raise
    conn = connection_factory()
    try:
        cur = conn.cursor()
        if publish == "rename":
            cur.execute(f"DROP TABLE IF EXISTS {target}")
            cur.execute(f"ALTER TABLE {stage} RENAME TO {target}")
            conn.commit()
        else:
            # explicit column list on BOTH sides: the stage table has the
            # DataFrame's column order, but a pre-existing target may not
            # — positional `INSERT ... SELECT *` would silently write
            # same-typed columns into the wrong slots (r11 ADVICE)
            cols = ", ".join(_safe_ident(c) for c in df.columns)
            cur.execute(f"DELETE FROM {target}")
            cur.execute(
                f"INSERT INTO {target} ({cols}) SELECT {cols} FROM {stage}"
            )
            conn.commit()
            cur.execute(f"DROP TABLE IF EXISTS {stage}")
            conn.commit()
    except Exception:
        conn.rollback()
        conn.close()
        _drop_stage()
        raise
    conn.close()
    return stage


# ---------------------------------------------------------------------------
# S3 / cloud object storage (reference ROADMAP.md:44 "S3 / Cloud storage")
# ---------------------------------------------------------------------------


def s3a_conf(
    access_key: str | None = None,
    secret_key: str | None = None,
    endpoint: str | None = None,
    path_style_access: bool = False,
    anonymous: bool = False,
) -> dict[str, str]:
    """Hadoop configuration for reading/writing ``s3a://`` paths — every
    ``spark.read``/``df.write`` accepts such URIs directly once these are
    set (no connector code needed; object stores are Hadoop filesystems).

    ``endpoint`` + ``path_style_access`` cover S3-compatible stores
    (MinIO, R2, GCS interop).  ``anonymous`` switches to unauthenticated
    access for public buckets.  Pure option assembly (unit-testable; the
    hadoop-aws jars must be on the cluster classpath at deploy time —
    spark.jars.packages org.apache.hadoop:hadoop-aws)."""
    if anonymous and (access_key or secret_key):
        raise ValueError("anonymous access excludes explicit credentials")
    conf: dict[str, str] = {}
    if anonymous:
        conf["fs.s3a.aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
        )
    if access_key is not None:
        conf["fs.s3a.access.key"] = access_key
    if secret_key is not None:
        conf["fs.s3a.secret.key"] = secret_key
    if endpoint is not None:
        conf["fs.s3a.endpoint"] = endpoint
    if path_style_access:
        conf["fs.s3a.path.style.access"] = "true"
    return conf


def apply_s3a_conf(spark: SparkSession, conf: dict[str, str]) -> None:
    """Install s3a settings into the live session's Hadoop configuration."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in conf.items():
        hconf.set(k, v)
