"""External connectors: JDBC option assembly, distributed XML, REST API
ingest (against a local in-process HTTP server), Excel gating."""

from __future__ import annotations

import http.server
import json
import threading

import pytest

from csv_etl_spark.sources.external import (
    api_pages_to_df,
    jdbc_options,
    read_api_json,
    read_spec_excel,
    read_spec_xml,
)
from csv_etl_spark.specs import FileSpec


def _spec(names):
    return FileSpec.from_dict(
        {"id": "s", "name": "s", "columns": [{"name": n, "type": "string"} for n in names]}
    )


# ---------------------------------------------------------------------------
# JDBC
# ---------------------------------------------------------------------------


def test_jdbc_options_partitioned():
    opts = jdbc_options(
        url="jdbc:postgresql://db/x", table="t", partition_column="id",
        lower_bound=0, upper_bound=1000, num_partitions=8,
    )
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "8"
    assert opts["dbtable"] == "t"


def test_jdbc_options_partial_partition_spec_rejected():
    with pytest.raises(ValueError, match="needs partition_column"):
        jdbc_options(url="jdbc:x", table="t", partition_column="id")


def test_jdbc_options_query_and_table_exclusive():
    with pytest.raises(ValueError, match="not both"):
        jdbc_options(url="jdbc:x", table="t", query="select 1")


# ---------------------------------------------------------------------------
# XML
# ---------------------------------------------------------------------------


def test_xml_scan_all_string(spark, tmp_path):
    d = tmp_path / "xml_in"
    d.mkdir()
    (d / "a.xml").write_text(
        "<data><row><name>x</name><qty>5</qty></row>"
        "<row><name>y</name><qty>6</qty></row></data>"
    )
    (d / "b.xml").write_text("<data><row><name>z</name></row></data>")
    df = read_spec_xml(spark, str(d), _spec(["name", "qty"]), row_tag="row")
    rows = {r["name"]: r["qty"] for r in df.collect()}
    assert rows == {"x": "5", "y": "6", "z": None}  # missing element -> null


def test_xml_requires_spec(spark, tmp_path):
    with pytest.raises(ValueError, match="FileSpec"):
        read_spec_xml(spark, str(tmp_path), None)


# ---------------------------------------------------------------------------
# Excel (gated)
# ---------------------------------------------------------------------------


def _write_xlsx(
    path,
    header: list[str],
    rows: list[list],
    shared_strings: bool = False,
    sheet_name: str = "Sheet1",
):
    """Minimal ECMA-376 workbook writer (stdlib zipfile — the test fixture
    mirror of sources/xlsx.py).  ``shared_strings=False`` writes strings
    inline; True routes them through xl/sharedStrings.xml like most real
    producers do."""
    import zipfile

    def col_letter(i):
        s = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            s = chr(ord("A") + r) + s
        return s

    shared: list[str] = []

    def cell_xml(r, c, v):
        ref = f"{col_letter(c)}{r}"
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        if shared_strings:
            shared.append(str(v))
            return f'<c r="{ref}" t="s"><v>{len(shared) - 1}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{v}</t></is></c>'

    all_rows = [header] + rows
    sheet_rows = "".join(
        f'<row r="{ri + 1}">'
        + "".join(cell_xml(ri + 1, ci, v) for ci, v in enumerate(row))
        + "</row>"
        for ri, row in enumerate(all_rows)
    )
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    sheet = f'<worksheet xmlns="{ns}"><sheetData>{sheet_rows}</sheetData></worksheet>'
    workbook = (
        f'<workbook xmlns="{ns}" xmlns:r="{rns}"><sheets>'
        f'<sheet name="{sheet_name}" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    sst = (
        f'<sst xmlns="{ns}" count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{s}</t></si>" for s in shared)
        + "</sst>"
    )
    content_types = (
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/></Types>'
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
        if shared_strings:
            zf.writestr("xl/sharedStrings.xml", sst)


def test_xlsx_refless_cells_follow_previous(tmp_path):
    """Cells missing the optional ``r`` attribute (legal per ECMA-376
    §18.3.1.4; some streaming writers omit it) are placed after the
    previous cell in the row — NOT defaulted to column A, which would
    silently clobber earlier cells."""
    import zipfile

    from csv_etl_spark.sources.xlsx import xlsx_rows

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

    def c(text, ref=None):
        r = f' r="{ref}"' if ref else ""
        return f'<c{r} t="inlineStr"><is><t>{text}</t></is></c>'

    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        f'<row r="1">{c("a", "A1")}{c("b")}{c("c")}</row>'
        f'<row r="2">{c("x")}{c("z", "C2")}{c("w")}</row>'
        "</sheetData></worksheet>"
    )
    workbook = (
        f'<workbook xmlns="{ns}" xmlns:r="{rns}"><sheets>'
        '<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    path = tmp_path / "refless.xlsx"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)

    rows = xlsx_rows(path.read_bytes())
    assert rows[0] == ["a", "b", "c", None]  # b, c follow a into B1, C1
    assert rows[1] == ["x", None, "z", "w"]  # leading ref-less → col A; w → D2


def test_excel_scan_all_string(spark, tmp_path):
    """Inline-string workbook: header-keyed, numbers/bools stringified,
    missing cells null — the CSV scan contract on xlsx bytes."""
    _write_xlsx(
        tmp_path / "a.xlsx",
        ["Ticker", "Qty", "Price", "Active"],
        [["AAPL", 10, 185.5, True], ["MSFT", 5, 390, False], ["GOOG", None, 12.34, True]],
    )
    df = read_spec_excel(spark, str(tmp_path / "a.xlsx"))
    rows = {r["Ticker"]: r for r in df.collect()}
    assert df.columns == ["Ticker", "Qty", "Price", "Active"]
    assert all(t == "string" for _, t in df.dtypes)
    assert rows["AAPL"]["Qty"] == "10" and rows["AAPL"]["Price"] == "185.5"
    assert rows["AAPL"]["Active"] == "TRUE" and rows["MSFT"]["Active"] == "FALSE"
    assert rows["GOOG"]["Qty"] is None


def test_excel_shared_strings_directory_and_spec(spark, tmp_path):
    """sharedStrings workbooks in a directory scan; spec selects/declares
    columns, spec/file mismatch yields nulls (CSV-contract parity)."""
    d = tmp_path / "xl"
    d.mkdir()
    _write_xlsx(d / "a.xlsx", ["Ticker", "Qty"], [["AAPL", 1]], shared_strings=True)
    _write_xlsx(d / "b.xlsx", ["Ticker", "Qty"], [["MSFT", 2]], shared_strings=True)
    df = read_spec_excel(spark, str(d), spec=_spec(["Ticker", "Qty", "Missing"]))
    rows = {r["Ticker"]: r for r in df.collect()}
    assert set(rows) == {"AAPL", "MSFT"}
    assert rows["AAPL"]["Qty"] == "1"
    assert rows["MSFT"]["Missing"] is None


def test_excel_sheet_by_name_and_bad_sheet(spark, tmp_path):
    _write_xlsx(tmp_path / "c.xlsx", ["K"], [["v"]], sheet_name="Data")
    df = read_spec_excel(spark, str(tmp_path / "c.xlsx"), sheet="Data")
    assert [r["K"] for r in df.collect()] == ["v"]
    from csv_etl_spark.sources.xlsx import xlsx_rows

    with pytest.raises(ValueError, match="no sheet named"):
        xlsx_rows((tmp_path / "c.xlsx").read_bytes(), sheet="Nope")


# ---------------------------------------------------------------------------
# REST API — local HTTP server, no external network
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def api_server():
    pages = {
        "/items": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
        "/wrapped": {"data": [{"id": 3, "name": "c"}]},
        "/page1": [{"id": 10}],
        "/page2": [{"id": 11}, {"id": 12}],
    }

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = json.dumps(pages.get(self.path, [])).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # silence
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_read_api_json(spark, api_server):
    df = read_api_json(spark, f"{api_server}/items")
    rows = {r["id"]: r["name"] for r in df.collect()}
    assert rows == {"1": "a", "2": "b"}  # all-string contract


def test_read_api_json_record_path(spark, api_server):
    df = read_api_json(spark, f"{api_server}/wrapped", record_path="data")
    assert [r.asDict() for r in df.collect()] == [{"id": "3", "name": "c"}]


def test_api_pages_fan_out(spark, api_server):
    df = api_pages_to_df(
        spark, [f"{api_server}/page1", f"{api_server}/page2"], columns=["id"]
    )
    assert sorted(r["id"] for r in df.collect()) == ["10", "11", "12"]


# ---------------------------------------------------------------------------
# Google Sheets — CSV export endpoint (ROADMAP "Google Sheets")
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sheet_server():
    csv_body = "id,name,price\n1,apple,1.50\n2,pear\n3,fig,0.75,extra\n"

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = (csv_body if self.path.startswith("/sheet") else "").encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/csv")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_sheet_export_url():
    from csv_etl_spark.sources.external import sheet_export_url

    assert sheet_export_url("SHEET123", gid=7) == (
        "https://docs.google.com/spreadsheets/d/SHEET123/export?format=csv&gid=7"
    )


def test_read_google_sheet_all_string(spark, sheet_server):
    """Header keys columns; short rows -> null; extra cells dropped
    (DictReader-mismatch semantics); all values strings."""
    from csv_etl_spark.sources.external import read_google_sheet

    df = read_google_sheet(spark, f"{sheet_server}/sheet")
    assert df.columns == ["id", "name", "price"]
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string"] * 3
    rows = {r["id"]: (r["name"], r["price"]) for r in df.collect()}
    assert rows == {"1": ("apple", "1.50"), "2": ("pear", None), "3": ("fig", "0.75")}


def test_read_google_sheet_feeds_mapping(spark, sheet_server):
    """A sheet can feed a compiled mapping unchanged (all-string contract)."""
    from csv_etl_spark.compiler import compile_mapping
    from csv_etl_spark.sources.external import read_google_sheet

    df = read_google_sheet(spark, f"{sheet_server}/sheet")
    mapping = {
        "id": "m", "name": "m", "filter_rules": [],
        "field_mappings": [
            {"destination_field": "label", "source_field": "name",
             "transform_type": "prefix", "transform_config": {"value": "fruit:"}},
            {"destination_field": "cost", "source_field": "price",
             "transform_type": "formula", "transform_config": {"expression": "price * 2"}},
        ],
    }
    out = compile_mapping(mapping, df.columns).apply(df, with_errors=False)
    got = {r["label"]: r["cost"] for r in out.collect()}
    assert got["fruit:apple"] == 3.0
    assert got["fruit:pear"] == 0.0  # empty price -> 0, reference T7 semantics


# ---------------------------------------------------------------------------
# JDBC destination + S3 config (pure option assembly — no DB/bucket in image)
# ---------------------------------------------------------------------------


def test_jdbc_write_options():
    from csv_etl_spark.sources.external import jdbc_write_options

    opts = jdbc_write_options(
        "jdbc:postgresql://db/x", "t", user="u", password="p",
        batchsize=5000, truncate=True,
    )
    assert opts["dbtable"] == "t"
    assert opts["batchsize"] == "5000"
    assert opts["truncate"] == "true"
    assert opts["isolationLevel"] == "READ_UNCOMMITTED"
    with pytest.raises(ValueError):
        jdbc_write_options("jdbc:postgresql://db/x", "")
    with pytest.raises(ValueError):
        jdbc_write_options("jdbc:postgresql://db/x", "t", batchsize=0)


def test_s3a_conf():
    from csv_etl_spark.sources.external import s3a_conf

    c = s3a_conf(access_key="AK", secret_key="SK",
                 endpoint="http://minio:9000", path_style_access=True)
    assert c["fs.s3a.access.key"] == "AK"
    assert c["fs.s3a.endpoint"] == "http://minio:9000"
    assert c["fs.s3a.path.style.access"] == "true"

    anon = s3a_conf(anonymous=True)
    assert "AnonymousAWSCredentialsProvider" in c.get(
        "fs.s3a.aws.credentials.provider", ""
    ) or "AnonymousAWSCredentialsProvider" in anon["fs.s3a.aws.credentials.provider"]
    with pytest.raises(ValueError):
        s3a_conf(access_key="AK", anonymous=True)


def test_apply_s3a_conf_roundtrip(spark):
    from csv_etl_spark.sources.external import apply_s3a_conf, s3a_conf

    apply_s3a_conf(spark, s3a_conf(endpoint="http://e:1", path_style_access=True))
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.endpoint") == "http://e:1"
    assert hconf.get("fs.s3a.path.style.access") == "true"


# ---------------------------------------------------------------------------
# MongoDB (injected-client mapInPandas reader, reference ROADMAP.md:24,31)
# ---------------------------------------------------------------------------


def _make_fake_factory(docs, spill=None):
    """Factory-builder: the fake classes are defined INSIDE the function
    so cloudpickle serializes them by value — the test module itself is
    not importable in the executor Python workers.  Minimal
    pymongo stand-in: bounded find + insert_many; inserted docs append
    to an ndjson spill file because insert_many runs in the WORKER
    process and instance state never returns to the test process."""

    class FakeCollection:
        def __init__(self, docs, spill):
            self.docs = docs
            self.spill = spill

        def find(self, flt, projection):
            rng = flt.get("_id")
            out = []
            for d in self.docs:
                if isinstance(rng, dict):
                    if "$eq" in rng and d["_id"] != rng["$eq"]:
                        continue
                    if "$gte" in rng and d["_id"] < rng["$gte"]:
                        continue
                    if "$lt" in rng and d["_id"] >= rng["$lt"]:
                        continue
                elif rng is not None and d["_id"] != rng:
                    continue
                if all(d.get(k) == v for k, v in flt.items() if k != "_id"):
                    out.append({k: d.get(k) for k in projection if projection[k]})
            return out

        def insert_many(self, records):
            import json as _json

            with open(self.spill, "a") as f:
                for r in records:
                    f.write(_json.dumps(r, default=str) + "\n")

    class FakeClient:
        def __init__(self):
            self.coll = FakeCollection(docs, spill)

        def __getitem__(self, database):
            return {"c": self.coll}

    return FakeClient


_MONGO_DOCS = [
    {"_id": i, "name": f"doc{i}", "qty": i * 10, "tag": "a" if i % 2 else None}
    for i in range(20)
]


def test_read_mongo_partitioned(spark):
    from csv_etl_spark.sources.mongo import read_mongo

    df = read_mongo(
        spark,
        _make_fake_factory(_MONGO_DOCS),
        "db",
        "c",
        columns=["_id", "name", "qty", "tag"],
        lower_bound=0,
        upper_bound=20,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    rows = {r["_id"]: r for r in df.collect()}
    # every doc exactly once across the range slices, all-string, NULLs kept
    assert len(rows) == 20
    assert rows["7"]["name"] == "doc7" and rows["7"]["qty"] == "70"
    assert rows["2"]["tag"] is None
    assert df.columns == ["_id", "name", "qty", "tag"]


def test_read_mongo_unbounded_slices_catch_outliers(spark):
    from csv_etl_spark.sources.mongo import mongo_range_partitions, read_mongo

    # bounds deliberately UNDER-estimate the id range: the first/last
    # unbounded slices must still pick up ids outside [5, 15)
    b = mongo_range_partitions(5, 15, 3)
    assert b[0][0] is None and b[-1][1] is None and len(b) == 3
    df = read_mongo(
        spark, _make_fake_factory(_MONGO_DOCS), "db", "c",
        columns=["_id"], lower_bound=5, upper_bound=15, num_partitions=3,
    )
    assert df.count() == 20


def test_read_mongo_query_and_contract(spark):
    from csv_etl_spark.sources.mongo import read_mongo

    df = read_mongo(
        spark, _make_fake_factory(_MONGO_DOCS), "db", "c",
        columns=["_id", "tag"], query={"tag": "a"},
    )
    assert df.count() == 10
    with pytest.raises(ValueError):
        read_mongo(spark, _make_fake_factory([]), "db", "c",
                   columns=["_id"], num_partitions=2)


def _sqlite_factory(db_path):
    import functools
    import sqlite3

    return functools.partial(sqlite3.connect, db_path)


def _sqlite_write_fn(db_path):
    """Stand-in for the Spark JDBC stage write (no JDBC driver jar ships
    in-image): lands the DataFrame's rows in the staging table through
    sqlite3, driver-side."""
    def write(df, stage):
        import sqlite3

        rows = [tuple(r) for r in df.collect()]
        conn = sqlite3.connect(db_path)
        try:
            cols = ", ".join(f"{c} TEXT" for c in df.columns)
            conn.execute(f"DROP TABLE IF EXISTS {stage}")
            conn.execute(f"CREATE TABLE {stage} ({cols})")
            ph = ", ".join("?" for _ in df.columns)
            conn.executemany(f"INSERT INTO {stage} VALUES ({ph})", rows)
            conn.commit()
        finally:
            conn.close()
    return write


def test_write_jdbc_staged_rename_publishes_atomically(spark, tmp_path):
    import sqlite3

    from csv_etl_spark.sources.external import write_jdbc_staged

    db = str(tmp_path / "t.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE dest (k TEXT, v TEXT)")
    conn.execute("INSERT INTO dest VALUES ('old', 'row')")
    conn.commit(); conn.close()
    df = spark.createDataFrame([("a", "1"), ("b", "2")], ["k", "v"])
    stage = write_jdbc_staged(
        df, "dest", _sqlite_factory(db), write_fn=_sqlite_write_fn(db)
    )
    conn = sqlite3.connect(db)
    got = sorted(conn.execute("SELECT * FROM dest").fetchall())
    assert got == [("a", "1"), ("b", "2")]
    # stage is gone (renamed away), old contents replaced wholesale
    tables = {r[0] for r in conn.execute(
        "SELECT name FROM sqlite_master WHERE type='table'")}
    conn.close()
    assert stage not in tables and tables == {"dest"}


def test_write_jdbc_staged_failure_leaves_target_untouched(spark, tmp_path):
    import sqlite3

    from csv_etl_spark.sources.external import write_jdbc_staged

    db = str(tmp_path / "t.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE dest (k TEXT, v TEXT)")
    conn.execute("INSERT INTO dest VALUES ('old', 'row')")
    conn.commit(); conn.close()
    df = spark.createDataFrame([("a", "1")], ["k", "v"])

    def boom(df, stage):
        # simulate a mid-write partition failure AFTER the stage exists
        _sqlite_write_fn(db)(df, stage)
        raise RuntimeError("executor lost")

    with pytest.raises(RuntimeError, match="executor lost"):
        write_jdbc_staged(df, "dest", _sqlite_factory(db), write_fn=boom)
    conn = sqlite3.connect(db)
    assert conn.execute("SELECT * FROM dest").fetchall() == [("old", "row")]
    tables = {r[0] for r in conn.execute(
        "SELECT name FROM sqlite_master WHERE type='table'")}
    conn.close()
    assert tables == {"dest"}  # stage cleaned up


def test_write_jdbc_staged_delete_insert_and_ident_guard(spark, tmp_path):
    import sqlite3

    from csv_etl_spark.sources.external import write_jdbc_staged

    db = str(tmp_path / "t.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE dest (k TEXT, v TEXT)")
    conn.execute("INSERT INTO dest VALUES ('old', 'row')")
    conn.commit(); conn.close()
    df = spark.createDataFrame([("x", "9")], ["k", "v"])
    write_jdbc_staged(
        df, "dest", _sqlite_factory(db),
        publish="delete_insert", write_fn=_sqlite_write_fn(db),
    )
    conn = sqlite3.connect(db)
    assert conn.execute("SELECT * FROM dest").fetchall() == [("x", "9")]
    tables = {r[0] for r in conn.execute(
        "SELECT name FROM sqlite_master WHERE type='table'")}
    conn.close()
    assert tables == {"dest"}
    with pytest.raises(ValueError, match="unsafe"):
        write_jdbc_staged(df, "dest; DROP", _sqlite_factory(db))
    with pytest.raises(ValueError, match="publish"):
        write_jdbc_staged(df, "dest", _sqlite_factory(db), publish="wat")


def test_write_jdbc_staged_delete_insert_reordered_target(spark, tmp_path):
    """delete_insert must write BY COLUMN NAME: a pre-existing target
    whose column order differs from the DataFrame's (both TEXT, so a
    positional INSERT would succeed silently) must still land each value
    in the right column (r11 ADVICE silent-corruption path)."""
    import sqlite3

    from csv_etl_spark.sources.external import write_jdbc_staged

    db = str(tmp_path / "t.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE dest (v TEXT, k TEXT)")  # reversed order
    conn.execute("INSERT INTO dest VALUES ('0', 'old')")
    conn.commit(); conn.close()
    df = spark.createDataFrame([("key1", "val1")], ["k", "v"])
    write_jdbc_staged(
        df, "dest", _sqlite_factory(db),
        publish="delete_insert", write_fn=_sqlite_write_fn(db),
    )
    conn = sqlite3.connect(db)
    got = conn.execute("SELECT k, v FROM dest").fetchall()
    conn.close()
    assert got == [("key1", "val1")]


def test_read_mongo_partitioned_equality_no_duplication(spark):
    """An equality predicate on the partition column must intersect the
    range slices ($eq inside the operator doc), not replace them — the
    r10 ADVICE bug returned each match once PER PARTITION."""
    from csv_etl_spark.sources.mongo import _range_filter, read_mongo

    assert _range_filter("_id", 0, 5, {"_id": 7}) == {
        "_id": {"$eq": 7, "$gte": 0, "$lt": 5}
    }
    df = read_mongo(
        spark, _make_fake_factory(_MONGO_DOCS), "db", "c",
        columns=["_id", "name"], lower_bound=0, upper_bound=20,
        num_partitions=4, query={"_id": 7},
    )
    rows = df.collect()
    assert [r["_id"] for r in rows] == ["7"]


def test_write_mongo_roundtrip(spark, tmp_path):
    from csv_etl_spark.sources.mongo import write_mongo

    spill = str(tmp_path / "inserted.ndjson")
    open(spill, "w").close()
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(7)], ["k", "name"]
    ).repartition(3)
    n = write_mongo(df, _make_fake_factory([], spill), "db", "c", batch_size=2)
    assert n == 7
    got = sorted(json.loads(l)["k"] for l in open(spill))
    assert got == list(range(7))
