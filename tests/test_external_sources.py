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


def test_excel_raises_clear_error_without_engine(spark, tmp_path):
    try:
        import openpyxl  # noqa: F401

        pytest.skip("openpyxl installed; gate not active")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="openpyxl"):
        read_spec_excel(spark, str(tmp_path / "x.xlsx"))


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
