"""Tests for the mapping-language extensions beyond the reference:
lookup_table (broadcast join), aggregation mappings, chained mappings,
JSON source/sink, and stateful streaming ops (applyInPandasWithState)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from csv_etl_spark.compiler import ERRORS_COL, compile_mapping
from csv_etl_spark.plans import chain_mappings, run_mapping
from csv_etl_spark.sources.json_source import read_spec_json, write_spec_json
from csv_etl_spark.specs import ETLMapping, FileSpec

from tests.conftest import rows_as_dicts


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


# ---------------------------------------------------------------------------
# lookup_table
# ---------------------------------------------------------------------------


def test_lookup_table_broadcast_join(spark):
    src = _df(spark, [("1", "a"), ("2", "b"), ("9", "c")], ["code", "x"])
    lut = _df(spark, [("1", "one"), ("2", "two")], ["k", "v"])
    mapping = {
        "id": "m", "name": "m", "filter_rules": [],
        "field_mappings": [
            {"destination_field": "x", "source_field": "x",
             "transform_type": "direct", "transform_config": {}},
            {"destination_field": "word", "source_field": "code",
             "transform_type": "lookup_table",
             "transform_config": {"table": "codes", "key": "k", "value": "v",
                                  "_default": "unknown"}},
        ],
    }
    out = run_mapping(src, mapping, tables={"codes": lut})
    got = {r["x"]: r["word"] for r in out.collect()}
    assert got == {"a": "one", "b": "two", "c": "unknown"}


def test_lookup_table_miss_with_null_default_errors(spark):
    src = _df(spark, [("1",), ("9",)], ["code"])
    lut = _df(spark, [("1", "one")], ["k", "v"])
    mapping = {
        "id": "m", "name": "m", "filter_rules": [],
        "field_mappings": [
            {"destination_field": "word", "source_field": "code",
             "transform_type": "lookup_table",
             "transform_config": {"table": "codes", "key": "k", "value": "v"}},
        ],
    }
    out = run_mapping(src, mapping, tables={"codes": lut})
    rows = {r["word"]: r for r in rows_as_dicts(out)}
    assert rows["one"][ERRORS_COL] == []
    missed = rows[None]
    assert missed[ERRORS_COL][0]["message"] == "Lookup value not found in lookup table"
    assert missed[ERRORS_COL][0]["source_value"] == "9"


def test_lookup_table_duplicate_keys_do_not_fan_out(spark):
    src = _df(spark, [("1", "a")], ["code", "x"])
    lut = _df(spark, [("1", "one"), ("1", "uno")], ["k", "v"])
    mapping = {
        "id": "m", "name": "m", "filter_rules": [],
        "field_mappings": [
            {"destination_field": "word", "source_field": "code",
             "transform_type": "lookup_table",
             "transform_config": {"table": "codes", "key": "k", "value": "v"}},
        ],
    }
    out = run_mapping(src, mapping, tables={"codes": lut})
    assert out.count() == 1


def test_lookup_table_missing_tables_arg_raises(spark):
    src = _df(spark, [("1",)], ["code"])
    mapping = {
        "id": "m", "name": "m", "filter_rules": [],
        "field_mappings": [
            {"destination_field": "word", "source_field": "code",
             "transform_type": "lookup_table",
             "transform_config": {"table": "codes", "key": "k", "value": "v"}},
        ],
    }
    with pytest.raises(ValueError, match="lookup table 'codes'"):
        run_mapping(src, mapping)


# ---------------------------------------------------------------------------
# aggregation mappings
# ---------------------------------------------------------------------------


def test_aggregation_mapping_group_by(spark):
    src = _df(
        spark,
        [("a", "1.5"), ("a", "2.5"), ("b", "10"), ("b", ""), ("c", "junk")],
        ["grp", "amount"],
    )
    mapping = {
        "id": "m", "name": "m", "filter_rules": [],
        "field_mappings": [
            {"destination_field": "grp", "source_field": "grp",
             "transform_type": "direct", "transform_config": {}},
            {"destination_field": "amount", "source_field": "amount",
             "transform_type": "direct", "transform_config": {}},
        ],
        "group_by": ["grp"],
        "aggregations": [
            {"destination_field": "total", "source_field": "amount", "agg": "sum"},
            {"destination_field": "n", "agg": "count"},
            {"destination_field": "avg_amount", "source_field": "amount", "agg": "avg"},
        ],
    }
    out = run_mapping(src, mapping, with_errors=False)
    got = {r["grp"]: (r["total"], r["n"], r["avg_amount"]) for r in out.collect()}
    assert got["a"] == (4.0, 2, 2.0)
    assert got["b"] == (10.0, 2, 10.0)  # empty string -> null, excluded from avg
    assert got["c"] == (None, 1, None)  # junk -> null under try_cast


def test_aggregation_mapping_global(spark):
    src = _df(spark, [("1",), ("2",), ("3",)], ["v"])
    mapping = {
        "id": "m", "name": "m", "filter_rules": [],
        "field_mappings": [
            {"destination_field": "v", "source_field": "v",
             "transform_type": "direct", "transform_config": {}},
        ],
        "aggregations": [
            {"destination_field": "mx", "source_field": "v", "agg": "max"},
            {"destination_field": "mn", "source_field": "v", "agg": "min"},
        ],
    }
    out = run_mapping(src, mapping, with_errors=False)
    r = out.collect()[0]
    assert (r["mx"], r["mn"]) == (3.0, 1.0)


def test_aggregation_roundtrips_through_json(spark):
    m = ETLMapping.from_dict(
        {
            "id": "m", "name": "m",
            "field_mappings": [],
            "group_by": ["g"],
            "aggregations": [{"destination_field": "n", "agg": "count"}],
        }
    )
    again = ETLMapping.from_dict(json.loads(json.dumps(m.to_dict())))
    assert again.group_by == ["g"]
    assert again.aggregations == [{"destination_field": "n", "agg": "count"}]


# ---------------------------------------------------------------------------
# chained mappings
# ---------------------------------------------------------------------------


def test_chain_mappings_two_stages(spark):
    src = _df(spark, [("x", "2"), ("y", "3"), ("skipme", "4")], ["name", "qty"])
    stage1 = {
        "id": "s1", "name": "s1",
        "filter_rules": [{"field": "name", "operator": "equals", "value": "skipme"}],
        "field_mappings": [
            {"destination_field": "label", "source_field": "name",
             "transform_type": "prefix", "transform_config": {"value": "item:"}},
            {"destination_field": "doubled", "source_field": None,
             "transform_type": "formula", "transform_config": {"expression": "qty * 2"}},
        ],
    }
    stage2 = {
        "id": "s2", "name": "s2", "filter_rules": [],
        "field_mappings": [
            {"destination_field": "label", "source_field": "label",
             "transform_type": "suffix", "transform_config": {"value": "!"}},
            {"destination_field": "quad", "source_field": None,
             "transform_type": "formula", "transform_config": {"expression": "doubled * 2"}},
        ],
    }
    out = chain_mappings(src, [stage1, stage2])
    got = {r["label"]: r["quad"] for r in out.collect()}
    assert got == {"item:x!": 8.0, "item:y!": 12.0}


def test_chain_mappings_accumulates_errors(spark):
    src = _df(spark, [("notadate", "zz")], ["d", "q"])
    stage1 = {
        "id": "s1", "name": "s1", "filter_rules": [],
        "field_mappings": [
            {"destination_field": "day", "source_field": "d",
             "transform_type": "date_format",
             "transform_config": {"input_format": "%Y-%m-%d", "output_format": "%d.%m.%Y"}},
            {"destination_field": "q", "source_field": "q",
             "transform_type": "direct", "transform_config": {}},
        ],
    }
    stage2 = {
        "id": "s2", "name": "s2", "filter_rules": [],
        "field_mappings": [
            {"destination_field": "day", "source_field": "day",
             "transform_type": "direct", "transform_config": {}},
            {"destination_field": "qn", "source_field": None,
             "transform_type": "formula", "transform_config": {"expression": "q + 1"}},
        ],
    }
    out = chain_mappings(src, [stage1, stage2])
    rows = rows_as_dicts(out)
    assert len(rows) == 1
    fields = [e["field"] for e in rows[0][ERRORS_COL]]
    assert "day" in fields  # stage-1 date error carried through stage 2


def test_chain_with_final_aggregation(spark):
    src = _df(spark, [("a", "1"), ("a", "2"), ("b", "5")], ["g", "v"])
    stage1 = {
        "id": "s1", "name": "s1", "filter_rules": [],
        "field_mappings": [
            {"destination_field": "g", "source_field": "g",
             "transform_type": "direct", "transform_config": {}},
            {"destination_field": "v10", "source_field": None,
             "transform_type": "formula", "transform_config": {"expression": "v * 10"}},
        ],
    }
    stage2 = {
        "id": "s2", "name": "s2", "filter_rules": [],
        "field_mappings": [
            {"destination_field": "g", "source_field": "g",
             "transform_type": "direct", "transform_config": {}},
            {"destination_field": "v10", "source_field": "v10",
             "transform_type": "direct", "transform_config": {}},
        ],
        "group_by": ["g"],
        "aggregations": [
            {"destination_field": "total", "source_field": "v10", "agg": "sum"},
        ],
    }
    out = chain_mappings(src, [stage1, stage2])
    got = {r["g"]: r["total"] for r in out.collect()}
    assert got == {"a": 30.0, "b": 50.0}


# ---------------------------------------------------------------------------
# JSON source/sink
# ---------------------------------------------------------------------------


def test_json_roundtrip_with_spec(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.json").write_text(
        '{"name": "x", "qty": 5}\n{"name": "y", "qty": 6.5, "extra": true}\n'
    )
    spec = FileSpec.from_dict(
        {"id": "j", "name": "j",
         "columns": [{"name": "name", "type": "string"}, {"name": "qty", "type": "float"}]}
    )
    df = read_spec_json(spark, str(d), spec)
    rows = {r["name"]: r["qty"] for r in df.collect()}
    # all-string model: JSON numbers arrive as their text
    assert rows == {"x": "5", "y": "6.5"}

    out = tmp_path / "out"
    write_spec_json(df, str(out), single_file=True)
    back = read_spec_json(spark, str(out), spec)
    assert {r["name"]: r["qty"] for r in back.collect()} == rows


def test_json_mapping_end_to_end(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.json").write_text('{"code": "1"}\n{"code": "2"}\n')
    df = read_spec_json(spark, str(d))
    mapping = {
        "id": "m", "name": "m", "filter_rules": [],
        "field_mappings": [
            {"destination_field": "tag", "source_field": "code",
             "transform_type": "prefix", "transform_config": {"value": "c-"}},
        ],
    }
    out = run_mapping(df, mapping, with_errors=False)
    assert sorted(r["tag"] for r in out.collect()) == ["c-1", "c-2"]
