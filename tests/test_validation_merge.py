"""Spec-driven validation rules and merge/upsert."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csv_etl_spark.compiler import ERRORS_COL
from csv_etl_spark.plans.validation import validate_against_spec
from csv_etl_spark.sources.edits import merge_upsert
from csv_etl_spark.specs import FileSpec


def _spec(cols):
    return FileSpec.from_dict({"id": "s", "name": "s", "columns": cols})


def test_validate_required_and_max_length(spark):
    df = spark.createDataFrame(
        [("x", "short"), ("", "this is way too long"), (None, "ok")], ["name", "note"]
    )
    spec = _spec(
        [
            {"name": "name", "type": "string", "required": True},
            {"name": "note", "type": "string", "max_length": 10},
        ]
    )
    out = validate_against_spec(df, spec)
    errs = {
        (r["name"], tuple(sorted(e["field"] for e in r[ERRORS_COL])))
        for r in out.collect()
    }
    assert ("x", ()) in errs
    assert ("", ("name", "note")) in errs
    assert (None, ("name",)) in errs


def test_validate_types(spark):
    df = spark.createDataFrame(
        [("1", "2.5", "$3,000.10", "true", "2024-01-02"),
         ("x", "y", "z", "maybe", "not-a-date"),
         ("", "", "", "", "")],  # empties: only required triggers, none here
        ["i", "f", "m", "b", "d"],
    )
    spec = _spec(
        [
            {"name": "i", "type": "integer"},
            {"name": "f", "type": "float"},
            {"name": "m", "type": "money"},
            {"name": "b", "type": "boolean"},
            {"name": "d", "type": "date", "date_format": "%Y-%m-%d"},
        ]
    )
    out = validate_against_spec(df, spec)
    by_first = {r["i"]: [e["field"] for e in r[ERRORS_COL]] for r in out.collect()}
    assert by_first["1"] == []
    assert sorted(by_first["x"]) == ["b", "d", "f", "i", "m"]
    assert by_first[""] == []


def test_validate_missing_required_column(spark):
    df = spark.createDataFrame([("a",)], ["other"])
    spec = _spec([{"name": "vital", "type": "string", "required": True}])
    out = validate_against_spec(df, spec)
    errs = out.collect()[0][ERRORS_COL]
    assert errs[0]["field"] == "vital"


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "name", "v"]
    )
    updates = spark.createDataFrame(
        [(2, "B!", 99.0), (4, "d", 40.0)], ["id", "name", "v"]
    )
    out = merge_upsert(target, updates, ["id"])
    got = {r["id"]: (r["name"], r["v"]) for r in out.collect()}
    assert got == {1: ("a", 10.0), 2: ("B!", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_upsert_collapses_duplicate_update_keys(spark):
    target = spark.createDataFrame([(1, "a")], ["id", "name"])
    updates = spark.createDataFrame([(1, "x"), (1, "y")], ["id", "name"])
    out = merge_upsert(target, updates, ["id"])
    assert out.count() == 1


def test_merge_upsert_requires_keys(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(ValueError):
        merge_upsert(df, df, [])


def test_validation_feeds_error_gate(spark, tmp_path):
    """Spec validation composes with the fail-on-error write gate."""
    from csv_etl_spark.plans.pipeline import transform

    df = spark.createDataFrame([("", "1"), ("b", "2")], ["name", "qty"])
    spec = _spec([{"name": "name", "type": "string", "required": True}])
    validated = validate_against_spec(df, spec)
    n_err = validated.select(F.sum(F.size(ERRORS_COL))).collect()[0][0]
    assert n_err == 1


def test_scd2_history_change_collapse(spark):
    from datetime import datetime

    from pyspark.sql import functions as F

    from csv_etl_spark.sources.edits import scd2_history

    rows = [
        (1, datetime(2024, 1, 1), "gold", 10),
        (1, datetime(2024, 1, 2), "gold", 11),    # unchanged -> collapses
        (1, datetime(2024, 1, 5), "silver", 12),  # change
        (1, datetime(2024, 1, 9), "gold", 13),    # change back
        (2, datetime(2024, 1, 3), "bronze", 14),  # single-row key
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "tier", "event_id"])
    out = scd2_history(df, "user_id", "ts", "tier", order_tiebreak="event_id")
    ivals = sorted(
        ((r["user_id"], r["tier"], r["valid_from_us"], r["valid_to_us"], r["is_current"])
         for r in out.collect()),
        key=lambda t: (t[0], t[2]),
    )
    us = lambda d: int(d.timestamp() * 1_000_000)
    jan = lambda day: us(datetime(2024, 1, day))
    assert ivals == [
        (1, "gold", jan(1), jan(5), False),
        (1, "silver", jan(5), jan(9), False),
        (1, "gold", jan(9), None, True),
        (2, "bronze", jan(3), None, True),
    ]


def test_snapshot_diff_all_arms(spark):
    from pyspark.sql import types as T

    from csv_etl_spark.sources.edits import snapshot_diff

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType(), True),
    ])
    old = spark.createDataFrame([(1, "a"), (2, "b"), (3, None), (4, "d")], schema)
    new = spark.createDataFrame([(1, "a"), (2, "B"), (3, "c"), (5, "e")], schema)
    out = {r["k"]: r["status"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {
        1: "unchanged",
        2: "changed",
        3: "changed",   # NULL -> value is a change (eqNullSafe)
        4: "removed",
        5: "added",
    }
