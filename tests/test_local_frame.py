"""local_values_frame must be value-equivalent to createDataFrame with
the same schema string while planning as a JVM LocalRelation (no Python
RDD — the point of the helper; see csv_etl_spark/local.py)."""

import math

import pytest

from csv_etl_spark.local import local_values_frame


def _rowset(df):
    return sorted(map(repr, df.collect()))


def test_values_frame_matches_createdataframe(spark):
    rows = [
        ("a.b", "normal", 2),
        ("it's", "wild\\card", 1),
        ("x\ny", "tab\there", 0),
        (None, "x", None),
    ]
    schema = "suffix string, kind string, nlab int"
    a = spark.createDataFrame(rows, schema)
    b = local_values_frame(spark, rows, schema)
    assert a.schema.simpleString() == b.schema.simpleString()
    assert _rowset(a) == _rowset(b)
    # pure-JVM local relation: no Python RDD scan in the plan
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "Scan ExistingRDD" not in plan


def test_values_frame_floats_bools_exact(spark):
    rows = [
        (1.5e-300, True),
        (float("nan"), False),
        (float("-inf"), None),
        (0.1, True),
        (-2.5, False),
        (None, None),
    ]
    a = spark.createDataFrame(rows, "x double, b boolean")
    b = local_values_frame(spark, rows, "x double, b boolean")
    va, vb = a.collect(), b.collect()
    for ra, rb in zip(
        sorted(va, key=repr), sorted(vb, key=repr)
    ):
        xa, xb = ra["x"], rb["x"]
        assert (xa is None) == (xb is None)
        if xa is not None:
            assert (math.isnan(xa) and math.isnan(xb)) or xa == xb
        assert ra["b"] == rb["b"]


def test_values_frame_empty_and_errors(spark):
    e = local_values_frame(spark, [], "a int, s string")
    assert e.count() == 0
    assert e.schema.simpleString() == "struct<a:int,s:string>"
    with pytest.raises(ValueError, match="scalar"):
        local_values_frame(spark, [({"k": 1},)], "a map<string,int>")
    with pytest.raises(TypeError):
        local_values_frame(spark, [(object(),)], "a string")


def test_values_frame_arrays(spark):
    rows = [(1, [10, 20]), (2, []), (3, None)]
    schema = "band int, bucket array<bigint>"
    a = spark.createDataFrame(rows, schema)
    b = local_values_frame(spark, rows, schema)
    assert a.schema.simpleString() == b.schema.simpleString()
    assert _rowset(a) == _rowset(b)


def test_values_frame_row_bound_and_type_validation(spark):
    """r17 hardening: the inline bound rejects data-sized callers, and
    values are validated against the declared type instead of silently
    CAST-coercing (ADVICE r16: a float in an int column truncated, an
    over-range int became NULL, an int in a string column stringified)."""
    from csv_etl_spark.local import _MAX_INLINE_ROWS

    with pytest.raises(ValueError, match="inline bound"):
        local_values_frame(
            spark, [(i,) for i in range(_MAX_INLINE_ROWS + 1)], "a int"
        )
    # type mismatches raise, like createDataFrame with a schema
    with pytest.raises(TypeError, match="int column got float"):
        local_values_frame(spark, [(1.5,)], "a int")
    with pytest.raises(TypeError, match="double column got int"):
        local_values_frame(spark, [(1,)], "a double")
    with pytest.raises(TypeError, match="string column got int"):
        local_values_frame(spark, [(7,)], "a string")
    with pytest.raises(TypeError, match="boolean column got str"):
        local_values_frame(spark, [("t",)], "a boolean")
    with pytest.raises(TypeError, match="bigint column got bool"):
        local_values_frame(spark, [(True,)], "a bigint")
    with pytest.raises(TypeError, match="array column got int"):
        local_values_frame(spark, [(3,)], "a array<int>")
    # element validation inside arrays
    with pytest.raises(TypeError, match="bigint column got str"):
        local_values_frame(spark, [(["x"],)], "a array<bigint>")
    # NULLs stay fine everywhere
    ok = local_values_frame(
        spark, [(None, None, None)], "a int, b double, c string"
    )
    assert ok.collect()[0] == (None, None, None)
