"""Bucketed co-located joins (prove the Exchange is gone) and two-phase
salted aggregation (prove results match a plain groupBy)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csv_etl_spark.operators.partitioning import (
    assert_no_shuffle_join,
    bucketed_join,
    count_exchanges,
    salted_agg,
    with_salt,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(
        orders, "b_orders", "o_orderkey", 8, sort_by="o_orderkey",
        path=str(wh / "b_orders"),
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", 8, sort_by="o_orderkey",
        path=str(wh / "b_lineitem"),
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        joined = bucketed_join(spark, lt, rt, "o_orderkey")
        assert_no_shuffle_join(joined)  # co-located: zero shuffles
        # same join on the raw parquet DOES shuffle (control)
        o = spark.read.parquet(f"{SF}/orders.parquet")
        li = spark.read.parquet(f"{SF}/lineitem.parquet").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        assert count_exchanges(o.join(li, "o_orderkey")) > 0
        # and the result is identical
        assert joined.count() == o.join(li, "o_orderkey").count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_salted_agg_matches_plain_groupby(spark):
    # skewed: 90% of rows share one key
    df = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))
        ).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    got = {
        r["k"]: (r["total"], r["n"], r["mx"])
        for r in salted_agg(
            df, ["k"],
            [("v", "sum", "total"), ("v", "count", "n"), ("v", "max", "mx")],
            n_salts=8,
        ).collect()
    }
    exp = {
        r["k"]: (r["total"], r["n"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count("v").alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][1] == exp[k][1]
        assert got[k][2] == exp[k][2]
        assert abs(got[k][0] - exp[k][0]) < 1e-6


def test_salt_is_deterministic(spark):
    df = spark.range(0, 100).select(F.col("id").cast("string").alias("x"))
    a = {r["x"]: r["_salt"] for r in with_salt(df, 8).collect()}
    b = {r["x"]: r["_salt"] for r in with_salt(df, 8).collect()}
    assert a == b
    assert set(a.values()) == set(range(8))  # spreads across all salts


def test_salted_agg_rejects_avg(spark):
    df = spark.range(3).select(F.lit("k").alias("k"), F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="sum"):
        salted_agg(df, ["k"], [("v", "avg", "a")])
