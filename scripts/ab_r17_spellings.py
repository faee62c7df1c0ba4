#!/usr/bin/env python
"""Interleaved old-vs-new spelling A/B for the r17 operator rewrites
(corr_lineitem's Arrow moment pass, interval_overlap's first-bucket
dedup).  One session, passes alternate OLD,NEW,OLD,NEW,... so host-speed
drift hits both arms equally; the OLD spellings are inlined here verbatim
from the pre-r17 operators.  noop sink, calibration sample per pass.

Usage: python scripts/ab_r17_spellings.py [sf_dir] [--passes 4]
       [--out FILE.json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from statistics import median

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def old_pairwise_corr(df, cols):
    """Pre-r17 spelling: fused 7·k(k−1)/2 decimal aggregate."""
    from pyspark.sql import functions as F

    from csv_etl_spark.operators.stats import _OVERFLOW_MSG, _q

    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    aggs = []
    for a, b in pairs:
        cond = F.col(a).isNotNull() & F.col(b).isNotNull()
        qa = F.when(cond, _q(F.col(a), 0.0))
        qb = F.when(cond, _q(F.col(b), 0.0))
        t = f"{a}__{b}"
        aggs += [
            F.count(F.when(cond, 1)).alias(f"_n_{t}"),
            F.sum(qa).alias(f"_sa_{t}"),
            F.sum(qb).alias(f"_sb_{t}"),
            F.sum(qa * qa).alias(f"_saa_{t}"),
            F.sum(qb * qb).alias(f"_sbb_{t}"),
            F.sum(qa * qb).alias(f"_sab_{t}"),
            F.count(qa * qb).alias(f"_nab_{t}"),
        ]
    m = df.agg(*aggs)
    structs = []
    for a, b in pairs:
        t = f"{a}__{b}"
        nb = F.col(f"_n_{t}")
        n = nb.cast("double")
        sa, sb = F.col(f"_sa_{t}").cast("double"), F.col(f"_sb_{t}").cast("double")
        saa = F.col(f"_saa_{t}").cast("double")
        sbb = F.col(f"_sbb_{t}").cast("double")
        sab = F.col(f"_sab_{t}").cast("double")
        van = n * saa - sa * sa
        vbn = n * sbb - sb * sb
        cvn = n * sab - sa * sb
        corr = F.when(
            (nb >= 2) & (van > 0) & (vbn > 0),
            F.round(cvn / F.sqrt(van) / F.sqrt(vbn), 6),
        )
        ok = (F.col(f"_nab_{t}") == nb) & (
            (nb == 0)
            | (
                F.col(f"_sa_{t}").isNotNull()
                & F.col(f"_sb_{t}").isNotNull()
                & F.col(f"_saa_{t}").isNotNull()
                & F.col(f"_sbb_{t}").isNotNull()
                & F.col(f"_sab_{t}").isNotNull()
            )
        )
        guard = F.assert_true(ok, F.lit(_OVERFLOW_MSG))
        structs.append(
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.coalesce(guard.cast("bigint"), nb.cast("bigint")).alias("n"),
                F.coalesce(guard.cast("double"), corr).alias("corr"),
            )
        )
    return m.select(F.explode(F.array(*structs)).alias("_p")).select("_p.*")


def old_interval_overlap(left, right, keys, left_id, right_id, bucket_seconds):
    """Pre-r17 spelling: equijoin + distinct + exact predicate."""
    from pyspark.sql import functions as F

    def prep(df, id_col, side):
        s = F.unix_timestamp(F.col("start")).cast("long")
        e = F.unix_timestamp(F.col("end")).cast("long")
        w = F.lit(int(bucket_seconds))
        n_buckets = F.when(
            e > s, F.floor((e - 1) / w) - F.floor(s / w) + 1
        ).otherwise(F.lit(0))
        guard = F.assert_true(n_buckets <= 1000, F.lit("widen bucket_seconds"))
        buckets = F.when(
            e > s, F.sequence(F.floor(s / w), F.floor((e - 1) / w))
        ).otherwise(F.array().cast("array<bigint>"))
        return df.select(
            *[F.col(k) for k in keys],
            F.col(id_col).alias(f"_id{side}"),
            F.coalesce(guard.cast("long"), s).alias(f"_s{side}"),
            e.alias(f"_e{side}"),
            F.explode(buckets).alias("_bucket"),
        )

    l = prep(left, left_id, "l")
    r = prep(right, right_id, "r")
    pairs = (
        l.join(r, [*keys, "_bucket"])
        .drop("_bucket")
        .distinct()
        .filter((F.col("_sl") < F.col("_er")) & (F.col("_sr") < F.col("_el")))
    )
    overlap_s = F.greatest("_sl", "_sr")
    overlap_e = F.least("_el", "_er")
    return pairs.select(
        *keys,
        F.col("_idl").alias(left_id),
        F.col("_idr").alias(right_id),
        F.from_unixtime(overlap_s).cast("timestamp").alias("overlap_start"),
        F.from_unixtime(overlap_e).cast("timestamp").alias("overlap_end"),
        (overlap_e - overlap_s).cast("bigint").alias("overlap_seconds"),
    )


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    passes = 4
    if "--passes" in args:
        passes = int(args[args.index("--passes") + 1])
    out_file = None
    if "--out" in args:
        out_file = args[args.index("--out") + 1]

    import numpy as np
    import pandas as pd  # noqa: F401

    import __spark_entry__ as entry_mod
    from csv_etl_spark import get_spark
    from csv_etl_spark.operators.joins import interval_overlap_join
    from csv_etl_spark.operators.stats import pairwise_corr
    from pyspark.sql import functions as F

    spark = get_spark("ab-r17-spellings")
    spark.sparkContext.setLogLevel("ERROR")

    @F.pandas_udf("long")
    def _noop(s):
        return s

    spark.range(0, 1024, 1, 32).select(_noop(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    cal_A = np.arange(512 * 512, dtype="float64").reshape(512, 512) / 1e6

    def cal() -> float:
        t0 = time.perf_counter()
        (cal_A @ cal_A).sum()
        return round((time.perf_counter() - t0) * 1e3, 3)

    li = entry_mod._t(spark, sf_dir, "lineitem", parallelize=True)
    ev = entry_mod._t(spark, sf_dir, "events")
    corr_cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

    def build_interval(fn):
        p = ev.filter(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("start"),
            (F.col("ts") + F.expr("INTERVAL 14400 SECONDS")).alias("end"),
        )
        r = ev.filter(F.col("event_type") == "error").select(
            "user_id",
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("start"),
            (F.col("ts") + F.expr("INTERVAL 3600 SECONDS")).alias("end"),
        )
        return fn(p, r, keys=["user_id"], left_id="purchase_id",
                  right_id="error_id", bucket_seconds=7200)

    variants = {
        "corr_old": lambda: old_pairwise_corr(li, corr_cols),
        "corr_new": lambda: pairwise_corr(li, corr_cols),
        "interval_old": lambda: build_interval(old_interval_overlap),
        "interval_new": lambda: build_interval(interval_overlap_join),
    }

    times: dict[str, list[float]] = {k: [] for k in variants}
    cals: list[float] = []
    for p in range(passes):
        for name in variants:
            spark.sparkContext.setJobDescription(f"ab {name} pass {p}")
            t0 = time.perf_counter()
            variants[name]().write.format("noop").mode("overwrite").save()
            times[name].append(round(time.perf_counter() - t0, 3))
            cals.append(cal())
        spark.catalog.clearCache()
    med = {k: median(v) for k, v in times.items()}
    result = {
        "sf_dir": sf_dir,
        "passes": passes,
        "medians": med,
        "ratio_old_over_new": {
            "corr_lineitem": round(med["corr_old"] / med["corr_new"], 3),
            "interval_overlap": round(
                med["interval_old"] / med["interval_new"], 3
            ),
        },
        "runs": times,
        "cal_ms": cals,
    }
    print(json.dumps(result, indent=1))
    if out_file:
        Path(out_file).write_text(json.dumps(result, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
