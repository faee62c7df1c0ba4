#!/usr/bin/env python
"""copurchase_capped hot-removal path A/B (r12 verdict ask #1).

The r12 600M-line measurement read α=1.12 for the 60M→600M decade, but
the 600M point is the FIRST past the auto-switch from the driver-
collected hot-item mask to the distributed left_anti removal
(affinity.py): the measurement conflated the one-time regime-change
cost (two extra (basket,item) shuffles) with organic scaling.  This
script isolates the two by forcing BOTH paths at BOTH decades in ONE
session (the ccwidth-AB discipline — cross-session absolutes drift
~1 s+, paired in-session deltas don't):

* ``driver``  — ``_MAX_HOT_ITEMS`` raised so the hot set always
  collects (np.isin kernel mask; feasible at both sizes here: the hot
  set is ~60k items at 60M lines, ~600k at 600M — a few MB).
* ``dist``    — ``_MAX_HOT_ITEMS=0`` so the distributed left_anti +
  basket re-agg always runs (the only feasible path on a real cluster
  once the hot set outgrows the driver).

Outputs per (size, path): run timings, medians, the per-path decade
exponent, the switch cost at each size (dist − driver), and a result-
equality check (the 50 output rows must be identical across paths —
the pytest equivalence at sf0.01 re-proven at scale).  Runs alternate
A/B/A/B so box drift lands evenly on both arms.

Usage: python scripts/copurchase_ab.py --out BENCHNOTES_r13_copurchase_ab.json
       [--sizes sf10,sf100] [--runs 3]  (sf100 defaults to 1 run/path)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path
from statistics import median

import pandas as pd  # module-level: pandas_udf resolves 'pd.Series' hints here

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SCALE = REPO / "scripts" / "scale"


def main() -> None:
    args = sys.argv[1:]
    if "--out" not in args:
        raise SystemExit("usage: copurchase_ab.py --out FILE.json "
                         "[--sizes sf10,sf100] [--runs 3]")
    out_name = args[args.index("--out") + 1]
    sizes = ["sf10", "sf100"]
    if "--sizes" in args:
        sizes = args[args.index("--sizes") + 1].split(",")
    n_runs = 3
    if "--runs" in args:
        n_runs = int(args[args.index("--runs") + 1])

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from pyspark.sql import functions as F

    import bench
    from csv_etl_spark import get_spark
    from csv_etl_spark.operators import affinity

    spark = get_spark("copurchase-ab")
    spark.sparkContext.setLogLevel("ERROR")
    env_start = bench._env_stamp()

    @F.pandas_udf("long")
    def _noop(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, 1024, 1, 32).select(_noop(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    real_bound = affinity._MAX_HOT_ITEMS

    if "--components" in args:
        # Component attribution (run AFTER the 2x2 showed BOTH paths
        # super-linear at the top decade): time the shared pipeline
        # stages separately so the slope can be pinned to a stage.
        #   baskets  — the basket aggregation alone (shuffle 1)
        #   uncapped — full pair pipeline with freq_cap=None (no hot
        #              machinery at all; includes pair count agg)
        comp_res: dict[str, dict[str, list[float]]] = {}
        for size in sizes:
            li = spark.read.parquet(str(SCALE / size / "lineitem.parquet"))
            n = n_runs if size != "sf100" else min(n_runs, 1)
            comp_res[size] = {"baskets": [], "uncapped": []}
            for i in range(n):
                t0 = time.perf_counter()
                (
                    li.select(F.col("l_orderkey").alias("_bk"),
                              F.col("l_partkey").alias("_it"))
                    .filter(F.col("_bk").isNotNull() & F.col("_it").isNotNull())
                    .groupBy("_bk")
                    .agg(F.sort_array(F.collect_set("_it")).alias("_items"))
                    .filter(F.size("_items") <= 1000)
                    .write.format("noop").mode("overwrite").save()
                )
                comp_res[size]["baskets"].append(
                    round(time.perf_counter() - t0, 3))
                t0 = time.perf_counter()
                affinity.top_cooccurrence(
                    li, "l_orderkey", "l_partkey",
                    top_k=50, min_support=2, freq_cap=None,
                ).write.format("noop").mode("overwrite").save()
                comp_res[size]["uncapped"].append(
                    round(time.perf_counter() - t0, 3))
                print(f"{size} comps run{i}: {comp_res[size]}",
                      file=sys.stderr, flush=True)
        med_c = {
            s: {c: round(median(r), 3) for c, r in comp_res[s].items()}
            for s in sizes
        }
        payload = {
            "protocol": (
                "component attribution: basket agg alone vs full uncapped "
                "pipeline (freq_cap=None), noop-write timed, one session; "
                f"n_runs {n_runs} (sf100: 1)"
            ),
            "runs_sec": comp_res,
            "median_sec_by_component": med_c,
            "env": {"start": env_start, "end": bench._env_stamp()},
        }
        if "sf10" in med_c and "sf100" in med_c:
            payload["component_decade_alpha"] = {
                c: round(
                    math.log10(med_c["sf100"][c] / med_c["sf10"][c]), 3
                )
                for c in ("baskets", "uncapped")
            }
        out_path = REPO / "bench_records" / out_name
        out_path.write_text(json.dumps(payload, indent=1))
        print(json.dumps(payload, indent=1))
        return

    # driver arm: bound high enough that even sf100's ~600k-item hot set
    # collects; dist arm: bound 0 forces the left_anti + re-agg always
    arms = {"driver": 10_000_000, "dist": 0}

    results: dict[str, dict[str, list[float]]] = {
        s: {a: [] for a in arms} for s in sizes
    }
    hot_counts: dict[str, int] = {}
    row_equal: dict[str, bool] = {}

    def run_once(size: str, arm: str) -> tuple[float, list]:
        li = spark.read.parquet(str(SCALE / size / "lineitem.parquet"))
        affinity._MAX_HOT_ITEMS = arms[arm]
        try:
            t0 = time.perf_counter()
            out = affinity.top_cooccurrence(
                li, "l_orderkey", "l_partkey",
                top_k=50, min_support=2, freq_cap=40,
            )
            rows = out.collect()  # 50 rows; also the equality evidence
            dt = round(time.perf_counter() - t0, 3)
        finally:
            affinity._MAX_HOT_ITEMS = real_bound
        return dt, [(r["item_a"], r["item_b"], r["pair_count"]) for r in rows]

    for size in sizes:
        # hot-set size for the record (drives which path is feasible live)
        li = spark.read.parquet(str(SCALE / size / "lineitem.parquet"))
        bi = (
            li.select(F.col("l_orderkey").alias("bk"),
                      F.col("l_partkey").alias("it"))
            .filter(F.col("bk").isNotNull() & F.col("it").isNotNull())
            .groupBy("bk").agg(F.sort_array(F.collect_set("it")).alias("its"))
            .filter(F.size("its") <= 1000)
            .select(F.explode("its").alias("it"))
            .groupBy("it").agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 40)
        )
        hot_counts[size] = bi.count()
        print(f"{size}: hot items over cap = {hot_counts[size]}",
              file=sys.stderr, flush=True)

        n = n_runs if size != "sf100" else min(n_runs, 1)
        rows_by_arm: dict[str, list] = {}
        for i in range(n):
            for arm in ("driver", "dist"):
                dt, rows = run_once(size, arm)
                results[size][arm].append(dt)
                rows_by_arm[arm] = rows
                print(f"{size} {arm} run{i}: {dt}s", file=sys.stderr,
                      flush=True)
        row_equal[size] = rows_by_arm["driver"] == rows_by_arm["dist"]

    med = {
        s: {a: round(median(r), 3) for a, r in results[s].items()}
        for s in sizes
    }
    # canonical query-keyed shape for gen_scale_report.py: the PRODUCTION
    # behavior per size (auto-switch picks driver below the bound — sf10's
    # 82k hot items collect — and dist above it), superseding the r12
    # cross-session row like-for-like; the per-path attribution rides the
    # detail keys below
    production = {
        s: med[s]["driver" if hot_counts.get(s, 0) <= real_bound else "dist"]
        for s in sizes
    }
    payload: dict = {
        "protocol": (
            "both hot-removal paths forced via affinity._MAX_HOT_ITEMS "
            "(driver=collect+np.isin mask, dist=left_anti+re-agg), "
            "alternating A/B runs in ONE session (ccwidth-AB discipline); "
            f"n_runs per arm: {n_runs} (sf100: 1); freq_cap=40, top_k=50, "
            "min_support=2 over scripts/scale lineitem"
        ),
        "runs_sec_by_path": results,
        "median_sec_by_path": med,
        "median_sec": {"copurchase_capped": production},
        "hot_items_over_cap": hot_counts,
        "result_rows_equal_across_paths": row_equal,
        "env": {"start": env_start, "end": bench._env_stamp()},
    }
    if "sf10" in med and "sf100" in med:
        payload["per_path_decade_alpha_60M_to_600M"] = {
            a: round(math.log10(med["sf100"][a] / med["sf10"][a]), 3)
            for a in arms
        }
        payload["switch_cost_sec"] = {
            s: round(med[s]["dist"] - med[s]["driver"], 3) for s in sizes
        }
        payload["scaling_exponent_per_decade"] = {
            "copurchase_capped": {
                "500k->5M": round(
                    math.log10(production["sf100"] / production["sf10"]), 3
                )
            }
        }
    out_path = REPO / "bench_records" / out_name
    out_path.write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
