#!/usr/bin/env python
"""Interleaved A/B of spark.sql.optimizer.canChangeCachedPlanOutputPartitioning
for semantic_dedup on the 2M hard corpus (r16 verdict ask #5: the flag was
A/B'd only at sf0.1, where every cached frame is tiny; the open question is
the cached-frame-LARGE regime — semantic_dedup persists the full assigned
2M×64-dim embedding frame between the assignment and pair stages).

Production-path parameters (the ladder's --codebook table spelling):
n_centroids = N//512 (internal kmeans_codebook_table fit on a capped
sample, sharded assignment), threshold 0.9, default max_cluster_size.

Usage: python scripts/ab_semdedup_cacheflag.py [--passes 4] [--out FILE]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from statistics import median

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CORPUS = Path(__file__).resolve().parent / "scale" / "sf100_hard"
N = 2_000_000


def main() -> None:
    args = sys.argv[1:]
    passes = 4
    if "--passes" in args:
        passes = int(args[args.index("--passes") + 1])
    out_file = None
    if "--out" in args:
        out_file = args[args.index("--out") + 1]

    import os

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    import numpy as np
    import pandas as pd  # noqa: F401

    from csv_etl_spark import get_spark
    from csv_etl_spark.operators import similarity
    from pyspark.sql import functions as F
    from scale_bench import clear_caches

    spark = get_spark("ab-semdedup-cacheflag")
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

    conf = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    arms = {"flag_on": "true", "flag_off": "false"}
    times: dict[str, list[float]] = {k: [] for k in arms}
    cals: dict[str, list[float]] = {k: [] for k in arms}

    for p in range(passes):
        arm = "flag_on" if p % 2 == 0 else "flag_off"
        spark.conf.set(conf, arms[arm])
        spark.sparkContext.setJobDescription(f"semdedup 2M {arm} pass {p}")
        e = spark.read.parquet(str(CORPUS / "embeddings.parquet"))
        t0 = time.perf_counter()
        out = similarity.semantic_dedup(
            e,
            n_centroids=max(8, N // 512),
            threshold=0.9,
            kmeans_iters=2,
            sample_fraction=min(0.5, 400_000 / N),
        )
        out.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        times[arm].append(dt)
        cals[arm].append(cal())
        print(f"pass {p} {arm}: {dt}s (cal {cals[arm][-1]}ms)", flush=True)
        similarity.release_sharded_broadcasts(destroy=True)
        clear_caches()
        spark.catalog.clearCache()
    med = {k: round(median(v), 3) for k, v in times.items()}
    result = {
        "corpus": str(CORPUS),
        "n": N,
        "conf": conf,
        "passes": passes,
        "medians": med,
        "ratio_off_over_on": round(med["flag_off"] / med["flag_on"], 3),
        "runs": times,
        "cal_ms": cals,
    }
    print(json.dumps(result, indent=1))
    if out_file:
        Path(out_file).write_text(json.dumps(result, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
