#!/usr/bin/env python
"""Per-stage attribution for the capped LSH→CC→split ladder's α=1.07
(r13 verdict ask #2).

BENCHNOTES_r13_lsh_big.json measured the COMPOSED leakage-safe split at
5M→15M docs: α = 1.075, 7% over linear per decade, single runs, no
stage breakdown — exactly the kind of number the r12 copurchase saga
showed can be a session artifact OR a real slope.  This script re-runs
both sizes in ONE session, n_runs ≥ 2, with the composition split at
its two materialization-safe seams:

* ``pairs``  — minhash_lsh_pairs (shingle → signature → banding →
  hot-bucket cap → candidate self-join → Jaccard verify), persisted +
  counted;
* ``cc``     — resolve_duplicate_clusters over the persisted pairs
  (checkpointed min-label iteration), persisted + counted;
* ``split``  — docs ⨝ labels → md5 grouped_split, noop-written.

Each stage reads its upstream from cache, so a stage's time is its own.
If CC-edge growth drives the 7%, the known fix is alternating
large-star/small-star contraction; if the verify join drives it, the
bucket-cap mass analysis widens.  The per-stage α table answers which.

Usage: python scripts/lsh_stage_decompose.py --out FILE.json
       [--sizes big5M,big15M] [--runs 2] [--cap 16]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path
from statistics import median

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SCALE = REPO / "scripts" / "scale"
STAGES = ("pairs", "cc", "split")


def main() -> None:
    args = sys.argv[1:]
    if "--out" not in args:
        raise SystemExit(
            "usage: lsh_stage_decompose.py --out FILE.json "
            "[--sizes big5M,big15M] [--runs 2] [--cap 16]"
        )
    out_name = args[args.index("--out") + 1]
    sizes = ["big5M", "big15M"]
    if "--sizes" in args:
        sizes = args[args.index("--sizes") + 1].split(",")
    n_runs = 2
    if "--runs" in args:
        n_runs = int(args[args.index("--runs") + 1])
    cap = 16
    if "--cap" in args:
        cap = int(args[args.index("--cap") + 1])

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    import bench
    from csv_etl_spark import get_spark
    from csv_etl_spark.operators import dedup
    from csv_etl_spark.operators.sampling import grouped_split

    spark = get_spark("lsh-stage-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    env_start = bench._env_stamp()

    @F.pandas_udf("long")
    def _noop(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, 1024, 1, 32).select(_noop(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    from scale_bench import clear_caches

    results: dict[str, dict[str, list[float]]] = {
        st: {} for st in STAGES
    }
    counts: dict[str, dict] = {}
    doc_counts: dict[str, int] = {}
    for size in sizes:
        sf_dir = SCALE / size
        if not (sf_dir / "documents.parquet").exists():
            print(f"skip {size}: corpus missing", file=sys.stderr)
            continue
        d = spark.read.parquet(str(sf_dir / "documents.parquet"))
        doc_counts[size] = d.count()
        for st in STAGES:
            results[st][size] = []
        for i in range(n_runs):
            t0 = time.perf_counter()
            pairs = dedup.minhash_lsh_pairs(
                d, threshold=0.35, n=3, num_hashes=16, bands=8,
                portable=True, max_bucket_size=cap,
            ).persist(StorageLevel.MEMORY_AND_DISK)
            n_pairs = pairs.count()
            t1 = time.perf_counter()
            labels = dedup.resolve_duplicate_clusters(pairs).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            n_labels = labels.count()
            t2 = time.perf_counter()
            g = d.select("doc_id").join(
                labels.withColumnRenamed("id", "doc_id"), "doc_id", "left"
            ).select(
                "doc_id",
                F.coalesce("cluster_id", "doc_id").alias("group_key"),
            )
            grouped_split(
                g, "group_key", {"train": 0.8, "val": 0.1, "test": 0.1}
            ).write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            for st, dt in zip(STAGES, (t1 - t0, t2 - t1, t3 - t2)):
                results[st][size].append(round(dt, 3))
            counts[size] = {"pairs": n_pairs, "labeled_docs": n_labels}
            print(
                f"{size} run{i}: pairs {t1-t0:.1f}s ({n_pairs} rows), "
                f"cc {t2-t1:.1f}s ({n_labels} rows), split {t3-t2:.1f}s",
                file=sys.stderr, flush=True,
            )
            pairs.unpersist(blocking=True)
            labels.unpersist(blocking=True)
            clear_caches()

    med = {
        st: {s: round(median(r), 3) for s, r in by.items() if r}
        for st, by in results.items()
    }
    payload: dict = {
        "protocol": (
            "leakage_safe_split_lsh_cap split at its materialization "
            f"seams (max_bucket_size={cap}): pairs = banding+cap+verify "
            "persisted+counted; cc = checkpointed min-label iteration "
            "over cached pairs; split = docs-join + md5 grouped split "
            f"noop-written; n_runs {n_runs}; one session; caches cleared "
            "between runs"
        ),
        "median_sec_stage": med,
        "runs_sec": results,
        "counts": counts,
        "doc_counts": doc_counts,
        "env": {"start": env_start, "end": bench._env_stamp()},
    }
    ordered = [s for s in ("big5M", "big15M", "big50M") if s in doc_counts]
    for lo, hi in zip(ordered, ordered[1:]):
        span = math.log10(doc_counts[hi] / doc_counts[lo])
        for st in STAGES:
            if lo in med[st] and hi in med[st] and med[st][lo] > 0:
                payload.setdefault("decade_alpha_stage", {}).setdefault(
                    st, {}
                )[f"{lo[3:]}->{hi[3:]}"] = round(
                    math.log10(med[st][hi] / med[st][lo]) / span, 3
                )
        tot_lo = sum(med[st][lo] for st in STAGES)
        tot_hi = sum(med[st][hi] for st in STAGES)
        payload.setdefault("decade_alpha_stage", {})["total"] = {
            f"{lo[3:]}->{hi[3:]}": round(
                math.log10(tot_hi / tot_lo) / span, 3
            )
        }
    out_path = REPO / "bench_records" / out_name
    out_path.write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
