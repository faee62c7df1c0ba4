#!/usr/bin/env python
"""Deep decade for the LSH→CC→split composition (r12 verdict ask #5).

The SCALE.md row for ``leakage_safe_split_lsh`` stops at 5M docs (r10
artifact), and the classic word-salad corpora cannot go further: their
31-word vocabulary saturates the MinHash band buckets so candidate
pairs grow quadratically BY CORPUS CONSTRUCTION (three r10 sf100
attempts exhausted the scratch disk).  This ladder runs on the
REAL-VOCABULARY corpora (gen_scale_docs_big.py — 50k-word Zipf vocab,
measured length distribution, same planted dup rate), where band
collisions stay proportional to true near-dups, i.e. the regime a
100 TB corpus actually presents.  Both endpoints of each decade come
from the SAME corpus family, so the exponent is meaningful; the
classic-corpus 5M point is NOT comparable and stays in SCALE.md as the
saturation evidence.

Usage: python scripts/lsh_big_ladder.py --out FILE.json
       [--sizes big5M,big50M] [--runs N]   (default runs: 3 at big5M,
       1 at big50M — mirror of the copurchase sf100 protocol)
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


def main() -> None:
    args = sys.argv[1:]
    if "--out" not in args:
        raise SystemExit(
            "usage: lsh_big_ladder.py --out FILE.json "
            "[--sizes big5M,big50M] [--runs 3]"
        )
    out_name = args[args.index("--out") + 1]
    sizes = ["big5M", "big50M"]
    if "--sizes" in args:
        sizes = args[args.index("--sizes") + 1].split(",")
    n_runs = 3
    if "--runs" in args:
        n_runs = int(args[args.index("--runs") + 1])

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    import bench
    from csv_etl_spark import get_spark

    spark = get_spark("lsh-big-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    env_start = bench._env_stamp()

    @F.pandas_udf("long")
    def _noop(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, 1024, 1, 32).select(_noop(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    from scale_bench import clear_caches  # same-session cache hygiene

    q = entry_mod.queries()["leakage_safe_split_lsh"]
    results: dict[str, list[float]] = {}
    rows_out: dict[str, int] = {}
    doc_counts: dict[str, int] = {}
    for size in sizes:
        sf_dir = str(SCALE / size)
        if not (SCALE / size / "documents.parquet").exists():
            print(f"skip {size}: corpus missing", file=sys.stderr)
            continue
        doc_counts[size] = spark.read.parquet(
            str(SCALE / size / "documents.parquet")
        ).count()
        n = n_runs if size != "big50M" else min(n_runs, 1)
        results[size] = []
        for i in range(n):
            t0 = time.perf_counter()
            df = q(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            results[size].append(dt)
            print(f"{size} run{i}: {dt}s", file=sys.stderr, flush=True)
            clear_caches()
        rows_out[size] = q(spark, sf_dir).count()
        clear_caches()

    med = {s: round(median(r), 3) for s, r in results.items()}
    payload: dict = {
        # median_sec_big (NOT median_sec): the big corpora are a separate
        # real-vocabulary family — gen_scale_report renders them in their
        # own deep-decade section, never mixed into the classic matrix
        "median_sec_big": {"leakage_safe_split_lsh": med},
        "protocol": (
            "leakage_safe_split_lsh (banded MinHash-LSH -> checkpointed CC "
            "-> md5 grouped split, registry parameterization) over the "
            "real-vocabulary big corpora (gen_scale_docs_big.py), noop-write "
            f"timed, caches cleared between runs; n_runs {n_runs} "
            "(big50M: 1); one session"
        ),
        "doc_counts": doc_counts,
        "runs_sec": results,
        "median_sec": med,
        "result_rows": rows_out,
        "env": {"start": env_start, "end": bench._env_stamp()},
    }
    if "big5M" in med and "big50M" in med:
        payload["decade_alpha_big"] = {
            "leakage_safe_split_lsh": {
                "5M->50M": round(math.log10(med["big50M"] / med["big5M"]), 3)
            }
        }
    out_path = REPO / "bench_records" / out_name
    out_path.write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
