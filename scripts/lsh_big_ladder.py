#!/usr/bin/env python
"""Deep decade for the LSH→CC→split composition (r12 verdict ask #5).

The SCALE.md row for ``leakage_safe_split_lsh`` stops at 500k docs, and
the classic word-salad corpora cannot go further: their 31-word
vocabulary saturates the MinHash band buckets so candidate pairs grow
quadratically BY CORPUS CONSTRUCTION (three r10 sf100 attempts
exhausted the scratch disk).  This ladder runs on the REAL-VOCABULARY
corpora (gen_scale_docs_big.py — 50k-word Zipf vocab, measured length
distribution, same planted dup rate), where band collisions stay
proportional to true near-dups — MOSTLY.  The r13 finding
(BENCHNOTES_r13_lsh_hotbuckets.json): even a realistic Zipf vocabulary
produces a handful of HOT-SHINGLE buckets that go quadratic — at 5M
docs the uncapped self-join emits Σ|bucket|² = 841M rows, ~600M from
the top TEN buckets, and the first uncapped ladder attempt exhausted a
65 GB disk inside one 5M-doc run.  The ladder therefore measures the
CAPPED production spelling (minhash_lsh_pairs max_bucket_size=16:
4.6M candidates at 5M docs per the measured mass curve — 16/64/256/
1024/2048 → 49/64/95/166/228 M Σ|bucket|²), and VERIFIES the cap's
recall with the planted exact dups: every multi-doc identical-text
group must land in ONE split (the operator's whole guarantee).

Both endpoints of each decade come from the SAME corpus family, so the
exponent is meaningful; the classic-corpus points are NOT comparable
and stay in SCALE.md as the saturation evidence.

Usage: python scripts/lsh_big_ladder.py --out FILE.json
       [--sizes big5M,big50M] [--runs N] [--cap 16]   (default runs: 3
       at big5M, 1 at big50M — mirror of the copurchase sf100 protocol)
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
OP = "leakage_safe_split_lsh_cap"


def main() -> None:
    args = sys.argv[1:]
    if "--out" not in args:
        raise SystemExit(
            "usage: lsh_big_ladder.py --out FILE.json "
            "[--sizes big5M,big50M] [--runs 3] [--cap 16]"
        )
    out_name = args[args.index("--out") + 1]
    sizes = ["big5M", "big50M"]
    if "--sizes" in args:
        sizes = args[args.index("--sizes") + 1].split(",")
    n_runs = 3
    if "--runs" in args:
        n_runs = int(args[args.index("--runs") + 1])
    cap = 16
    if "--cap" in args:
        cap = int(args[args.index("--cap") + 1])

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from pyspark.sql import functions as F

    import bench
    from csv_etl_spark import get_spark
    from csv_etl_spark.operators import dedup
    from csv_etl_spark.operators.sampling import grouped_split

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

    def q_capped(spark, sf_dir):
        # q_leakage_safe_split_lsh's exact composition + the r13 hot-
        # bucket cap (the production spelling at corpus scale; the
        # registry twin dedup_lsh_capped value-checks the cap semantics
        # against SQL at sf0.01)
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pairs = dedup.minhash_lsh_pairs(
            d, threshold=0.35, n=3, num_hashes=16, bands=8, portable=True,
            max_bucket_size=cap,
        )
        labels = dedup.resolve_duplicate_clusters(pairs)
        g = d.select("doc_id").join(
            labels.withColumnRenamed("id", "doc_id"), "doc_id", "left"
        ).select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("group_key"),
        )
        return grouped_split(
            g, "group_key", {"train": 0.8, "val": 0.1, "test": 0.1}
        )

    results: dict[str, list[float]] = {}
    rows_out: dict[str, int] = {}
    doc_counts: dict[str, int] = {}
    leak_recall: dict[str, dict] = {}
    for size in sizes:
        sf_dir = str(SCALE / size)
        if not (SCALE / size / "documents.parquet").exists():
            print(f"skip {size}: corpus missing", file=sys.stderr)
            continue
        d = spark.read.parquet(str(SCALE / size / "documents.parquet"))
        doc_counts[size] = d.count()
        n = n_runs if size not in ("big15M", "big50M") else min(n_runs, 1)
        results[size] = []
        for i in range(n):
            t0 = time.perf_counter()
            df = q_capped(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            results[size].append(dt)
            print(f"{size} run{i}: {dt}s", file=sys.stderr, flush=True)
            clear_caches()
        split = q_capped(spark, sf_dir)
        rows_out[size] = split.count()
        # planted-dup leakage check: every multi-doc identical-text group
        # must be assigned ONE split — the recall evidence that the
        # bucket cap does not break the operator's guarantee
        grp = (
            d.select("doc_id", F.md5("text").alias("_h"))
            .join(split.select("doc_id", "split"), "doc_id")
            .groupBy("_h")
            .agg(
                F.count("*").alias("_n"),
                F.countDistinct("split").alias("_ns"),
            )
            .filter(F.col("_n") > 1)
        )
        agg = grp.agg(
            F.count("*").alias("groups"),
            F.sum(F.when(F.col("_ns") == 1, 1).otherwise(0)).alias("intact"),
        ).collect()[0]
        leak_recall[size] = {
            "dup_groups": int(agg["groups"]),
            "single_split": int(agg["intact"]),
            "recall": round(agg["intact"] / agg["groups"], 6)
            if agg["groups"]
            else None,
        }
        print(f"{size} leak-recall: {leak_recall[size]}", file=sys.stderr)
        clear_caches()

    med = {s: round(median(r), 3) for s, r in results.items()}
    payload: dict = {
        # median_sec_big ONLY (never median_sec): the big corpora are a
        # separate real-vocabulary family — gen_scale_report renders them
        # in their own deep-decade section, never mixed into the classic
        # matrix (a median_sec key here would supersede the classic row
        # with blanks under the newest-wins rule)
        "median_sec_big": {OP: med},
        "protocol": (
            "leakage_safe_split_lsh composition with the r13 hot-bucket cap "
            f"(minhash_lsh_pairs max_bucket_size={cap}; banded MinHash-LSH "
            "-> checkpointed CC -> md5 grouped split) over the "
            "real-vocabulary big corpora (gen_scale_docs_big.py), noop-write "
            f"timed, caches cleared between runs; n_runs {n_runs} "
            "(big50M: 1); one session; leak_recall = fraction of planted "
            "multi-doc exact-dup text groups assigned a single split"
        ),
        "cap": cap,
        "doc_counts": doc_counts,
        "runs_sec": results,
        "result_rows": rows_out,
        "leak_recall": leak_recall,
        "env": {"start": env_start, "end": bench._env_stamp()},
    }
    # exponent between consecutive measured sizes, normalized per decade
    # (t = c·n^α ⇒ α = log(t2/t1)/log(n2/n1)); big15M is the sanctioned
    # fallback when the 50M verify-join shuffle exceeds the sandbox disk
    ordered = [s for s in ("big5M", "big15M", "big50M") if s in med]
    for lo, hi in zip(ordered, ordered[1:]):
        a = round(
            math.log10(med[hi] / med[lo])
            / math.log10(doc_counts[hi] / doc_counts[lo]),
            3,
        )
        payload.setdefault("decade_alpha_big", {}).setdefault(OP, {})[
            f"{lo[3:]}->{hi[3:]}"
        ] = a
    out_path = REPO / "bench_records" / out_name
    out_path.write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
