#!/usr/bin/env python
"""Codebook QUALITY comparison for ``kmeans_codebook_table`` (r14
verdict ask #3): the table fitter is dispatch-tested but its codebooks'
quality was unmeasured.  At EQUAL cell count (k=256, the largest the
literal fitter handles comfortably), compare three codebook sources:

* ``literal``  — kmeans_centroids (the engine-portable literal-tree
                 Lloyd fit, the quality reference)
* ``table``    — kmeans_codebook_table (global table-Lloyd fit: sharded
                 torrent-broadcast routing, exact flat below 256 cells,
                 hierarchical m_super routing past it — the production
                 path for SemDeDup-scale codebooks; replaced the r14
                 coarse×fine hierarchical fitter in r15)
* ``firstn``   — deterministic first-256 rows (the zero-cost contract
                 convention; the floor)

Two quality axes:

1. ANN recall@5 on the HARD 2M corpus (sf100_hard): ivf_topk with each
   codebook at nprobe=2, vs exact brute force over the same 50 probes.
2. semantic_dedup kept-set agreement on the HARD 200k corpus
   (sf10_hard, k=256, threshold 0.9): kept fraction per codebook +
   Jaccard overlap of each variant's DROPPED set vs the literal
   baseline (drops are the operator's actual decisions; kept sets are
   ~99% of rows, so their overlap saturates trivially).

Pass criterion (verdict): table within ~2 recall points of literal at
equal cell count.

Usage: python scripts/codebook_quality.py --out CODEBOOK_QUALITY_r15.json
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pandas as pd  # noqa: E402,F401  (pandas_udf type-hint resolution)

from csv_etl_spark import get_spark  # noqa: E402

SCALE = REPO / "scripts" / "scale"
K = 5
N_PROBES = 50
N_CELLS = 256


def topk_sets(df, k: int) -> dict:
    out: dict = {}
    for r in df.collect():
        out.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    return out


def recall(approx: dict, exact: dict, k: int) -> float:
    if not exact:
        return 0.0
    return sum(
        len(approx.get(p, set()) & s) / min(k, len(s)) for p, s in exact.items()
    ) / len(exact)


def main() -> None:
    from pyspark.sql import functions as F

    from csv_etl_spark.operators import similarity

    args = sys.argv[1:]
    if "--out" not in args:
        raise SystemExit("usage: codebook_quality.py --out FILE.json")
    out_name = args[args.index("--out") + 1]

    spark = get_spark("codebook-quality")
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    env_start = bench._env_stamp()

    def codebooks(e, sample_fraction):
        return {
            "literal": lambda: similarity.kmeans_centroids(
                e, n_centroids=N_CELLS, iters=2, sample_fraction=sample_fraction
            ),
            "table": lambda: similarity.kmeans_codebook_table(
                e, n_centroids=N_CELLS, kmeans_iters=2,
                sample_fraction=sample_fraction,
            ),
            "firstn": lambda: e.orderBy("vec_id")
            .limit(N_CELLS)
            .select(
                F.col("vec_id").cast("int").alias("centroid_id"),
                F.col("embedding").alias("centroid_vec"),
            ),
        }

    payload: dict = {
        "n_cells": N_CELLS,
        "k": K,
        "n_probes": N_PROBES,
        "ann": {},
        "semantic": {},
    }

    # ---- axis 1: ANN recall@5 on the hard 2M corpus --------------------
    p2m = SCALE / "sf100_hard" / "embeddings.parquet"
    if p2m.exists():
        e = spark.read.parquet(str(p2m))
        probes = (
            e.orderBy("vec_id")
            .limit(N_PROBES)
            .select(
                F.col("vec_id").alias("probe_id"),
                F.col("embedding").alias("probe_vec"),
            )
        )
        exact = topk_sets(similarity.brute_force_topk(e, probes, k=K), K)
        for name, mk in codebooks(e, sample_fraction=0.2).items():
            t0 = time.perf_counter()
            cb = mk()
            # materialize the fit once so fit time is separable from scan
            cb = cb.cache()
            n_fitted = cb.count()
            fit_sec = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            approx = topk_sets(
                similarity.ivf_topk(e, probes, k=K, nprobe=2, centroids=cb), K
            )
            payload["ann"][name] = {
                "recall_at_5": round(recall(approx, exact, K), 4),
                "cells_fitted": int(n_fitted),
                "fit_sec": fit_sec,
                "query_sec": round(time.perf_counter() - t0, 2),
            }
            print(f"ann {name}: {payload['ann'][name]}", file=sys.stderr, flush=True)
            cb.unpersist()

    # ---- axis 2: semantic_dedup kept/dropped agreement at 200k ---------
    p200k = SCALE / "sf10_hard" / "embeddings.parquet"
    if p200k.exists():
        e = spark.read.parquet(str(p200k))
        dropped: dict[str, set] = {}
        for name, mk in codebooks(e, sample_fraction=None).items():
            t0 = time.perf_counter()
            out = similarity.semantic_dedup(
                e, threshold=0.9, centroids=mk(), max_cluster_size=100_000
            )
            rows = out.select("vec_id", "kept").collect()
            dropped[name] = {r["vec_id"] for r in rows if not r["kept"]}
            payload["semantic"][name] = {
                "rows": len(rows),
                "dropped": len(dropped[name]),
                "kept_fraction": round(1 - len(dropped[name]) / len(rows), 6),
                "sec": round(time.perf_counter() - t0, 2),
            }
            print(
                f"semantic {name}: {payload['semantic'][name]}",
                file=sys.stderr,
                flush=True,
            )
        base = dropped.get("literal", set())
        for name, d in dropped.items():
            if name == "literal":
                continue
            union = len(base | d) or 1
            payload["semantic"][name]["drop_jaccard_vs_literal"] = round(
                len(base & d) / union, 4
            )

    payload["env"] = {"start": env_start, "end": bench._env_stamp()}
    out_path = REPO / "bench_records" / out_name
    out_path.write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
