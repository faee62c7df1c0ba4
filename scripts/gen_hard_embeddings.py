#!/usr/bin/env python
"""HARD-MODE embeddings corpora for the ANN recall protocol (r12 verdict
ask #2).

The original 10-planted-cluster corpus SATURATES at 2M vectors: neighbor
density grows with N, so by sf100 every measured tier reads recall@5 =
1.000 and the protocol stops discriminating a good router from a lucky
one (RECALL_r12.json).  These corpora are built to keep discriminating
at scale:

* **clusters ∝ √N** (1,414 at 2M) instead of a constant 10 — cell
  boundaries stay commensurate with cluster structure at every size;
* **hierarchical means**: cluster means are perturbations of a small
  set of super-directions, so groups of clusters are mutually CLOSE and
  IVF cell boundaries genuinely cut through neighborhoods (random means
  in 64-dim are near-orthogonal — trivially separable);
* **mixed densities**: per-cluster sigma log-uniform in [0.06, 0.5]
  and Zipf-weighted cluster sizes — dense cores next to diffuse halos,
  the regime where a fixed-nprobe router loses true neighbors.

Written to scripts/scale/<name>_hard/embeddings.parquet with the SAME
schema as gen_scale_embeddings.py (vec_id int64, embedding
list<float32> unit-norm, label int32) so every operator/oracle runs
unchanged.  The ladder corpora (scripts/scale/sf*/embeddings.parquet)
are deliberately NOT touched: SCALE.md's committed timings were
measured on them.

Usage: python scripts/gen_hard_embeddings.py [sf10 sf100]
       (writes sf10_hard / sf100_hard)
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT_ROOT = Path(__file__).resolve().parent / "scale"
SIZES = {
    "sf1": 20_000,
    "sf10": 200_000,
    "sf100": 2_000_000,
    "sf1000": 20_000_000,  # r13: past the 16M tier switch (4472 clusters)
}
DEFAULT_SIZES = ["sf10", "sf100"]
SEED = 77
CHUNK = 250_000
DIM = 64
N_SUPER = 40          # super-directions the cluster means hang off
SUPER_SPREAD = 0.35   # mean = normalize(super + SUPER_SPREAD * noise)
SIGMA_LO, SIGMA_HI = 0.06, 0.5  # per-cluster residual std (log-uniform)
ZIPF_S = 0.7          # cluster-size skew


def main() -> None:
    import sys

    wanted = sys.argv[1:] or DEFAULT_SIZES
    unknown = [w for w in wanted if w not in SIZES]
    if unknown:
        raise SystemExit(f"unknown sizes {unknown}; choose from {list(SIZES)}")
    for name in wanted:
        n = SIZES[name]
        rng = np.random.RandomState(SEED + n % 1_000_003)
        n_clusters = max(16, int(math.isqrt(n)))
        supers = rng.normal(size=(N_SUPER, DIM))
        supers /= np.linalg.norm(supers, axis=1, keepdims=True)
        parent = rng.randint(0, N_SUPER, size=n_clusters)
        mus = supers[parent] + SUPER_SPREAD * rng.normal(
            size=(n_clusters, DIM)
        )
        mus /= np.linalg.norm(mus, axis=1, keepdims=True)
        sigmas = np.exp(
            rng.uniform(math.log(SIGMA_LO), math.log(SIGMA_HI), size=n_clusters)
        )
        w = (np.arange(1, n_clusters + 1, dtype="float64")) ** (-ZIPF_S)
        w /= w.sum()

        out = OUT_ROOT / f"{name}_hard"
        out.mkdir(parents=True, exist_ok=True)
        writer = None
        for start in range(0, n, CHUNK):
            m = min(CHUNK, n - start)
            labs = rng.choice(n_clusters, size=m, p=w)
            v = mus[labs] + rng.normal(size=(m, DIM)) * sigmas[labs][:, None]
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            tbl = pa.table(
                {
                    "vec_id": pa.array(np.arange(start, start + m, dtype="int64")),
                    "embedding": pa.array(
                        list(v.astype("float32")), type=pa.list_(pa.float32())
                    ),
                    "label": pa.array(labs.astype("int32")),
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(out / "embeddings.parquet", tbl.schema)
            # r16: 62.5k-row groups (~16-32 MB) — 500k-row groups made the
            # 2M corpora 4-8 row groups TOTAL, and a parquet scan cannot
            # split a row group, so every scan-side map stage (arrow
            # assignment, quantize) ran 4-8-way on 32 cores (measured r16;
            # the 2M absolutes in r13-r15 BENCHNOTES carry that starvation)
            writer.write_table(tbl, row_group_size=62_500)
        writer.close()
        print(
            f"{name}_hard: {n} vectors x {DIM} dims, {n_clusters} clusters "
            f"({N_SUPER} supers, sigma {SIGMA_LO}-{SIGMA_HI}, "
            f"zipf {ZIPF_S}) -> {out}"
        )


if __name__ == "__main__":
    main()
