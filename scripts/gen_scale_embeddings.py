#!/usr/bin/env python
"""Generate scaled-up `embeddings` tables for the scale-step bench — the
fourth data axis (after documents, events, customer/lineitem).

The ANN/kNN-graph/standardization operators previously had no measured
decades because the driver's embeddings table stops at sf0.1 (2,000
vectors) and no generator existed (r9 VERDICT gap).  Shape is measured
from /root/testdata/sf0.1/embeddings.parquet: 64-dim UNIT-NORM vectors
in a balanced 10-cluster Gaussian mixture (labels 0-9).  New vectors
are drawn as normalize(mu_label + N(0, sigma_label)) with mu/sigma
estimated per label from the base table, so cluster geometry (IVF cell
balance, within-cluster cosine spread) matches the corpus every ANN
parameterization was tuned on.  Seed fixed; sizes are 10x/100x sf0.1
(sf100 = 2M vectors on demand).

Usage: python scripts/gen_scale_embeddings.py [sf1 sf10 | sf100]
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1/embeddings.parquet"
OUT_ROOT = Path(__file__).resolve().parent / "scale"
SIZES = {
    "sf1": 20_000,
    "sf10": 200_000,
    "sf100": 2_000_000,
    # r13: the decade PAST the 16M tier switch — the first corpus where
    # cells = N/512 genuinely exceeds sqrt(N)*2.8 and knn_join_auto's
    # raised-nprobe sharded path is the production spelling
    "sf1000": 20_000_000,
}
DEFAULT_SIZES = ["sf1", "sf10"]
SEED = 45
CHUNK = 500_000


def measure_mixture() -> tuple[np.ndarray, np.ndarray]:
    """Per-label mean vector and per-label scalar residual std from the
    base table (float64)."""
    t = pq.read_table(BASE)
    vecs = np.vstack(t["embedding"].to_pylist()).astype("float64")
    labels = np.asarray(t["label"].to_pylist())
    mus, sigmas = [], []
    for lab in sorted(set(labels.tolist())):
        m = vecs[labels == lab]
        mu = m.mean(axis=0)
        sigmas.append(float((m - mu).std()))
        mus.append(mu)
    return np.vstack(mus), np.asarray(sigmas)


def main() -> None:
    import sys

    wanted = sys.argv[1:] or DEFAULT_SIZES
    unknown = [w for w in wanted if w not in SIZES]
    if unknown:
        raise SystemExit(f"unknown sizes {unknown}; choose from {list(SIZES)}")
    mus, sigmas = measure_mixture()
    n_labels, dim = mus.shape
    for name in wanted:
        n = SIZES[name]
        out = OUT_ROOT / name
        out.mkdir(parents=True, exist_ok=True)
        rng = np.random.RandomState(SEED)
        writer = None
        for start in range(0, n, CHUNK):
            m = min(CHUNK, n - start)
            labs = rng.randint(0, n_labels, size=m)
            v = mus[labs] + rng.normal(0.0, 1.0, size=(m, dim)) * sigmas[labs][:, None]
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
        print(f"{name}: {n} vectors x {dim} dims, {n_labels} clusters -> {out}")


if __name__ == "__main__":
    main()
