#!/usr/bin/env python
"""Generate scaled-up `documents` tables for the scale-step bench.

The driver's testdata stops at sf0.1 (5,000 docs) and is read-only; the
100 TB story needs at least one observed scale step.  This script writes
word-salad documents with the SAME statistical shape as the driver's
generator (vocabulary, doc-length distribution, and exact-duplicate rate
are all measured from /root/testdata/sf0.1/documents.parquet, seed fixed)
at 10x and 100x the sf0.1 row count, under scripts/scale/ (git-ignored).

Usage: python scripts/gen_scale_docs.py
"""

from __future__ import annotations

import random
from collections import Counter
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1/documents.parquet"
OUT_ROOT = Path(__file__).resolve().parent / "scale"
# sf100 (5M docs, ~1.7 GB) is the round-8 extra decade for the span/image
# pair; generate it on demand: `gen_scale_docs.py sf100` (default
# regenerates the classic sf1+sf10 pair only).
SIZES = {"sf1": 50_000, "sf10": 500_000, "sf100": 5_000_000}
DEFAULT_SIZES = ["sf1", "sf10"]
SEED = 42
DUP_RATE = 8 / 5000  # measured: 5000 rows, 4992 distinct texts at sf0.1


def measured_shape() -> tuple[list[str], list[float], list[int]]:
    con = duckdb.connect()
    toks = con.execute(
        f"SELECT unnest(string_split(text, ' ')) AS t FROM '{BASE}'"
    ).fetchall()
    counts = Counter(t[0] for t in toks if t[0])
    vocab, weights = zip(*sorted(counts.items(), key=lambda kv: (-kv[1], kv[0])))
    total = sum(weights)
    lengths = [
        r[0]
        for r in con.execute(
            f"SELECT len(string_split(trim(text), ' ')) FROM '{BASE}'"
        ).fetchall()
    ]
    return list(vocab), [w / total for w in weights], lengths


def main() -> None:
    import sys

    wanted = sys.argv[1:] or DEFAULT_SIZES
    unknown = [w for w in wanted if w not in SIZES]
    if unknown:
        raise SystemExit(f"unknown sizes {unknown}; choose from {list(SIZES)}")
    vocab, probs, lengths = measured_shape()
    print(f"vocab={len(vocab)} len[min,max]=({min(lengths)},{max(lengths)})")
    for name, n_docs in ((n, SIZES[n]) for n in wanted):
        rng = random.Random(SEED)
        texts: list[str] = []
        for i in range(n_docs):
            if texts and rng.random() < DUP_RATE:
                texts.append(texts[rng.randrange(len(texts))])
                continue
            n = rng.choice(lengths)
            texts.append(
                " ".join(rng.choices(vocab, weights=probs, k=n)) + " "
            )
        tbl = pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n_docs, pa.string()),
                "source": pa.array(
                    [f"crawl-{i % 5}" for i in range(n_docs)], pa.string()
                ),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )
        out = OUT_ROOT / name
        out.mkdir(parents=True, exist_ok=True)
        pq.write_table(tbl, out / "documents.parquet", row_group_size=16384)
        print(f"{name}: {n_docs} docs -> {out}/documents.parquet")


if __name__ == "__main__":
    main()
