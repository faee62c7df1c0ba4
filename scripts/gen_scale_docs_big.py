#!/usr/bin/env python
"""REAL-VOCABULARY document corpora for the deep dedup/LSH decades
(r12 verdict ask #5).

The measured-shape generator (gen_scale_docs.py) draws from the base
table's 31-word vocabulary, so past ~500k docs the MinHash band buckets
saturate and candidate pairs grow quadratically BY CORPUS CONSTRUCTION
— three r10 sf100 ladder attempts exhausted the scratch disk in the
first verify-join shuffle.  That is a property of the corpus, not the
operator: on a real-vocabulary corpus band collisions stay proportional
to true near-dups.  This generator builds that corpus: a 50,000-word
Zipf vocabulary (Heaps-law-realistic distinct-shingle growth), the SAME
measured doc-length distribution and planted exact-duplicate rate as
the classic corpora, same schema.  Because the vocabulary differs from
the classic family, decade slopes must be measured BETWEEN big corpora
(big5M → big50M), never big-vs-classic.

Fully vectorized (numpy draws + pyarrow binary_join), chunked writer —
50M docs (~6 GB parquet) generates in minutes without holding the
corpus in memory.

Usage: python scripts/gen_scale_docs_big.py [big5M big15M big50M]
       (default: big5M big50M)
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1/documents.parquet"
OUT_ROOT = Path(__file__).resolve().parent / "scale"
SIZES = {"big5M": 5_000_000, "big15M": 15_000_000, "big50M": 50_000_000}
DEFAULT_SIZES = ["big5M", "big50M"]
SEED = 99
CHUNK = 1_000_000
VOCAB_N = 50_000
ZIPF_S = 1.05  # word-frequency skew (natural-language-ish)
DUP_RATE = 8 / 5000  # the classic corpora's measured exact-dup rate


def measured_lengths() -> np.ndarray:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT len(string_split(trim(text), ' ')) FROM '{BASE}'"
    ).fetchall()
    return np.asarray([r[0] for r in rows], dtype="int64")


def main() -> None:
    import sys

    wanted = sys.argv[1:] or DEFAULT_SIZES
    unknown = [w for w in wanted if w not in SIZES]
    if unknown:
        raise SystemExit(f"unknown sizes {unknown}; choose from {list(SIZES)}")
    lengths_pool = measured_lengths()
    vocab = np.asarray([f"w{i:05d}" for i in range(VOCAB_N)])
    w = np.arange(1, VOCAB_N + 1, dtype="float64") ** (-ZIPF_S)
    cum = np.cumsum(w / w.sum())

    for name in wanted:
        n = SIZES[name]
        rng = np.random.RandomState(SEED + n % 1_000_003)
        out = OUT_ROOT / name
        out.mkdir(parents=True, exist_ok=True)
        writer = None
        for start in range(0, n, CHUNK):
            m = min(CHUNK, n - start)
            lens = rng.choice(lengths_pool, size=m)
            total = int(lens.sum())
            ids = np.searchsorted(cum, rng.random(total))
            # pa.array on a large numpy-unicode input may return a
            # ChunkedArray; values are only ~6 B/word so combining is
            # far under the 2 GB offset cap
            flat = pa.array(vocab[ids])
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            offsets = pa.array(
                np.concatenate(([0], np.cumsum(lens))).astype("int32")
            )
            texts = pc.binary_join(
                pa.ListArray.from_arrays(offsets, flat), " "
            )
            # planted exact dups: each dup position reuses an EARLIER
            # doc's text in the same chunk (ids stay unique)
            take = np.arange(m, dtype="int64")
            dup_pos = np.nonzero(rng.random(m) < DUP_RATE)[0]
            dup_pos = dup_pos[dup_pos > 0]
            if len(dup_pos):
                take[dup_pos] = (rng.random(len(dup_pos)) * dup_pos).astype(
                    "int64"
                )
                texts = texts.take(pa.array(take))
            doc_id = np.arange(start, start + m, dtype="int64")
            tbl = pa.table(
                {
                    "doc_id": pa.array(doc_id),
                    "text": texts,
                    "lang": pa.array(["en"] * m, pa.string()),
                    "source": pa.array(
                        [f"crawl-{i % 5}" for i in range(start, start + m)],
                        pa.string(),
                    ),
                    "n_chars": pc.utf8_length(texts).cast(pa.int64()),
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(out / "documents.parquet", tbl.schema)
            writer.write_table(tbl, row_group_size=65536)
            print(f"{name}: {start + m}/{n}", flush=True)
        writer.close()
        print(f"{name}: {n} docs -> {out}/documents.parquet")


if __name__ == "__main__":
    main()
