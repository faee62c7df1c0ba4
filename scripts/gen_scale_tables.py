#!/usr/bin/env python
"""Generate scaled-up `customer` and `lineitem` tables for the
scale-step bench — the third data axis after documents
(gen_scale_docs.py) and events (gen_scale_events.py).

These feed the round-8 operators whose scale evidence was previously a
plan-shape note only: fuzzy_join / record_clusters read
``customer.c_custkey`` (they synthesize their match strings from the key
via md5), and copurchase_pairs reads ``lineitem(l_orderkey,
l_partkey)``.  Shape is measured from /root/testdata/sf0.1: customer
keys stay dense 0..N-1; lineitem draws lines-per-order from the
EMPIRICAL sf0.1 distribution (mean ≈ 4.07, max 17) and scales the order
AND part keyspaces together (the TPC-H growth mode — basket sizes stay
constant, the co-occurrence matrix gets sparser, exactly how a real
catalog grows).

Only the columns the scale-bench queries read are generated — the other
lineitem columns would cost gigabytes without adding evidence.

Usage: python scripts/gen_scale_tables.py [sf1 sf10]   (default both)
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT_ROOT = Path(__file__).resolve().parent / "scale"
BASE = "/root/testdata/sf0.1"
# sf0.1 measured: 15,000 customers; 147,236 orders / 20,000 parts /
# 600,000 lines
# sf100 (r12, verdict ask #7): a fourth lineitem decade — 600M lines,
# ~6.3 GB parquet of the three generated columns; the chunked writer
# keeps peak memory at one CHUNK_ORDERS draw (~8M rows)
SCALES = {"sf1": 10, "sf10": 100, "sf100": 1000}
BASE_CUSTOMERS = 15_000
BASE_ORDERS = 150_000
BASE_PARTS = 20_000
BASE_SUPPLIERS = 1_000
SEED = 44
CHUNK_ORDERS = 2_000_000


def lines_per_order_distribution() -> tuple[np.ndarray, np.ndarray]:
    rows = duckdb.sql(
        f"SELECT n, count(*) AS c FROM (SELECT l_orderkey, count(*) AS n "
        f"FROM '{BASE}/lineitem.parquet' GROUP BY 1) GROUP BY 1 ORDER BY 1"
    ).fetchall()
    ns = np.array([r[0] for r in rows], dtype="int64")
    ws = np.array([r[1] for r in rows], dtype="float64")
    return ns, ws / ws.sum()


def main() -> None:
    import sys

    wanted = sys.argv[1:] or list(SCALES)
    unknown = [w for w in wanted if w not in SCALES]
    if unknown:
        raise SystemExit(f"unknown sizes {unknown}; choose from {list(SCALES)}")
    ns, probs = lines_per_order_distribution()
    # HISTORICAL HAZARD, preserved: sf1/sf10 share ONE sequential rng
    # stream (the committed r8/r9 corpora every earlier ladder was
    # measured on were drawn that way), so regenerating them requires
    # the default both-in-order run.  sf100 (new in r12) gets its OWN
    # seed stream so it reproduces identically whether generated
    # standalone or after the others.
    # ADVICE r12: once sf100 reassigns rng to its own stream, any
    # shared-stream size processed AFTER it in the same invocation
    # (e.g. `gen_scale_tables.py sf100 sf1`) would silently draw from
    # the wrong, partially-consumed stream and no longer match the
    # committed r8/r9 corpora.  Reject such orders outright.
    if "sf100" in wanted:
        after = wanted[wanted.index("sf100") + 1 :]
        shared_after = [w for w in after if w != "sf100"]
        if shared_after:
            raise SystemExit(
                f"sf100 must come LAST: {shared_after} after sf100 would "
                "draw from the wrong rng stream (shared sf1/sf10 stream "
                "is sequential; sf100 reseeds). Re-order as "
                f"{shared_after + ['sf100']}."
            )
    rng = np.random.RandomState(SEED)
    for name in wanted:
        if name == "sf100":
            rng = np.random.RandomState(SEED + 100)
        scale = SCALES[name]
        out = OUT_ROOT / name
        out.mkdir(parents=True, exist_ok=True)

        n_cust = BASE_CUSTOMERS * scale
        # c_mktsegment (r10, salted_join_customers' dim attribute) from
        # the measured sf0.1 segment frequencies — drawn from a SEPARATE
        # rng stream so the lineitem draws below stay bit-identical to
        # the r8/r9 corpora the earlier ladders were measured on
        seg_rows = duckdb.sql(
            f"SELECT c_mktsegment, count(*) FROM '{BASE}/customer.parquet' "
            f"GROUP BY 1 ORDER BY 1"
        ).fetchall()
        segs = np.array([r[0] for r in seg_rows])
        seg_p = np.array([r[1] for r in seg_rows], dtype="float64")
        seg_p /= seg_p.sum()
        seg_rng = np.random.RandomState(SEED + 1)
        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array(np.arange(n_cust, dtype="int64")),
                    "c_mktsegment": pa.array(
                        seg_rng.choice(segs, size=n_cust, p=seg_p)
                    ),
                }
            ),
            out / "customer.parquet",
            row_group_size=100_000,  # r16: 1M-row groups starved 32-core scans (see gen_hard_embeddings),
        )

        n_orders = BASE_ORDERS * scale
        n_parts = BASE_PARTS * scale
        n_supp = BASE_SUPPLIERS * scale
        writer = None
        for start in range(0, n_orders, CHUNK_ORDERS):
            n = min(CHUNK_ORDERS, n_orders - start)
            per = rng.choice(ns, size=n, p=probs)
            ok = np.repeat(np.arange(start, start + n, dtype="int64"), per)
            pk = rng.randint(0, n_parts, size=len(ok)).astype("int64")
            # suppkey drawn AFTER ok/pk so adding it (r9, part_pagerank's
            # co-supply axis) left the earlier columns bit-identical to
            # the r8 corpora copurchase_pairs was measured on
            sk = rng.randint(0, n_supp, size=len(ok)).astype("int64")
            tbl = pa.table(
                {
                    "l_orderkey": pa.array(ok),
                    "l_partkey": pa.array(pk),
                    "l_suppkey": pa.array(sk),
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(out / "lineitem.parquet", tbl.schema)
            # r16: 100k-row groups — 1M-row groups left the 6M-row
            # lineitem decade with 6 unsplittable groups (6-way scans)
            writer.write_table(tbl, row_group_size=100_000)
        writer.close()
        print(
            f"{name}: {n_cust} customers; {n_orders} orders x "
            f"~{float(np.dot(ns, probs)):.2f} lines -> {out}"
        )


if __name__ == "__main__":
    main()
