#!/usr/bin/env python
"""Generate scaled-up `events` tables for the scale-step bench.

Companion to gen_scale_docs.py: the document operators have observed
scale steps, but the EVENT operators (per-entity windows, time-RANGE
frames, SCD2 history, skew-salted aggregation, cohort analytics) scale
along different axes — number of entities (window partitions / state
keys) and rows per entity (frame work).  This writes events with the
measured sf0.1 shape (1,500 users per 100k rows, 30-day span, 5 uniform
event types, exponential values, microsecond timestamps) at 10x and
100x, scaling USERS proportionally so per-user density stays constant —
the realistic growth mode (more entities, not deeper histories).

Usage: python scripts/gen_scale_events.py [sf1 sf10 | sf100]
(default sf1+sf10; sf100 = 100M rows / ~2 GB, generated on demand for
the round-9 third event decade, written in 10M-row chunks so peak
memory stays at one chunk.)
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT_ROOT = Path(__file__).resolve().parent / "scale"
SIZES = {"sf1": 1_000_000, "sf10": 10_000_000, "sf100": 100_000_000}
DEFAULT_SIZES = ["sf1", "sf10"]
CHUNK = 10_000_000
USERS_PER_ROW = 1_500 / 100_000  # measured sf0.1 density
SPAN_US = 30 * 24 * 3600 * 1_000_000  # 30 days
BASE_US = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
EVENT_TYPES = np.array(["signup", "purchase", "view", "click", "error"])
SEED = 43


def main() -> None:
    import sys

    wanted = sys.argv[1:] or DEFAULT_SIZES
    unknown = [w for w in wanted if w not in SIZES]
    if unknown:
        raise SystemExit(f"unknown sizes {unknown}; choose from {list(SIZES)}")
    rng = np.random.RandomState(SEED)
    for name in wanted:
        n_rows = SIZES[name]
        n_users = int(n_rows * USERS_PER_ROW)
        out = OUT_ROOT / name
        out.mkdir(parents=True, exist_ok=True)
        writer = None
        for start in range(0, n_rows, CHUNK):
            n = min(CHUNK, n_rows - start)
            ts = BASE_US + rng.randint(0, SPAN_US, size=n)
            tbl = pa.table(
                {
                    "event_id": pa.array(np.arange(start, start + n, dtype="int64")),
                    "ts": pa.array(ts.astype("datetime64[us]")),
                    "user_id": pa.array(rng.randint(0, n_users, size=n).astype("int64")),
                    "event_type": pa.array(EVENT_TYPES[rng.randint(0, 5, size=n)]),
                    "value": pa.array(np.round(rng.exponential(50.0, size=n), 2)),
                    "props": pa.array(np.full(n, "{}", dtype=object)),
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(out / "events.parquet", tbl.schema)
            writer.write_table(tbl, row_group_size=100_000)
        writer.close()
        print(f"{name}: {n_rows} events / {n_users} users -> {out}/events.parquet")


if __name__ == "__main__":
    main()
