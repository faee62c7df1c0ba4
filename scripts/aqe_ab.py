#!/usr/bin/env python
"""A/B the AQE initialPartitionNum widening (r10 session.py change) on
the four queries the r10 bench flagged as small regressions
(image_dup_clusters, record_clusters, bm25_terms, part_pagerank) —
verdict r10 ask #7.  Runs bench.py twice at n_runs=5 on the subset:
once with the 8× widening (the r10 default) and once pinned back to the
plain shuffle partition count, writing both detail files to
bench_records/ for comparison.

Usage: python scripts/aqe_ab.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
QUERIES = "image_dup_clusters,record_clusters,bm25_terms,part_pagerank"


def run(tag: str, initial: str | None) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = QUERIES
    env["SPARK_GRAFT_BENCH_RUNS"] = "5"
    env["SPARK_GRAFT_BENCH_DETAIL"] = f"AQE_AB_{tag}.json"
    if initial is not None:
        env["SPARK_GRAFT_INITIAL_PARTITIONS"] = initial
    subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, cwd=REPO, check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    return json.loads(
        (REPO / "bench_records" / f"AQE_AB_{tag}.json").read_text()
    )["queries"]


def main() -> None:
    wide = run("wide256", None)        # session default: 8x widening
    narrow = run("narrow32", "32")     # pinned back to shuffle partitions
    print(json.dumps({"wide256": wide, "narrow32": narrow}, indent=1))


if __name__ == "__main__":
    main()
