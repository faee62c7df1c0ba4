#!/usr/bin/env python
"""Rewrite an existing generated-corpus parquet file with small row
groups (r16): 500k-1M-row groups made the 2M corpora 4-8 unsplittable
groups, capping every scan-side map stage at 4-8 tasks on 32 cores (a
parquet scan cannot split a row group).  Row ORDER and values are
preserved bit-identically — only the row-group layout changes — so
first-n codebooks, hash samples and every deterministic contract stay
byte-for-byte.

Usage: python scripts/rewrite_rowgroups.py FILE [FILE...] [--rows 62500]

Writes FILE.tmp then atomically replaces FILE; prints old/new group
counts and verifies row count + first/last row equality.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow.parquet as pq


def main() -> None:
    args = sys.argv[1:]
    rows = 62_500
    if "--rows" in args:
        i = args.index("--rows")
        rows = int(args[i + 1])
        del args[i : i + 2]
    if not args:
        raise SystemExit(__doc__)
    for name in args:
        p = Path(name)
        f = pq.ParquetFile(p)
        old_groups, n = f.num_row_groups, f.metadata.num_rows
        tbl = pq.read_table(p)
        tmp = p.with_suffix(".parquet.tmp")
        pq.write_table(tbl, tmp, row_group_size=rows)
        f2 = pq.ParquetFile(tmp)
        assert f2.metadata.num_rows == n, (f2.metadata.num_rows, n)
        head_old = tbl.slice(0, 1).to_pylist()
        tail_old = tbl.slice(n - 1, 1).to_pylist()
        t2 = pq.read_table(tmp)
        assert t2.slice(0, 1).to_pylist() == head_old
        assert t2.slice(n - 1, 1).to_pylist() == tail_old
        tmp.replace(p)
        print(f"{p}: {old_groups} -> {f2.num_row_groups} groups ({n} rows)")


if __name__ == "__main__":
    main()
