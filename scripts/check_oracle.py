#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() twin on the same
parquet tables, compare row-count + column names + order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]

Note: a few oracles replicate deliberately-quadratic verification SQL
(image_dhash_pairs' nested-loop Hamming join, the full MinHash/SemDeDup
pipelines); at sf0.1 those grind for CPU-hours in DuckDB.  Run the full
suite at sf0.001/sf0.01 (both verified green); at sf0.1 check targeted
queries only.
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df) -> tuple[int, list[str], list[tuple]]:
    """(row_count, sorted_columns, sorted canonical rows).

    Strict on value REPRESENTATION, like the driver's hash: an integer
    "123" and a float "123.0" are DIFFERENT (this is exactly how DuckDB's
    HUGEINT sum(BIGINT) -> pandas float64 burned round 1), and floats
    compare at full repr precision, not 6-digit-rounded text — queries must
    pre-round/decimal-cast so both engines emit bit-identical doubles.
    Integer WIDTH is canonicalized away (int32 == int64), matching observed
    driver behavior (str() of numpy ints has no width marker).
    """
    import numpy as np

    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("∅")
            elif isinstance(v, (bool, np.bool_)):
                row.append(str(bool(v)))
            elif isinstance(v, (int, np.integer)):
                row.append(str(int(v)))
            elif isinstance(v, (float, np.floating)):
                if math.isnan(float(v)):
                    row.append("∅")
                else:
                    # full-precision repr via python float (float32 that is
                    # not double-representable will show its true value)
                    row.append(repr(float(v)))
            elif hasattr(v, "isoformat"):
                row.append(v.isoformat())
            elif isinstance(v, (list, tuple, np.ndarray)):
                row.append(str(list(v)))
            else:
                row.append(str(v))
        rows.append(tuple(row))
    rows.sort()
    return len(rows), cols, rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from csv_etl_spark import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures, passed, rows_only = [], [], []

    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"✗ {name}: spark error: {str(e)[:500]}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"○ {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        t_spark = time.time() - t0
        t1 = time.time()
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"✗ {name}: oracle error: {str(e)[:500]}")
            continue

        sn, scols, srows = canon(sdf)
        on, ocols, orows = canon(odf)
        if scols != ocols:
            failures.append((name, f"columns differ: spark={scols} oracle={ocols}"))
            print(f"✗ {name}: columns differ\n  spark:  {scols}\n  oracle: {ocols}")
        elif sn != on:
            failures.append((name, f"row count differs: spark={sn} oracle={on}"))
            print(f"✗ {name}: row count spark={sn} oracle={on}")
        elif srows != orows:
            diff_idx = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            failures.append((name, "values differ"))
            print(f"✗ {name}: values differ at sorted row {diff_idx}")
            print(f"  cols:   {scols}")
            print(f"  spark:  {srows[diff_idx]}")
            print(f"  oracle: {orows[diff_idx]}")
        else:
            passed.append(name)
            print(f"✓ {name} ({sn} rows, spark {t_spark:.1f}s, oracle {time.time()-t1:.1f}s)")

    print(f"\n{len(passed)} passed, {len(failures)} failed, {len(rows_only)} rows-only")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
