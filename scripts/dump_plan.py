#!/usr/bin/env python
"""Dump .explain('formatted') for declared queries to files.

Usage: python scripts/dump_plan.py SF_DIR OUT_DIR SUFFIX query [query ...]
Writes OUT_DIR/<query>_<SUFFIX>.txt for each query.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir, out_dir, suffix, *names = sys.argv[1:]
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    import __spark_entry__ as entry_mod
    from csv_etl_spark import get_spark

    spark = get_spark("dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    queries = entry_mod.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        (out / f"{name}_{suffix}.txt").write_text(text)
        print(f"wrote {name}_{suffix}.txt ({len(text)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
