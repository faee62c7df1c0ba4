"""csv_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ultrasardine/csv-etl.

The reference (``/root/reference``, read-only) is a row-at-a-time Python
interpreter of a declarative JSON mapping language (FileSpec + ETLMapping).
This engine re-expresses that language as a *compiler* from mapping JSON to
Spark Column expressions: the whole mapping becomes one declarative
``df.filter(keep).select(exprs)`` logical plan that Catalyst optimizes
(predicate pushdown, column pruning, whole-stage codegen) — no Python in the
row loop anywhere.

Layout:
  specs.py       — FileSpec / ColumnSpec / ETLMapping / SpecStore (JSON-compatible
                   with the reference's data/config/*.json shapes)
  datefmt.py     — strptime → java.time pattern translator
  conditions.py  — the mapping language's condition mini-grammar → Column
  formula.py     — arithmetic formula parser → Column (ANSI-safe try_* ops)
  compiler.py    — filter rules (F1-F7) + field transforms (T1-T8) + error
                   channel (V1) → CompiledMapping
  functions/     — typed-path scalar library (C1-C13) as Column builders
  sources/       — spec-driven CSV scan/sink (S1-S10)
  plans/         — pipeline runner: transform/validate with metrics (V2-V5)
  operators/     — scale extensions: dedup, similarity search, text analysis,
                   multimodal
  streaming/     — Structured Streaming ingest (events, watermark + windows)
"""

from csv_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
