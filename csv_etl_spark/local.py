"""Driver-local literal frames as pure-JVM inline tables.

``spark.createDataFrame(small_python_list)`` parallelizes the list into
a PYTHON RDD (``applySchemaToPythonRDD``) spread over
``defaultParallelism`` partitions: every consumer of the frame — most
painfully every BroadcastExchange build against it — runs a
cluster-wide stage of Python workers just to deserialize a handful of
pickled rows.  Profiled at sf0.1 (r16): ``url_registered_domain``'s
five per-depth PSL broadcast builds each ran a 32-task Python stage
(~6 s wall, ~0.15 s CPU — pure worker round-trips) to read a ≤40-row
rule table.

``local_values_frame`` renders the rows as a SQL inline ``VALUES``
table instead, which the analyzer resolves straight to a
``LocalRelation``: consumption is JVM-only, and a BroadcastExchange
over a ``LocalTableScan`` collects driver-side without launching any
job at all.  Intended for CLUSTER-SIZED or constant tables (rule
tables, per-partition offsets, trained model weights) — never for
data-sized rows.

Scalar and array-of-scalar columns only (string/int/float/bool and
NULLs); floats are
rendered through their shortest round-trip ``repr`` and parsed back by
the engine, which is exact for every finite double.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_INT_TYPES = {"tinyint", "smallint", "int", "integer", "bigint", "long"}
_FLOAT_TYPES = {"float", "double"}


def _render(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
        # shortest round-trip decimal; the SQL parser returns the same
        # double for it (exact for every finite value)
        return f"CAST('{v!r}' AS DOUBLE)"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(v, (list, tuple)):
        return "array(" + ",".join(_render(x) for x in v) + ")"
    raise TypeError(f"local_values_frame: unsupported literal type {type(v)}")


def local_values_frame(
    spark: SparkSession, rows, schema: str
) -> DataFrame:
    """Build a DataFrame from a small driver-side list of tuples as a
    JVM ``LocalRelation`` (inline VALUES), not a Python RDD.

    ``schema`` is a Spark schema string of SCALAR columns, e.g.
    ``"suffix string, kind string, nlab int"``; every value is CAST to
    its declared type so the result schema matches ``createDataFrame``
    with the same schema string.  Empty ``rows`` yield an empty frame
    of the same schema."""
    cols: list[tuple[str, str]] = []
    for part in schema.split(","):
        bits = part.strip().split(None, 1)
        if len(bits) != 2:
            raise ValueError(f"bad schema entry {part!r}")
        name, typ = bits[0], bits[1].strip()
        base = typ.lower()
        if base.startswith("array<") and base.endswith(">"):
            base = base[len("array<") : -1].strip()
        if base not in _INT_TYPES | _FLOAT_TYPES | {"string", "boolean"}:
            raise ValueError(
                f"local_values_frame supports scalar (or array-of-scalar) "
                f"columns only, got {typ!r}"
            )
        cols.append((name, typ))
    if not rows:
        return spark.range(0).select(
            *[F.lit(None).cast(t).alias(n) for n, t in cols]
        )
    rendered = ",".join(
        "(" + ",".join(_render(v) for v in tuple(r)) + ")" for r in rows
    )
    proj = ",".join(
        f"CAST(c{i} AS {t}) AS `{n}`" for i, (n, t) in enumerate(cols)
    )
    alias_cols = ",".join(f"c{i}" for i in range(len(cols)))
    return spark.sql(
        f"SELECT {proj} FROM VALUES {rendered} AS t({alias_cols})"
    )
