"""Engine-portable distributed statistics: variance / stddev / covariance /
correlation from EXACT fixed-point moments.

The problem with ``F.stddev_samp`` / ``F.corr`` for a cross-engine
contract: they accumulate IEEE doubles, so the result depends on the
partitioning/merge order — Spark and a sequential engine (or two Spark
runs with different partition counts) disagree in the last ulps, and a
value-hash comparison flakes.  The classic fix is the one every exact-sum
system uses: quantize each sample to a fixed-point integer
(``floor(x · 10^q)``), accumulate the moments Σx, Σx², Σxy as EXACT
decimal integers (order-independent, map-side combinable), and only then
run the textbook scalar formulas on the moments.  Same integers → same
doubles → same stats, on any engine, any partitioning.

Scale shape: ONE groupBy over the keys with map-side partial aggregation
(sums and counts combine associatively) — the same single-shuffle plan a
plain aggregate gets.  No second pass, no window, no collect.  Decimal
sums cost a few % over double sums and buy bit-reproducibility.

Accuracy: quantization at q=6 bounds the per-sample error at 1e-6 —
far below any gate that consumes these stats; the moment formula's
cancellation happens in doubles IDENTICALLY in every engine, so parity
holds even where absolute accuracy degrades (catastrophic cancellation
needs |mean| ≫ stddev, which the caller can re-center away).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 10^6 fixed-point quantization: floor is unambiguous on identical IEEE
# inputs in every engine (no round-half mode to disagree on)
QUANT = 1_000_000


def _q(col: Column) -> Column:
    """Fixed-point sample: exact decimal integer, wide enough that the
    per-group Σx² of ~1e18-sized squares stays exact in decimal(38,0)."""
    return F.floor(col.cast("double") * F.lit(QUANT)).cast("decimal(19,0)")


def moment_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: list[str],
) -> DataFrame:
    """Per-group (n, mean/stddev of x, covariance and Pearson correlation
    of x,y) from exact fixed-point moments — reproducible bit-for-bit on
    any engine and any partitioning.  Sample (n−1) normalization;
    groups with n < 2 report NULL stddev/covar/corr, zero-variance
    groups report NULL corr (undefined), like SQL's stddev_samp/corr."""
    xq, yq = _q(F.col(x_col)), _q(F.col(y_col))
    agg = df.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xq).alias("_sx"),
        F.sum(yq).alias("_sy"),
        F.sum(xq * xq).alias("_sxx"),
        F.sum(yq * yq).alias("_syy"),
        F.sum(xq * yq).alias("_sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx, syy, sxy = (
        F.col("_sxx").cast("double"),
        F.col("_syy").cast("double"),
        F.col("_sxy").cast("double"),
    )
    q = F.lit(float(QUANT))
    mean_x = sx / n / q
    # var_samp = (n·Σx² − (Σx)²) / (n(n−1)) in quantized units
    vxn = n * sxx - sx * sx
    vyn = n * syy - sy * sy
    cvn = n * sxy - sx * sy
    denom = n * (n - F.lit(1.0))
    two_plus = F.col("n") >= 2
    std_x = F.when(two_plus, F.sqrt(vxn / denom) / q)
    covar = F.when(two_plus, cvn / denom / q / q)
    corr = F.when(
        two_plus & (vxn > 0) & (vyn > 0), cvn / F.sqrt(vxn) / F.sqrt(vyn)
    )
    return agg.select(
        *by,
        F.col("n").cast("bigint").alias("n"),
        F.round(mean_x, 6).alias("mean_x"),
        F.round(std_x, 6).alias("stddev_x"),
        F.round(covar, 6).alias("covar_xy"),
        F.round(corr, 6).alias("corr_xy"),
    )


def moment_stats_oracle_sql(
    table: str, x_col: str, y_col: str, by: list[str]
) -> str:
    """The DuckDB twin: identical quantization, identical moment sums
    (HUGEINT — exact), identical scalar combine, identical rounding."""
    keys = ", ".join(by)
    xq = f"CAST(floor(CAST({x_col} AS DOUBLE) * {QUANT}) AS HUGEINT)"
    yq = f"CAST(floor(CAST({y_col} AS DOUBLE) * {QUANT}) AS HUGEINT)"
    return f"""
    WITH m AS (
      SELECT {keys}, count(*) AS n,
             sum({xq}) AS sx, sum({yq}) AS sy,
             sum({xq} * {xq}) AS sxx, sum({yq} * {yq}) AS syy,
             sum({xq} * {yq}) AS sxy
      FROM {table} GROUP BY {keys}
    )
    SELECT {keys}, CAST(n AS BIGINT) AS n,
           round(CAST(sx AS DOUBLE) / n / {QUANT}.0, 6) AS mean_x,
           CASE WHEN n >= 2 THEN round(
             sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  / (n * (n - 1.0))) / {QUANT}.0, 6) END AS stddev_x,
           CASE WHEN n >= 2 THEN round(
             (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * (n - 1.0)) / {QUANT}.0 / {QUANT}.0, 6) END AS covar_xy,
           CASE WHEN n >= 2
                 AND (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                 AND (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
            THEN round(
             (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 6)
           END AS corr_xy
    FROM m
"""
