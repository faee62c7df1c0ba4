"""Corpus-cleaning operators for training-data pipelines (BASELINE north
star): PII redaction and train/test decontamination.

Both are the shapes a 100 TB pipeline needs:

* ``scrub_pii`` is map-only — a fixed chain of JVM-side regexp_replace
  calls, linear in input splits, no shuffle, no UDF.  Patterns are written
  in the common subset of Java regex and RE2 (no lookarounds) so the
  DuckDB oracle applies the IDENTICAL patterns in the IDENTICAL order.
* ``decontaminate`` drops corpus documents that share long n-gram shingles
  with a benchmark/eval set.  The benchmark side is tiny by construction
  (eval sets are KBs-to-MBs against a TB corpus), so the shingle
  membership check is a BROADCAST semi-join: the corpus side stays
  map-only — shingle, probe the broadcast set, aggregate per doc — with
  no corpus-sized shuffle.  (At extreme benchmark sizes you'd swap the
  broadcast set for a Bloom filter; the join shape is unchanged.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from csv_etl_spark.operators.text import ws_tokens

# Ordered (pattern, replacement) chain.  Order matters and is part of the
# contract: specific shapes (email, IP, SSN) before the greedy phone
# pattern, so "123-45-6789" becomes <SSN> not <PHONE>.  Patterns avoid
# lookarounds/backrefs — the portable Java-regex ∩ RE2 subset.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\+?\d[\d()\- ]{7,}\d", "<PHONE>"),
]


def scrub_pii_column(col: Column) -> Column:
    """The scrubbed text: sequential redaction chain over ``col``."""
    out = col
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact PII and account per document.

    Returns (id, scrubbed, n_redactions): n_redactions counts matches of
    each pattern against the text AS SEEN AT THAT STAGE of the chain
    (matching what the replacements actually did), so the count is exactly
    the number of tokens inserted."""
    out = F.col(text_col)
    n = F.lit(0)
    for pattern, token in PII_PATTERNS:
        n = n + F.regexp_count(out, F.lit(pattern))
        out = F.regexp_replace(out, pattern, token)
    return df.select(
        F.col(id_col),
        out.alias("scrubbed"),
        n.cast("bigint").alias("n_redactions"),
    )


def string_shingles(col: Column, n: int) -> Column:
    """All n-token shingles of ``col`` as strings (space-joined) — the
    engine-portable spelling (hash-free), used where a SQL oracle must
    reproduce the shingle set exactly.  Documents shorter than n tokens
    yield no shingles."""
    toks = ws_tokens(col)
    count = F.size(toks) - F.lit(n - 1)
    # sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — docs
    # shorter than n tokens must short-circuit to an empty array
    return F.when(count < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: bool = True,
) -> DataFrame:
    """Train/test decontamination: remove (``keep=True``) or flag
    (``keep=False``) corpus docs sharing ≥ ``min_overlap`` distinct
    n-gram shingles with ANY benchmark document.

    n defaults to 8 — long enough that natural collisions are rare, short
    enough to catch verbatim benchmark leakage (the standard n-gram
    decontamination recipe used for LLM training sets).

    Plan shape: corpus shingles stay distributed; the benchmark shingle
    set is distinct-ed and BROADCAST, so the probe is map-side; only the
    per-doc overlap count aggregates (corpus-doc-keyed, combiner-friendly).
    """
    c_sh = corpus.select(
        F.col(id_col), F.explode(F.array_distinct(string_shingles(F.col(text_col), n))).alias("_sh")
    )
    b_sh = (
        benchmark.select(F.explode(string_shingles(F.col(text_col), n)).alias("_sh"))
        .distinct()
    )
    overlaps = (
        c_sh.join(F.broadcast(b_sh), "_sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )
    if keep:
        return corpus.join(overlaps, id_col, "left_anti")
    return corpus.join(overlaps, id_col, "left_semi")
