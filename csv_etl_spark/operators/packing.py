"""Sequence packing for LLM training-data pipelines.

``pack_sequences`` implements concat-and-chunk packing (the GPT-style
recipe: concatenate all documents in a deterministic order, slice the
token stream into fixed-budget training sequences, let documents straddle
sequence boundaries).  Each document's assignment is a pure function of
its global start offset, which is an exclusive prefix sum of token counts
over the document order — so the whole operator reduces to ONE exact
distributed prefix sum plus map-only arithmetic.

Scale design (the naive version is a single-partition window):

* ``with_global_cumsum`` range-shuffles on the order key (one shuffle —
  the minimum for a global order), computes each partition's LOCAL
  exclusive cumsum inside ``mapInPandas`` (Arrow-batched, running state
  carried across batches within a partition, zero additional shuffle),
  aggregates per-partition totals map-side (n_partitions rows — CLUSTER-
  sized, not data-sized), prefix-sums them on the driver, and broadcasts
  the offsets back.  No ``Window.orderBy`` without partitioning anywhere,
  so the plan audit's unpartitioned-window rule stays quiet by
  construction.
* The result is layout-independent: assignments depend only on the total
  order of the order key, never on partition boundaries.

Reference scope note: the reference engine has no packing operator; this
is part of the training-data extension family (SURVEY §2.9) alongside
dedup/text metrics, built from the public concat-and-chunk recipe.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructType

from ._cache import BoundedPersistCache
from .text import token_count

_CUMSUM_CACHE = BoundedPersistCache()


def with_global_cumsum(
    df: DataFrame,
    value_col: str,
    order_col: str | list[str],
    out_col: str = "cum_before",
) -> DataFrame:
    """EXCLUSIVE prefix sum of ``value_col`` over the global ``order_col``
    order, appended as ``out_col`` (long).  Exact, deterministic, and
    layout-independent — the order must be total (unique), or ties make
    the result depend on partitioning.  ``order_col`` may be a LIST of
    columns: the order is then the tuple order, which is how group-major
    orders should be spelled (a string concat of group+key is NOT
    prefix-safe — 'a' vs 'a|b' group values interleave because hex key
    chars sort below '|'; tuple ordering has no such seam).

    Plan shape: repartitionByRange(order cols) → sortWithinPartitions →
    local cumsum via mapInPandas → broadcast-join of driver-prefix-summed
    partition totals.  The only data-sized movement is the range shuffle;
    the driver materializes exactly one row per partition."""
    spark = df.sparkSession
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    # partition count pinned to the configured shuffle parallelism: an
    # un-numbered repartitionByRange is AQE-optimizable, and the r10
    # wide-initial-partitions session default (coalescePartitions.
    # initialPartitionNum = 8x) made this exchange start at 256 — the
    # range-boundary sampling, the per-partition Arrow batches and the
    # totals collect all scale with the count, which regressed every
    # prefix-sum consumer 2-3x at bench scale.  The cumsum wants exactly
    # "cluster parallelism" partitions (the driver materializes one
    # offset row per partition), which is what shuffle.partitions means.
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )

    # copy the field list: StructType shares the passed list and .add()
    # appends in place, which would corrupt part.schema itself
    out_schema = StructType(list(part.schema.fields)).add("_local_before", LongType())

    def local_cumsum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = 0
        for pdf in batches:
            v = pdf[value_col].to_numpy(dtype="int64", na_value=0)
            yield pdf.assign(_local_before=v.cumsum() - v + run)
            run += int(v.sum())

    local = part.mapInPandas(local_cumsum, schema=out_schema)
    # Persist the PYTHON OUTPUT, not the pre-Python range shuffle (r16):
    # the totals collect below plus every caller action re-ran the
    # mapInPandas pass when only `part` was cached (profiled: two ~6 s
    # 32-task Python stages per token_budget_select call at sf0.1).
    # Cached here, the Python pass runs exactly once per distinct input;
    # all consumers — the totals collect, callers' extra actions (e.g.
    # token_budget_select's group-offset build) and the returned plan —
    # read the materialized rows.  Registered in the bounded cache so
    # bench/long sessions can invalidate and nothing leaks unbounded.
    # key on the PRE-Python plan + the cumsum parameters (r17, ADVICE
    # r16): `local`'s semanticHash embeds the cloudpickled local_cumsum
    # closure, so any byte drift in the pickle across calls silently
    # missed the cache and re-ran the Python pass; `part`'s hash is
    # pickle-free and the (value_col, order_cols) tuple pins what the
    # closure computes.  The persisted VALUE stays the post-Python frame.
    key = _CUMSUM_CACHE.key_for(part, "cumsum", value_col, *order_cols)
    cached = _CUMSUM_CACHE.get(key)
    if cached is not None:
        local = cached
    else:
        local = local.persist()
        _CUMSUM_CACHE.put(key, local)

    # n_partitions rows — bounded by cluster parallelism, not data volume
    totals = {
        r["_pid"]: r["_t"]
        for r in local.groupBy("_pid")
        .agg(F.sum(F.col(value_col).cast("long")).alias("_t"))
        .collect()
    }
    running, offsets = 0, []
    for pid in sorted(totals):
        offsets.append((pid, running))
        running += int(totals[pid] or 0)
    # inline-VALUES LocalRelation (r16): the offsets frame is broadcast-
    # joined back; a createDataFrame Python RDD made every consumer's
    # broadcast build a 32-task Python stage (see csv_etl_spark.local)
    from csv_etl_spark.local import local_values_frame

    off_df = local_values_frame(
        spark, offsets or [(0, 0)], "_pid int, _poffset long"
    )
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, (F.col("_local_before") + F.col("_poffset")).cast("long"))
        .drop("_pid", "_local_before", "_poffset")
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents concatenated in
    ``id_col`` order, token stream sliced into ``budget``-token training
    sequences.  Returns one row per document:

    * ``n_tokens`` — whitespace token count (or ``tokens_col`` when the
      caller already tokenized);
    * ``seq_id`` — index of the sequence holding the doc's FIRST token;
    * ``seq_offset`` — the doc's position inside that sequence;
    * ``n_seqs`` — how many sequences the doc spans (>1 = split across
      boundaries, standard concat-and-chunk behavior; 0 for empty docs).

    All arithmetic is integer (``div``/``%`` on longs) so an external
    oracle reproduces it bit-exactly; the heavy lifting is the single
    distributed prefix sum in ``with_global_cumsum``."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    n_tokens = (
        F.col(tokens_col) if tokens_col is not None else token_count(F.col(text_col))
    ).cast("long")
    d = df.select(F.col(id_col), n_tokens.alias("n_tokens"))
    c = with_global_cumsum(d, "n_tokens", id_col, "_cum_before")
    return c.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.expr(f"_cum_before div {budget}").cast("long").alias("seq_id"),
        (F.col("_cum_before") % budget).cast("long").alias("seq_offset"),
        F.when(F.col("n_tokens") == 0, F.lit(0).cast("long"))
        .otherwise(
            (
                F.expr(f"(_cum_before + n_tokens - 1) div {budget}")
                - F.expr(f"_cum_before div {budget}")
                + 1
            ).cast("long")
        )
        .alias("n_seqs"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window token chunking — the standard pre-tokenization step
    that turns long documents into fixed-budget training windows:
    chunk ``c`` of a doc covers tokens ``[c·stride, c·stride +
    chunk_tokens)`` with ``stride = chunk_tokens - overlap``, so
    consecutive chunks share ``overlap`` tokens of context.  Chunk count
    per doc: 1 when ``n_tokens ≤ overlap`` (a doc always yields a chunk
    if it has any tokens), else ``ceil((n_tokens - overlap) / stride)`` —
    every chunk contributes at least one new token, no degenerate tail
    chunk fully contained in its predecessor.  Docs with zero tokens
    yield no rows.

    Returns ``(id_col, chunk_id, chunk_text, n_chunk_tokens)``.

    Scale shape: pure map — split → per-row sequence of chunk ids →
    posexplode → array slice/join.  No shuffle, no window, no state;
    output size is input tokens × (1 + overlap/stride)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    from .text import ws_tokens

    t = df.select(
        F.col(id_col),
        ws_tokens(F.col(text_col)).alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    n = F.col("_n")
    n_chunks = (
        F.when(n <= 0, F.lit(0))
        .when(n <= overlap, F.lit(1))
        .otherwise(F.ceil((n - F.lit(overlap)).cast("double") / F.lit(stride)))
        .cast("int")
    )
    # filter BEFORE sequence(): sequence(0, -1) would emit a descending
    # two-element array for zero-token docs, not an empty one
    exploded = t.withColumn("_nc", n_chunks).filter(F.col("_nc") > 0).select(
        F.col(id_col),
        "_toks",
        "_n",
        F.posexplode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("_", "chunk_id"),
    )
    chunk = F.slice(F.col("_toks"), F.col("chunk_id") * stride + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
    )


def shuffled_positions(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic GLOBAL corpus shuffle — assigns every row a unique
    0-based ``position`` in a pseudo-random but fully reproducible order
    (md5 of the id + salt; change ``salt`` for a fresh epoch
    permutation).  This is the training-order shuffle that must NOT be
    ``ORDER BY rand()`` (non-reproducible, breaks retries) and must NOT
    be a global ``row_number`` window (single-partition sort of the whole
    corpus).

    Scale shape: position = exclusive prefix sum of 1s over the md5
    order, i.e. ``with_global_cumsum`` — one range shuffle on the md5
    key, local cumsum in Arrow batches, driver sees one row per
    partition.  md5 is engine-portable (same parity trick as
    ``operators/sampling``), so an external system can reproduce the
    exact permutation.

    PRECONDITION: ``id_col`` values must be unique.  Duplicate ids hash
    to identical md5 keys, and ``with_global_cumsum`` makes tied-order
    results partitioning-dependent — the permutation is then valid but
    NOT reproducible across layouts.  (If duplicates must be tolerated,
    disambiguate first, e.g. ``row_number`` within the duplicate key or
    a composite id.)"""
    key = F.md5(F.concat_ws("|", F.col(id_col).cast("string"), F.lit(salt)))
    d = df.select(
        F.col(id_col),
        key.alias("_shuffle_key"),
        F.lit(1).cast("long").alias("_one"),
    )
    out = with_global_cumsum(d, "_one", "_shuffle_key", out_col="position")
    return out.select(F.col(id_col), F.col("position"))
