"""Streaming crawl-ingest: the URL-hygiene + quality + incremental-dedup
composition (``web_curation``'s streaming twin) running continuously via
``foreachBatch`` against an ACCUMULATING curated corpus.

Per micro-batch (a crawl increment), in the order every public web
pipeline (C4, RefinedWeb) applies them — cheapest gate first:

1. ``domain_blocklist_filter`` — broadcast anti-join on the registered
   domain (optionally PSL-table-backed), before any text is touched;
2. ``normalize_url`` — canonical ``url_norm`` for downstream URL-level
   analytics (pure map expressions);
3. ``gopher_quality`` gate — map-only heuristics, keep==true survives;
4. ``incremental_dedup(bloom=...)`` — the batch is deduped against the
   corpus accumulated by ALL PREVIOUS batches and within itself, exact
   semantics with the Bloom pre-filter skipping the anti-join for the
   mostly-new majority;
5. survivors append to the corpus directory as their own
   ``batch_id=<id>`` partition (overwrite-by-partition — foreachBatch is
   at-least-once, so a retried batch replaces itself instead of
   duplicating; the ``gated_stream_writer`` idempotency discipline).

The corpus directory is both the SINK and the next batch's dedup
REFERENCE — that self-reference is what makes the stream a curation
loop rather than a stateless map, and it is why this lives in
``foreachBatch``: Structured Streaming's own stateful operators cannot
read their sink back, while batch code inside foreachBatch can.

Scale shape per batch: blocklist + URL + quality are map-only over the
increment; the dedup shuffles the INCREMENT's 8-byte keys (never the
corpus text — the corpus side streams once into the Bloom bitmap /
key-distinct).  The corpus re-scan per batch is the documented cost of
exactness; at 100 TB the corpus key table would be maintained as its own
incrementally-appended parquet (keys only, 8 bytes/doc) rather than
re-derived from full documents — same operator, smaller input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csv_etl_spark.operators.dedup import incremental_dedup
from csv_etl_spark.operators.text import gopher_quality
from csv_etl_spark.operators.urls import (
    TRACKING_PARAMS,
    domain_blocklist_filter,
    normalize_url,
)


def crawl_ingest_stream(
    stream: DataFrame,
    blocked: DataFrame,
    corpus_dir: str,
    checkpoint_dir: str,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    min_stopword_hits: int = 1,
    bloom: bool = True,
    psl: DataFrame | None = None,
    tracking_params: str = TRACKING_PARAMS,
):
    """Start the crawl-ingest stream; returns the StreamingQuery (caller
    awaits/stops).  The curated corpus lands under ``corpus_dir`` as
    ``batch_id=<id>`` partitions of ``(id_col, url_norm, text_col)``."""
    spark = stream.sparkSession

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        survivors = curate_increment(
            batch_df,
            blocked,
            corpus=_read_corpus(spark, corpus_dir, id_col, text_col),
            url_col=url_col,
            text_col=text_col,
            id_col=id_col,
            min_words=min_words,
            min_stopword_hits=min_stopword_hits,
            bloom=bloom,
            psl=psl,
            tracking_params=tracking_params,
        )
        survivors.write.mode("overwrite").parquet(
            f"{corpus_dir}/batch_id={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def curate_increment(
    batch: DataFrame,
    blocked: DataFrame,
    corpus: DataFrame | None,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    min_stopword_hits: int = 1,
    bloom: bool = True,
    psl: DataFrame | None = None,
    tracking_params: str = TRACKING_PARAMS,
) -> DataFrame:
    """One increment through the full curation chain — plain batch code,
    shared verbatim by the stream (via foreachBatch) and its batch twin
    (the test discipline: stream vs sequential-batch equality needs ONE
    implementation, not two).  ``corpus=None`` means nothing curated yet.
    Returns the surviving ``(id_col, url_norm, text_col)`` rows."""
    b = domain_blocklist_filter(batch, url_col, blocked, psl=psl)
    b = b.withColumn(
        "url_norm", normalize_url(F.col(url_col), tracking_params)
    ).select(id_col, "url_norm", text_col)
    kept_ids = (
        gopher_quality(
            b,
            min_words=min_words,
            min_stopword_hits=min_stopword_hits,
            text_col=text_col,
            id_col=id_col,
        )
        .filter(F.col("keep"))
        .select(id_col)
    )
    kept = b.join(kept_ids, id_col)
    if corpus is None:
        corpus = batch.sparkSession.createDataFrame(
            [], f"{id_col} bigint, {text_col} string"
        )
        use_bloom = False  # nothing to pre-filter against
    else:
        use_bloom = bloom
    winners = incremental_dedup(
        kept, corpus, text_col=text_col, id_col=id_col, bloom=use_bloom
    )
    return kept.join(winners.select(id_col), id_col).select(
        id_col, "url_norm", text_col
    )


def _read_corpus(spark, corpus_dir: str, id_col: str, text_col: str):
    """The corpus accumulated so far, or None before the first batch.

    Reads the ``batch_id=*`` partitions as an EXPLICIT path list rather
    than the directory root: a root-path read of a growing directory
    keeps the same semanticHash across batches, so the incremental-dedup
    session cache (keyed on semanticHash — operators/_cache.py documents
    exactly this append-invisibility hazard) would serve batch N the
    corpus keys persisted at batch N-1 and silently re-admit duplicates.
    A distinct path set per batch gives a distinct plan, so the cache
    hits only when the corpus is genuinely unchanged (e.g. an
    at-least-once retry of the same batch — where the reuse is correct).
    Uses the Hadoop FileSystem API so any fs scheme works."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(corpus_dir)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return None
    parts = sorted(
        str(st.getPath())
        for st in fs.listStatus(hpath)
        if st.isDirectory() and st.getPath().getName().startswith("batch_id=")
    )
    if not parts:
        return None
    return spark.read.parquet(*parts).select(id_col, text_col)
