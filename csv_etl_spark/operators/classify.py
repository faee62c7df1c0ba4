"""Learned corpus-quality classification — the fastText/NBSVM-style
linear gate (hashed n-gram features, closed-form Naive-Bayes log-odds
weights) that the public CCNet / RedPajama / LLaMA curation recipes put
beside the heuristic Gopher rules: bootstrap labels from a seed (a
heuristic gate, or a known-good reference corpus), train a cheap linear
model, score EVERY document with it.

Why closed-form NB log-odds instead of iterative logistic regression:
the weights are a pure aggregation over (feature, class) counts — one
groupBy, no driver-side optimization loop, bit-for-bit deterministic,
and (unlike SGD) expressible in single-pass SQL, so the whole
train→score pipeline carries a DuckDB oracle.  NB log-odds features are
the "NBSVM" trick (Wang & Manning 2012) and are what fastText's linear
classifier converges toward on binarized bag-of-words features.

Scale shape (100 TB corpus, bounded model):

* feature hashing (Weinberger et al. 2009): tokens hash into
  ``n_features`` buckets via the engine-portable md5-top-32-bits idiom
  (sampling.key_uniform's cousin), so the weight table is BOUNDED at
  ``n_features`` rows regardless of vocabulary — always broadcastable;
* per-doc features are BINARIZED (distinct buckets per doc) — partial
  map-side distinct, then one (feature)-keyed count groupBy whose output
  is model-sized;
* scoring is a broadcast join of the weight table onto the (doc,
  feature) pairs + one doc_id-keyed sum groupBy (high-cardinality key,
  no skew);
* the (doc, feature) pair table feeds BOTH the count agg and the
  scoring join — multi-consumer, so it rides the shared persist cache
  (``_FEAT_CACHE``; registered in bench.py's clear list like every
  other BoundedPersistCache).

Engine-parity discipline: per-feature weights are ln-ratios ROUNDED to 6
decimals before any sum, then summed as exact decimal micro-units (the
dsir_importance rule) so partial-aggregation order cannot leak into the
value hash.

Reference parity note: the reference engine (csv-etl) has no learned
classifier — this is part of the mandated LLM-training-data extension
surface, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._cache import BoundedPersistCache
from .text import ws_tokens

_FEAT_CACHE = BoundedPersistCache(max_entries=4)

_MICRO = 1_000_000


def hashed_feature(tok: Column, n_features: int) -> Column:
    """Engine-portable hashing-trick bucket: md5 top 32 bits mod
    ``n_features`` (DuckDB: ``CAST('0x' || substring(md5(tok), 1, 8) AS
    BIGINT) % n_features``).  Collisions are the documented trade of the
    hashing trick — both engines collide identically."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("bigint")
        % F.lit(int(n_features))
    )


def doc_features(
    df: DataFrame,
    n_features: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Binarized hashed-unigram features: one (id, feature) row per
    DISTINCT bucket per doc.  Map + partial distinct; the only shuffle is
    the distinct's (id, feature)-keyed exchange."""
    toks = ws_tokens(F.col(text_col))
    if lowercase:
        toks = F.transform(toks, lambda t: F.lower(t))
    return (
        df.select(F.col(id_col), F.explode(toks).alias("_tok"))
        .select(F.col(id_col), hashed_feature(F.col("_tok"), n_features).alias("feature"))
        .distinct()
    )


def train_quality_weights(
    features: DataFrame,
    labels: DataFrame,
    n_features: int,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    label_col: str = "label",
) -> DataFrame:
    """Closed-form NB log-odds weights from binarized features:

        w_f = ln((c⁺_f + α) / (T⁺ + αD)) − ln((c⁻_f + α) / (T⁻ + αD))

    where c±_f counts docs of each class containing feature f, T± are the
    class totals of those incidence counts, D = ``n_features``, α the
    add-α smoother.  Returns the MODEL: ``(feature, weight)``, ≤ D rows —
    broadcastable by construction.  Rounded to 6 decimals (ulp
    discipline).  One inner join (labels are doc-keyed) + one
    feature-keyed groupBy + one scalar agg."""
    lab = labels.select(F.col(id_col), F.col(label_col).alias("_y"))
    pairs = features.join(lab, id_col)
    counts = pairs.groupBy("feature").agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("_cpos"),
        F.sum(F.when(F.col("_y"), 0).otherwise(1)).alias("_cneg"),
    )
    totals = counts.agg(
        F.coalesce(F.sum("_cpos"), F.lit(0)).cast("double").alias("_tpos"),
        F.coalesce(F.sum("_cneg"), F.lit(0)).cast("double").alias("_tneg"),
    )
    a = F.lit(float(alpha))
    d = F.lit(float(n_features))
    return counts.crossJoin(F.broadcast(totals)).select(
        F.col("feature"),
        F.round(
            F.log((F.col("_cpos") + a) / (F.col("_tpos") + a * d))
            - F.log((F.col("_cneg") + a) / (F.col("_tneg") + a * d)),
            6,
        ).alias("weight"),
    )


def class_prior_bias(alpha: float = 0.5, label_col: str = "label") -> Column:
    """ln((n⁺ + α)/(n⁻ + α)) as a 1-row aggregate Column (use inside an
    ``agg``); α keeps a single-class label set finite."""
    a = F.lit(float(alpha))
    npos = F.sum(F.when(F.col(label_col), 1).otherwise(0))
    nneg = F.sum(F.when(F.col(label_col), 0).otherwise(1))
    return F.round(F.log((npos + a) / (nneg + a)), 6)


def score_quality(
    df: DataFrame,
    features: DataFrame,
    weights: DataFrame,
    bias: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every doc: ``score = bias + Σ_{f ∈ doc} w_f`` (decimal
    micro-unit sum of the pre-rounded weights), ``predicted = score >
    0``.  ``bias`` is a 1-row DataFrame with column ``bias`` (broadcast).
    Docs with no features (empty text) score the bare bias.  Plan:
    broadcast model join + doc-keyed sum + left join back onto the doc
    spine — no full-table window, no driver loop."""
    scored = (
        features.join(F.broadcast(weights), "feature")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_features"),
            F.sum((F.col("weight") * _MICRO).cast("decimal(38,0)")).alias("_w6"),
        )
    )
    out = (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .crossJoin(F.broadcast(bias.select(F.col("bias"))))
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_features"), F.lit(0).cast("bigint")).alias(
                "n_features"
            ),
            F.round(
                F.col("bias")
                + F.coalesce(
                    F.col("_w6").cast("double") / F.lit(float(_MICRO)), F.lit(0.0)
                ),
                6,
            ).alias("score"),
        )
    )
    return out.select(
        id_col, "n_features", "score", (F.col("score") > 0).alias("predicted")
    )


def quality_classifier(
    df: DataFrame,
    labels: DataFrame,
    n_features: int = 4096,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "label",
    lowercase: bool = True,
) -> DataFrame:
    """End-to-end train→score: bootstrap-labelled corpus in, per-doc
    ``(id, n_features, score, predicted)`` out.  The (doc, feature) pair
    table is consumed by training AND scoring — persisted via the shared
    cache (the multi-consumer rule)."""
    feats = doc_features(
        df, n_features, text_col=text_col, id_col=id_col, lowercase=lowercase
    )
    feats = _FEAT_CACHE.get_or_persist(feats, "doc_features", n_features)
    # labels feed the training join AND the bias aggregate; when they are
    # themselves a computed gate (the Gopher bootstrap), each branch would
    # re-run it — persist the tiny (id, bool) frame (multi-consumer rule)
    labels = _FEAT_CACHE.get_or_persist(labels, "labels")
    weights = train_quality_weights(
        feats, labels, n_features, alpha=alpha, id_col=id_col, label_col=label_col
    )
    bias = labels.agg(class_prior_bias(alpha, label_col).alias("bias"))
    return score_quality(df, feats, weights, bias, id_col=id_col)
