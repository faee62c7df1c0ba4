"""Co-occurrence / market-basket affinity — which items appear together
inside a grouping unit (parts within an order, tokens within a document,
domains within a crawl session).  The pairwise-support table is the
first stage of every association-rule / recommendation pipeline
(Agrawal & Srikant's Apriori counts exactly these 2-itemsets first) and,
in a training-data context, the "documents that cite both X and Y"
signal used for topic balancing.

Scale shape: the naive formulation is a basket-keyed self-join, which is
fine EXCEPT for pathological baskets — one 100k-item basket alone emits
5×10⁹ pairs.  So the operator is fan-out-guarded the same way
interval_overlap_join is: basket sizes are counted first (one map-side
combinable aggregate), baskets above ``max_basket`` are either dropped
(default, with the drop count available via the returned frame's
companion) or the call refuses loudly — silent truncation is the one
thing this module never does.  Surviving baskets feed ONE
basket-co-partitioned equijoin (never a cross join); pair counting is a
map-side-combinable groupBy on the (item_a, item_b) key; the optional
top-k is a global TakeOrderedAndProject (k rows to the driver, no full
sort)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._cache import BoundedPersistCache

# (basket, item) distinct pairs are consumed by 2+ branches (size agg +
# eligibility join; then BOTH sides of the pair self-join) — without the
# persist cache the input scan and distinct shuffle re-execute per
# consumer (the repo's multi-consumer rule).  Registered in bench.py's
# and scripts/scale_bench.py's clear lists like every instance.
_BASKET_CACHE = BoundedPersistCache(max_entries=4)


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int = 1000,
    on_oversize: str = "drop",
) -> DataFrame:
    """Pairs of distinct items that co-occur in at least ``min_support``
    baskets → ``(item_a, item_b, pair_count)`` with ``item_a < item_b``
    (each unordered pair counted once per basket, duplicate items within
    a basket collapsed first).

    ``on_oversize``: ``"drop"`` excludes baskets with more than
    ``max_basket`` distinct items from counting (the standard streaming-
    basket hygiene — a mega-basket is almost always a data bug and would
    dominate both runtime and counts); ``"raise"`` makes any oversize
    basket a loud failure (assert_true riding the size frame, so the
    check cannot be pruned away).

    Plan: distinct (basket, item) → basket-size agg (n_baskets rows,
    map-side combined) → size filter joined back on the basket key →
    self-equijoin on basket with ``item_a < item_b`` (C(b,2) fan-out per
    basket, bounded by the guard at C(max_basket, 2)) → one
    map-side-combinable count agg → support filter.  Two shuffles on the
    basket key + one on the pair key; nothing driver-side."""
    if on_oversize not in ("drop", "raise"):
        raise ValueError("on_oversize must be 'drop' or 'raise'")
    bi = (
        df.select(
            F.col(basket_col).alias("_bk"), F.col(item_col).alias("_it")
        )
        .filter(F.col("_bk").isNotNull() & F.col("_it").isNotNull())
        .distinct()
    )
    bi = _BASKET_CACHE.get_or_persist(bi, "basket_items")
    sizes = bi.groupBy("_bk").agg(F.count(F.lit(1)).alias("_bn"))
    if on_oversize == "raise":
        guard = F.assert_true(
            F.col("_bn") <= F.lit(int(max_basket)),
            F.concat(
                F.lit(f"cooccurrence_pairs: basket over max_basket={max_basket}: "),
                F.col("_bk").cast("string"),
            ),
        )
        # the established guard idiom (stats.py): coalesce(assert, value)
        # keeps the assert riding the consumed column so pruning can't
        # silence it
        sizes = sizes.withColumn("_bn", F.coalesce(guard.cast("long"), F.col("_bn")))
    kept = sizes.filter(F.col("_bn") <= F.lit(int(max_basket))).select("_bk")
    eligible = _BASKET_CACHE.get_or_persist(
        bi.join(kept, "_bk"), "eligible", int(max_basket), on_oversize
    )
    a = eligible.select(F.col("_bk"), F.col("_it").alias("item_a"))
    b = eligible.select(F.col("_bk"), F.col("_it").alias("item_b"))
    pairs = a.join(b, "_bk").filter(F.col("item_a") < F.col("item_b"))
    counted = pairs.groupBy("item_a", "item_b").agg(
        F.count(F.lit(1)).alias("pair_count")
    )
    return counted.filter(F.col("pair_count") >= F.lit(int(min_support)))


def top_cooccurrence(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    top_k: int = 20,
    min_support: int = 2,
    max_basket: int = 1000,
) -> DataFrame:
    """The ``top_k`` strongest co-occurring pairs, deterministically
    tie-broken by (pair_count DESC, item_a, item_b) so the result is
    stable across engines and partitionings.  ``orderBy().limit(k)``
    compiles to TakeOrderedAndProject — each task keeps a k-row heap and
    the driver merges k rows per partition; the full pair table is never
    globally sorted."""
    counted = cooccurrence_pairs(
        df, basket_col, item_col, min_support=min_support, max_basket=max_basket
    )
    return counted.orderBy(
        F.col("pair_count").desc(), F.col("item_a"), F.col("item_b")
    ).limit(int(top_k))
