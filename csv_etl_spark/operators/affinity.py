"""Co-occurrence / market-basket affinity — which items appear together
inside a grouping unit (parts within an order, tokens within a document,
domains within a crawl session).  The pairwise-support table is the
first stage of every association-rule / recommendation pipeline
(Agrawal & Srikant's Apriori counts exactly these 2-itemsets first) and,
in a training-data context, the "documents that cite both X and Y"
signal used for topic balancing.

Scale shape: the naive formulation is a basket-keyed self-join, but on
short-basket data (TPC-H orders hold ≤7 lineitems) that pays two full
sort-merge sides for a fan-out of at most C(7,2)=21 rows per basket —
measured mildly SUPER-linear (α=1.09/decade) at 60M lineitems because
the sort cost is n·log n while the useful work is linear (r9 scale
matrix, bench_records/BENCHNOTES_r9_sf1.json).  So the operator instead
aggregates each basket to a sorted distinct-item array (ONE shuffle on
the basket key, ObjectHashAggregate with map-side partials) and
generates pairs MAP-SIDE from the array with ``transform``/``slice`` —
no join, no sort, and the whole pipeline is two shuffles total (basket
key, then the map-side-combinable pair-count key).

Fan-out is still guarded: one 100k-item basket alone would emit 5×10⁹
pairs, so baskets above ``max_basket`` distinct items are either dropped
(default — a mega-basket is almost always a data bug) or the call
refuses loudly BEFORE any pair is generated; silent truncation is the
one thing this module never does.  The optional top-k is a global
TakeOrderedAndProject (k rows to the driver, no full sort)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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

    Plan: one groupBy on the basket key collapsing each basket to a
    sorted distinct-item array (``collect_set`` dedups in the partial
    aggregate, map-side) → size guard on the array → map-side pair
    generation with ``transform``/``slice`` over the sorted array
    (C(b,2) rows per basket, bounded by the guard at C(max_basket, 2);
    ``item_a < item_b`` falls out of the sort order for free) → one
    map-side-combinable count agg → support filter.  One shuffle on the
    basket key + one on the pair key; no join, no sort, nothing
    driver-side."""
    if on_oversize not in ("drop", "raise"):
        raise ValueError("on_oversize must be 'drop' or 'raise'")
    baskets = (
        df.select(
            F.col(basket_col).alias("_bk"), F.col(item_col).alias("_it")
        )
        .filter(F.col("_bk").isNotNull() & F.col("_it").isNotNull())
        .groupBy("_bk")
        .agg(F.sort_array(F.collect_set("_it")).alias("_items"))
    )
    bn = F.size(F.col("_items"))
    if on_oversize == "raise":
        guard = F.assert_true(
            bn <= F.lit(int(max_basket)),
            F.concat(
                F.lit(f"cooccurrence_pairs: basket over max_basket={max_basket}: "),
                F.col("_bk").cast("string"),
            ),
        )
        # the established guard idiom (stats.py): coalesce(assert, value)
        # keeps the assert riding the consumed expression so pruning
        # can't silence it
        bn = F.coalesce(guard.cast("int"), bn)
    kept = baskets.filter(bn <= F.lit(int(max_basket)))
    pairs = kept.select(
        F.explode(
            F.expr(
                "flatten(transform(_items, (x, i) -> "
                "transform(slice(_items, i + 2, size(_items) - i - 1), "
                "y -> struct(x AS item_a, y AS item_b))))"
            )
        ).alias("_p")
    ).select("_p.item_a", "_p.item_b")
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
