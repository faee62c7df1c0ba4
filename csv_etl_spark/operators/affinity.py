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
generates pairs MAP-SIDE from the array — in a vectorized Arrow kernel
for numpy-representable item types (r11: the builtin
``transform``/``slice`` spelling is CodegenFallback and its interpreted
per-element cost was the measured α=1.08 at 60M lineitems; the kernel
re-measures at α≈0.90), HOF fallback otherwise — no join, no sort, and
the whole pipeline is two shuffles total (basket key, then the
map-side-combinable pair-count key).

Fan-out is still guarded: one 100k-item basket alone would emit 5×10⁹
pairs, so baskets above ``max_basket`` distinct items are either dropped
(default — a mega-basket is almost always a data bug) or the call
refuses loudly BEFORE any pair is generated; silent truncation is the
one thing this module never does.  The optional top-k is a global
TakeOrderedAndProject (k rows to the driver, no full sort)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# element types the Arrow pair kernel handles (numpy-representable);
# anything else falls back to the HOF spelling
_ARROW_ITEM_TYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "string", "boolean", "date",
}

# upper bound on pair rows per DataFrame yielded by the Arrow kernel:
# with max_basket=1000 a single basket is C(1000,2)≈500k pairs and a
# 10k-row Arrow batch could otherwise materialize billions of rows in
# the Python worker before the first yield (r11 ADVICE).  2M rows of
# two skinny columns is tens of MB — bounded regardless of basket mix.
_PAIR_ROW_BUDGET = 2_000_000

# NOTE (r12, measured refutation of the r11 ADVICE "persist the basket
# agg around the freq_cap hot-set probe"): persisting `kept` made
# copurchase_capped SLOWER at every size — sf0.1 2.50→4.79 s, 6M
# 5.32→13.03 s, 60M 32.1→43.5 s (BENCHNOTES_r12_lineitem.json A/B) —
# because materializing the array-typed basket column into the block
# manager costs more than the second aggregation pass it saves: the
# hot-count branch prunes to the exploded items only, while a persist
# must serialize the full arrays.  The double computation is the
# measured-faster plan; the basket agg stays unpersisted by choice
# (r17: with both consumers in ONE lazy plan, runtime exchange reuse
# now dedups the basket shuffle anyway).


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int = 1000,
    on_oversize: str = "drop",
    freq_cap: int | None = None,
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

    ``freq_cap`` (the ``dedup_jaccard_capped`` discipline applied to
    baskets, r10 verdict ask #1): items appearing in MORE than
    ``freq_cap`` baskets are dropped from pair generation entirely —
    the documented-bias hot-item control.  A single item in 1M baskets
    pairs with everything and contributes 1M × (b−1) pair rows while
    carrying no co-occurrence signal (its support with everything is
    just its own frequency); on skewed real-world baskets this is the
    difference between a bounded pair table and a blowup.  Cost when
    set (r17 — lazy at every hot-set size): one extra item-keyed count
    agg and a left_anti join + basket re-agg, all inside the one lazy
    plan — AQE broadcasts the hot side when it is small, and at catalog
    scale (the 600M-line decade, where freq_cap=40 over a 20M-part
    catalog flags ~3% of items) the same spelling degrades gracefully
    to a shuffled anti-join; nothing is ever collected to the driver.
    The basket aggregation is recomputed by the pair query rather than
    persisted: the r12 A/B measured the persist slower at every size
    (module-level note).  ``None`` (default) keeps the exact semantics,
    which is what the SQL oracle checks.

    Plan: one groupBy on the basket key collapsing each basket to a
    sorted distinct-item array (``collect_set`` dedups in the partial
    aggregate, map-side) → size guard on the array → map-side pair
    generation (C(b,2) rows per basket, bounded by the guard at
    C(max_basket, 2); ``item_a < item_b`` falls out of the sort order
    for free) → one map-side-combinable count agg → support filter.
    One shuffle on the basket key + one on the pair key; no join, no
    sort, nothing unbounded driver-side.

    Pair generation runs in an Arrow ``mapInPandas`` kernel for
    numpy-representable item types: the builtin
    ``transform``/``slice``/``flatten`` spelling is CodegenFallback —
    every lambda is interpreted per element with boxed rows — and at
    the 60M-lineitem decade (122M pairs) the interpreted HOF chain
    measured 85.6 s vs 43.8 s for the kernel, with the nested
    posexplode-slice spelling worse still (117.6 s); the r10 ladder's
    α=1.08 super-linearity was this interpreter overhead compounding
    with GC pressure, and the kernel's re-measured ladder is α≈0.90.
    The kernel is exact (same sorted-array order, same pairs — the
    batch is vectorized ``triu_indices`` gathers grouped by basket
    size) and exotic element types fall back to the HOF spelling."""
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

    item_t = df.schema[item_col].dataType.simpleString()

    if freq_cap is not None:
        # r17 (guide §2.4/§5): hot-item removal is LAZY and fully
        # distributed at EVERY hot-set size — explode the kept baskets
        # once, count baskets per item (arrays are already distinct per
        # basket, so explode counts baskets), drop over-cap items with a
        # left_anti join (AQE broadcasts the hot side when it is small),
        # and re-aggregate the surviving items.  The r12–r16 spelling
        # probed the hot set EAGERLY at plan-construction time — its
        # ``hot.limit(N+1).collect()`` ran a CollectLimit retry ladder of
        # 3–4 driver round-trip jobs, each re-running the whole basket
        # aggregation as an independent action — and then masked arrays
        # inside the Arrow kernel with np.isin.  Profiled at sf0.1 the
        # probe cost MORE task-time than the pair query itself (51 s vs
        # 13 s, plans/r17/copurchase_capped_before.txt + commit profile).
        # One lazy plan lets runtime exchange reuse dedup the basket
        # shuffle, leaves nothing driver-side, and is exactly the
        # spelling the old code already switched to past its
        # 100k-row driver-collect bound — that bound, the collect, and
        # the kernel-mask fast path all disappear, and freq_cap no
        # longer requires a numpy-representable item type.
        # (The basket agg is still deliberately NOT persisted across the
        # two consumers: measured slower at every size — module note.)
        hot = (
            kept.select(F.explode("_items").alias("_it"))
            .groupBy("_it")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > F.lit(int(freq_cap)))
            .select("_it")
        )
        kept = (
            kept.select("_bk", F.explode("_items").alias("_it"))
            .join(hot, "_it", "left_anti")
            .groupBy("_bk")
            .agg(F.sort_array(F.collect_set("_it")).alias("_items"))
        )

    if item_t in _ARROW_ITEM_TYPES:
        pairs = _arrow_pairs(kept.select("_items"), item_t)
    else:
        # exotic element types: the original HOF spelling (interpreted,
        # fine at the cardinalities non-atomic items occur at)
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


def _arrow_pairs(baskets: DataFrame, item_t: str) -> DataFrame:
    """Vectorized C(b,2) pair expansion over sorted distinct-item
    arrays: baskets are grouped by size inside each Arrow batch, each
    size group becomes an (n_baskets, size) matrix, and one
    ``triu_indices`` gather emits every (item_a, item_b) with the
    array order (item_a < item_b) preserved.  Map-only: the one input
    column is the item array; skinny pair rows come back.  (freq_cap's
    hot items are removed upstream by the distributed left_anti spelling
    since r17 — the kernel no longer carries an np.isin mask.)

    Output is yielded in chunks of at most ``_PAIR_ROW_BUDGET`` pair
    rows: expansion fan-out is C(b,2) per basket, so one Arrow batch of
    large baskets could otherwise hold billions of pairs in worker
    memory before a single yield (r11 ADVICE).  Each size group is
    split so even a lone C(max_basket,2) basket stays within budget."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            arrs = pdf["_items"].to_numpy()
            if not len(arrs):
                continue
            sizes = np.fromiter(
                (len(a) for a in arrs), dtype=np.int64, count=len(arrs)
            )
            if not sizes.sum():
                continue
            flat = np.concatenate([np.asarray(a) for a in arrs])
            starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
            for s in np.unique(sizes):
                if s < 2:
                    continue
                sel = np.nonzero(sizes == s)[0]
                iu0, iu1 = np.triu_indices(int(s), 1)
                per_basket = len(iu0)  # C(s, 2)
                # baskets per chunk so each yielded frame holds at most
                # _PAIR_ROW_BUDGET pairs (≥1 so a single huge basket
                # still yields — its C(s,2) is bounded by the caller's
                # max_basket guard)
                step = max(1, _PAIR_ROW_BUDGET // per_basket)
                for off in range(0, len(sel), step):
                    chunk = sel[off : off + step]
                    mat = flat[starts[chunk, None] + np.arange(s)[None, :]]
                    yield pd.DataFrame(
                        {
                            "item_a": mat[:, iu0].ravel(),
                            "item_b": mat[:, iu1].ravel(),
                        }
                    )

    return baskets.mapInPandas(gen, f"item_a {item_t}, item_b {item_t}")


def top_cooccurrence(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    top_k: int = 20,
    min_support: int = 2,
    max_basket: int = 1000,
    freq_cap: int | None = None,
) -> DataFrame:
    """The ``top_k`` strongest co-occurring pairs, deterministically
    tie-broken by (pair_count DESC, item_a, item_b) so the result is
    stable across engines and partitionings.  ``orderBy().limit(k)``
    compiles to TakeOrderedAndProject — each task keeps a k-row heap and
    the driver merges k rows per partition; the full pair table is never
    globally sorted."""
    counted = cooccurrence_pairs(
        df, basket_col, item_col, min_support=min_support,
        max_basket=max_basket, freq_cap=freq_cap,
    )
    return counted.orderBy(
        F.col("pair_count").desc(), F.col("item_a"), F.col("item_b")
    ).limit(int(top_k))
