"""Link-graph analytics — PageRank-style centrality over an edge table.

Why in a training-data engine: crawl-frontier prioritization ranks
domains by link centrality before fetching (Common Crawl publishes
exactly such a harmonic-centrality ranking of its web graph), and
link-based quality signals feed corpus curation the same way the text
quality gates do.  The operator is deliberately the SIMPLIFIED power
iteration (fixed iteration count, dangling mass not redistributed —
Page et al. 1999's recurrence without the dangling patch), which keeps
every step a plain join + aggregate that any SQL engine can replay.

Engine-parity discipline: per-node contributions are quantized
(round to 8 digits → DECIMAL(38,8)) before summation so the aggregate
is order-independent — the same quantize→decimal-sum convention the
stats operators use — and each iteration's ranks are rounded to
``round_digits``.  Two engines running the same edge table therefore
produce bit-identical ranks.

Scale shape: the link table (src, dst, out-degree) is materialized ONCE,
hash-partitioned on ``src`` and persisted (it is consumed by every
iteration); each iteration is a SHUFFLE_HASH equijoin that streams the
stationary link partitions against the hashed n_nodes-row rank frame —
only the rank frame moves, the edge table is never exchanged or sorted
again (r11: the sort-merge spelling re-sorted 60M links per iteration)
— plus one map-side-combinable sum keyed on ``dst``.  Rank frames are
n_nodes rows — never joined wider than the edge table.  No
driver-side collect anywhere; the node count rides a broadcast
one-row aggregate.  Lineage grows linearly in ``iters`` (small fixed
counts — 3-10 — are the intended regime).  Each iteration's rank frame
is ``localCheckpoint``-ed (the ``dedup.resolve_duplicate_clusters``
pattern): without it the plan for iteration t contains iterations
1..t-1, so analysis/codegen cost grows per iteration and the measured
per-decade exponent went super-linear (α=1.096 at the 60M-row decade,
BENCHNOTES_r9_late) even though the data-side work is linear in edges.
Checkpointing makes every iteration start from a materialized
n_nodes-row frame with constant-size plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._cache import BoundedPersistCache

# the (src, dst, outdeg) link table is re-read by every power iteration
# (iters consumers): per the repo's multi-consumer rule it must be
# persisted or the edge scan + degree agg recompute per iteration.
# Registered in bench.py's and scripts/scale_bench.py's clear lists.
_LINKS_CACHE = BoundedPersistCache(max_entries=4)


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Fixed-``iters`` PageRank power iteration over a directed edge
    table (parallel edges collapse to one).  Returns one row per node:
    ``(node_id, pagerank)``.

    Recurrence (simplified, no dangling-mass redistribution — a node
    with no out-edges leaks its mass, the standard simplification when
    ranks are used ordinally for prioritization)::

        pr_0(v)   = 1 / N
        pr_t+1(v) = (1 - d) / N + d * Σ_{(u,v) ∈ E} pr_t(u) / outdeg(u)

    with every contribution quantized to DECIMAL(38,8) before the sum
    (order-independent across engines / partitionings) and every rank
    rounded to ``round_digits``.  Nodes are the union of both edge
    endpoints; isolated ranks converge to (1-d)/N."""
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # persist PRE-PARTITIONED on src (r10 verdict ask #2): the cached
    # frame's HashPartitioning survives into every iteration's join, so
    # the 60M-row link table never moves again — each of the ``iters``
    # joins exchanges only the n_nodes-row rank frame.  The explicit
    # repartition (rather than relying on the e⋈deg join's output
    # partitioning) pins the property regardless of upstream strategy.
    links = _LINKS_CACHE.get_or_persist(
        e.join(deg, "src").repartition("src"), "pagerank_links"
    )
    # nodes derives from the PERSISTED link table (every edge's src is in
    # deg by construction, so links ≡ e + outdeg) and is itself persisted:
    # it feeds the init frame plus every iteration's left join — without
    # the cache each iteration re-runs the raw edge scan + distinct
    # (observed as lineitem×36 dup scans in the r9 plan audit)
    nodes = _LINKS_CACHE.get_or_persist(
        links.select(F.col("src").alias("node_id"))
        .unionByName(links.select(F.col("dst").alias("node_id")))
        .distinct(),
        "pagerank_nodes",
    )
    n_frame = nodes.agg(F.count(F.lit(1)).alias("_n"))
    pr = nodes.crossJoin(F.broadcast(n_frame)).select(
        "node_id",
        F.round(F.lit(1.0) / F.col("_n"), round_digits).alias("pagerank"),
    )
    d = float(damping)
    n_iters = int(iters)
    for i in range(n_iters):
        # SHUFFLE_HASH on the rank side: links (persisted, partitioned
        # on src) streams with ZERO exchange and ZERO sort; the small
        # rank frame is exchanged + hashed.  Without the hint Spark
        # picks sort-merge and re-sorts the 60M-row links side every
        # iteration even when its partitioning is reusable.  Build-side
        # memory is n_nodes / shuffle.partitions rows per task.
        contribs = (
            links.join(pr.hint("shuffle_hash"), links["src"] == pr["node_id"])
            .select(
                F.col("dst").alias("node_id"),
                F.round(F.col("pagerank") / F.col("outdeg"), 8)
                .cast("decimal(38,8)")
                .alias("_c"),
            )
            .groupBy("node_id")
            .agg(F.sum("_c").cast("double").alias("_in"))
        )
        pr = (
            nodes.join(contribs.hint("shuffle_hash"), "node_id", "left")
            .crossJoin(F.broadcast(n_frame))
            .select(
                "node_id",
                F.round(
                    F.lit(1.0 - d) / F.col("_n")
                    + F.lit(d) * F.coalesce(F.col("_in"), F.lit(0.0)),
                    round_digits,
                ).alias("pagerank"),
            )
        )
        # truncate lineage so iteration i+1's plan does not contain
        # iterations 1..i (see module docstring); the LAST iteration is
        # left un-checkpointed so the caller's action drives it lazily
        # and downstream projections still prune through it
        if i < n_iters - 1:
            pr = pr.localCheckpoint(eager=True)
    return pr
