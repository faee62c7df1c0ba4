"""Similarity search over embedding columns (``array<float>``).

Two paths, same output contract (probe_id, neighbor_id, cosine, rank):

* brute_force_topk — exact: broadcast the (small) probe set against every
  vector; per-row dot products via zip_with/aggregate (JVM-side, no UDF),
  then a top-k window per probe.  The correctness baseline; at 100 TB this
  is a full scan but embarrassingly parallel (no shuffle until the final
  per-probe top-k, which is tiny).

* ivf_topk — IVF-style approximate: k-means-free variant that picks the
  first ``n_centroids`` vectors as fixed centroids (deterministic), assigns
  every vector to its nearest centroid (map-only, broadcast centroids),
  and probes only the ``nprobe`` closest centroid partitions per query.
  With nprobe == n_centroids it degrades to exact (used by the tests);
  with nprobe « n_centroids the scan cost drops ~nprobe/n_centroids —
  the 100 TB path, where the cluster assignment is precomputed once and
  stored as a partition column.

* random_hyperplane_buckets — SimHash-for-vectors: sign pattern against
  ``n_planes`` fixed pseudo-random hyperplanes → integer bucket; used for
  embedding near-dup joins (bucket-equijoin instead of cross join).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
) -> DataFrame:
    """Exact cosine top-k: broadcast probes × all vectors.  Excludes
    self-matches (same id).  Deterministic tie-break on neighbor id."""
    joined = vectors.crossJoin(F.broadcast(probes)).filter(
        F.col(id_col) != F.col(probe_id_col)
    )
    scored = joined.select(
        F.col(probe_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col(probe_vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def make_probes(
    vectors: DataFrame, n: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic probe set: the n smallest ids."""
    return (
        vectors.orderBy(id_col)
        .limit(n)
        .select(F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec"))
    )


def ivf_topk(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN.  Centroids = the first n_centroids vectors by id
    (deterministic; a production build would k-means|| these — the plan
    shape is identical).  Assignment and probe-routing are broadcast
    map-joins; only matching clusters are scanned."""
    centroids = (
        vectors.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.monotonically_increasing_id().alias("_tmp"),
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("centroid_vec"),
        )
        .drop("_tmp")
    )

    # assign every vector to nearest centroid — MAP-ONLY: broadcast the
    # centroid set as one array-of-structs row, compute all similarities as
    # an array column, take argmax via array_position.  The previous
    # row_number() over Window.partitionBy(vec_id) spelling shuffled
    # N × n_centroids rows — the one scale-killer in this path at 100 TB.
    # array_sort orders structs by centroid_id (first field), and
    # array_position returns the FIRST max, so ties break on the lowest
    # centroid_id exactly like the old (sim DESC, centroid_id ASC) window.
    cent_arr = centroids.agg(
        F.array_sort(
            F.collect_list(F.struct("centroid_id", "centroid_vec"))
        ).alias("_cents")
    )
    sims = F.transform(
        F.col("_cents"),
        lambda c: cosine(F.col(vec_col), c.getField("centroid_vec")),
    )
    assigned = (
        vectors.crossJoin(F.broadcast(cent_arr))
        .withColumn("_sims", sims)
        .withColumn("_best", F.array_position(F.col("_sims"), F.array_max(F.col("_sims"))))
        .select(
            id_col,
            vec_col,
            F.element_at(F.col("_cents"), F.col("_best").cast("int"))
            .getField("centroid_id")
            .alias("cluster"),
        )
    )

    # route each probe to its nprobe nearest clusters
    probe_routes = (
        probes.crossJoin(F.broadcast(centroids))
        .select(
            "probe_id",
            "probe_vec",
            "centroid_id",
            cosine(F.col("probe_vec"), F.col("centroid_vec")).alias("_sim"),
        )
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("probe_id").orderBy(F.col("_sim").desc(), F.col("centroid_id"))
            ),
        )
        .filter(F.col("_rk") <= nprobe)
        .select("probe_id", "probe_vec", F.col("centroid_id").alias("cluster"))
    )

    # scan only the routed clusters
    joined = assigned.join(F.broadcast(probe_routes), "cluster").filter(
        F.col(id_col) != F.col("probe_id")
    )
    scored = joined.select(
        "probe_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col("probe_vec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplanes_cached(dim: int, n_planes: int):
    """numpy dim × n_planes plane matrix, cached per (dim, n_planes)."""
    key = (dim, n_planes)
    mat = _PLANES_CACHE.get(key)
    if mat is None:
        mat = np.array(_hyperplanes(dim, n_planes)).T
        _PLANES_CACHE[key] = mat
    return mat


_PLANES_CACHE: dict = {}

# bounded session-aware cache for the persisted bucketed projection used by
# embedding_dup_pairs (see csv_etl_spark.operators._cache)
from csv_etl_spark.operators._cache import BoundedPersistCache as _BPC  # noqa: E402

_BUCKET_CACHE = _BPC(max_entries=4)


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Fixed pseudo-random unit hyperplanes (deterministic LCG — no RNG
    state, reproducible across engines/runs)."""
    planes = []
    seed = 1234567
    for p in range(n_planes):
        row = []
        for d in range(dim):
            seed = (seed * 1103515245 + 12345) % (1 << 31)
            row.append((seed / float(1 << 31)) * 2.0 - 1.0)
        norm = math.sqrt(sum(x * x for x in row)) or 1.0
        planes.append([x / norm for x in row])
    return planes


def random_hyperplane_buckets(
    df: DataFrame, dim: int | None = None, n_planes: int = 8, vec_col: str = "embedding"
) -> DataFrame:
    """Append an integer LSH bucket: bit p = sign(v · plane_p).

    Implemented as a vectorized Pandas UDF (one numpy matmul of each Arrow
    batch against the fixed plane matrix).  A pure-Column spelling (n_planes
    × dim literal arrays under fold lambdas) is semantically identical but
    generates a pathologically large expression tree — several seconds of
    codegen before the first row moves; batch-matrix math is the case
    vectorized UDFs exist for.

    ``dim`` is taken from the vectors themselves (the plane matrix is a
    deterministic function of (dim, n_planes), so every batch/worker/run
    derives the identical planes); pass it only to assert an expected width.
    """
    from pyspark.sql.functions import pandas_udf

    weights = (1 << np.arange(n_planes)).astype(np.int64)
    expect_dim = dim

    @pandas_udf("long")
    def bucket_of(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)  # batch × dim
        if expect_dim is not None and mat.shape[1] != expect_dim:
            raise ValueError(f"expected dim {expect_dim}, got {mat.shape[1]}")
        planes_t = _hyperplanes_cached(mat.shape[1], n_planes)
        bits = (mat @ planes_t) >= 0.0  # batch × n_planes
        return pd.Series(bits @ weights)

    return df.withColumn("lsh_bucket", bucket_of(F.col(vec_col)))


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    dim: int | None = None,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup: bucket-equijoin on random-hyperplane signature,
    verify cosine ≥ threshold.  Near-identical vectors agree on all sign
    bits with high probability; the join is keyed, never O(n²).

    The bucketed projection is computed once across full parallelism and
    persisted: the 8 hyperplane dot products per row are the expensive
    part, and both sides of the self-join (plus the verify) would
    otherwise re-evaluate them per mention (HOF lambdas are opaque to
    Catalyst CSE).  The persisted frame is registered in a session-aware
    bounded cache (shared policy with the shingle table) so repeated
    calls reuse it and evictees are unpersisted — it no longer leaks for
    the life of the session."""
    from pyspark.storagelevel import StorageLevel

    from csv_etl_spark.operators._cache import BoundedPersistCache
    from csv_etl_spark.sources.tables import ensure_parallelism

    src = ensure_parallelism(df.select(F.col(id_col), F.col(vec_col)))
    key = BoundedPersistCache.key_for(src, n_planes, vec_col)
    b = _BUCKET_CACHE.get(key)
    if b is None:
        b = random_hyperplane_buckets(src, dim, n_planes, vec_col)
        if key is not None:
            b = b.persist(StorageLevel.MEMORY_AND_DISK)
            _BUCKET_CACHE.put(key, b)
    left = b.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("lsh_bucket").alias("ba")
    )
    right = b.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("lsh_bucket").alias("bb")
    )
    pairs = left.join(right, (F.col("ba") == F.col("bb")) & (F.col("id_a") < F.col("id_b")))
    return (
        pairs.select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
