"""Embedding k-means clustering + SemDeDup-style semantic dedup.

Modern corpus curation (SemDeDup, Abbas et al. 2023; DataComp; D4)
clusters document embeddings with k-means, then removes near-identical
embeddings WITHIN each cluster — the cluster bounds the quadratic
pairwise work that would be impossible corpus-wide.

Execution model (Lloyd's algorithm, Spark-first):
  * centroids live on the DRIVER (k x dim doubles — bytes, like
    MLlib's KMeans keeps centers) and are embedded as literal arrays
    into each iteration's plan, so assignment is a pure JVM expression
    — array_min over k (squared-distance, cid) structs, NO join, no
    Python, one corpus scan per iteration;
  * the update step is one map-side-combined groupBy over
    posexploded components; element sums are 6-dp-quantized BIGINTs,
    so the new centroid s / (n * 1e6) is an exact-integer division —
    bit-identical on any engine, any partitioning, any retry;
  * per-iteration driver traffic is k x dim rows (the collect of the
    new centroids), independent of corpus size.

Cross-engine determinism: every distance is composed of sequential-fold
dot products (dot(v,v) - 2·dot(v,c) + dot(c,c), the same fold DuckDB's
list_dot_product performs), centroid components are exact-integer
divisions, and ties in argmin break on centroid id — so the DuckDB
oracle's unrolled-CTE iterations reproduce the assignment exactly.

Fixed iteration count (no convergence test): curation k-means runs a
handful of Lloyd rounds — determinism and scan-count matter more than
squeezing the objective; an unconverged clustering is still a valid
SemDeDup blocking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..xhash import md5_64_py
from .similarity import _vec, cosine_neardup_pairs, dot

K = 8
ITERS = 2
SEED = 7
Q_SCALE = 1_000_000  # component quantization for exact centroid sums
SEM_THRESHOLD = 0.9
TARGET_CLUSTER_SIZE = 1000  # derive_k default: expected rows per cluster
# k*dim above which centroid-literal assignment (k structs in the plan)
# gives way to a broadcast centroid join: a 10^5-cluster SemDeDup run
# (the paper's scale) at dim=256 would otherwise put 2.56e7 literals in
# every iteration's plan
ASSIGN_LITERAL_MAX = 65_536


def derive_k(
    n_rows: int,
    target_cluster_size: int = TARGET_CLUSTER_SIZE,
    k_min: int = 1,
    k_max: int = 1_000_000,
) -> int:
    """SemDeDup k sizing rule (round-4 verdict task 4): k = ceil(n /
    target_cluster_size), clamped.

    Why this bounds the work: within-cluster pairwise cost is
    sum_c |c|*(|c|-1)/2.  With k ∝ n the EXPECTED cluster size stays
    constant at `target_cluster_size`, so under bounded skew
    (max cluster ≤ s_max) total pair work ≤ n * s_max / 2 — LINEAR in
    corpus size, vs quadratic for any fixed k (the round-4 caveat:
    K=8 fixed means within-cluster work grows ∝ n²/k).  SemDeDup
    (Abbas et al. 2023) runs ~1e5 clusters on LAION-440M — the same
    n/target shape with target ≈ 4400.
    """
    if n_rows <= 0:
        return k_min
    k = -(-n_rows // max(1, target_cluster_size))  # ceil
    return max(k_min, min(k_max, k))


def init_centroids(dim: int, k: int = K, seed: int = SEED) -> list[list[float]]:
    """Deterministic pseudo-random centroids in [-1, 1] per component —
    the ivf_centroid recipe under a distinct hash domain, regenerable
    by any engine."""
    return [
        [
            (md5_64_py(f"km:{seed}:{c}:{d}") % 2_000_001) / 1_000_000.0 - 1.0
            for d in range(dim)
        ]
        for c in range(k)
    ]


def _assign_literal(v_df: DataFrame, cents: list[list[float]]) -> DataFrame:
    """(vec_id, v, cluster, sq_dist): nearest centroid per vector via
    array_min over literal (d2, cid) structs — lexicographic min is
    min distance with ties to the lower cid.  No join, no shuffle; one
    corpus scan.  Plan size grows with k*dim, so this path is gated to
    k*dim <= ASSIGN_LITERAL_MAX."""
    items = []
    for cid, cen in enumerate(cents):
        c = F.array(*[F.lit(x) for x in cen])
        d2 = dot(F.col("v"), F.col("v")) - F.lit(2.0) * dot(F.col("v"), c) + dot(c, c)
        items.append(F.struct(d2.alias("d2"), F.lit(cid).alias("cid")))
    best = F.array_min(F.array(*items))
    return v_df.select(
        "vec_id",
        "v",
        best["cid"].alias("cluster"),
        best["d2"].alias("sq_dist"),
    )


def _assign_broadcast(v_df: DataFrame, cents: list[list[float]]) -> DataFrame:
    """Same contract as _assign_literal, but the centroids travel as a
    BROADCAST table (k rows of (cid, centroid)) instead of plan
    literals — the large-k path: a broadcast nested-loop against k
    rows, then one map-side-combined min_by per vec_id.  k*dim doubles
    are megabytes even at SemDeDup's 1e5 clusters, far under broadcast
    limits; the corpus is scanned once and the only Exchange is the
    per-vector argmin combine.

    Identical semantics to the literal path (same sequential-fold d2,
    same lower-cid tie-break via lexicographic struct min) — asserted
    equal by tests/test_clustering.py::test_assign_paths_agree.
    """
    spark = v_df.sparkSession
    cent_df = spark.createDataFrame(
        [(cid, cen) for cid, cen in enumerate(cents)],
        "cid INT, cen ARRAY<DOUBLE>",
    )
    c = F.col("cen")
    d2 = dot(F.col("v"), F.col("v")) - F.lit(2.0) * dot(F.col("v"), c) + dot(c, c)
    scored = v_df.join(F.broadcast(cent_df)).select(
        "vec_id", "v", F.struct(d2.alias("d2"), F.col("cid").alias("cid")).alias("s")
    )
    best = scored.groupBy("vec_id").agg(
        F.min("s").alias("best"), F.first("v").alias("v")
    )
    return best.select(
        "vec_id", "v",
        F.col("best.cid").alias("cluster"),
        F.col("best.d2").alias("sq_dist"),
    )


def _assign(v_df: DataFrame, cents: list[list[float]]) -> DataFrame:
    """Strategy switch: plan-literal centroids for small k*dim (fastest,
    zero shuffle), broadcast centroid join beyond ASSIGN_LITERAL_MAX."""
    k_dim = len(cents) * (len(cents[0]) if cents else 0)
    if k_dim <= ASSIGN_LITERAL_MAX:
        return _assign_literal(v_df, cents)
    return _assign_broadcast(v_df, cents)


def kmeans_fit(
    vectors: DataFrame,
    dim: int,
    k: int = K,
    iters: int = ITERS,
    seed: int = SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Run `iters` Lloyd rounds; returns (final assignment DataFrame,
    final centroids).  Assignment rows: (vec_id, cluster, sq_dist).
    """
    v_df = vectors.select(
        F.col(id_col).alias("vec_id"), _vec(vec_col).alias("v")
    )
    cents = init_centroids(dim, k, seed)
    for _ in range(iters):
        assigned = _assign(v_df, cents)
        sums = (
            assigned.select("cluster", F.posexplode("v").alias("d", "x"))
            .groupBy("cluster", "d")
            .agg(
                F.sum(F.round(F.col("x") * F.lit(Q_SCALE), 0).cast("long")).alias("s"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
        )
        new: dict[int, list[float]] = {}
        for r in sums.collect():  # k x dim rows — driver-side by design
            new.setdefault(r.cluster, [0.0] * dim)[r.d] = r.s / (r.n * float(Q_SCALE))
        # empty cluster → keep its previous centroid (deterministic)
        cents = [new.get(cid, cents[cid]) for cid in range(k)]
    return _assign(v_df, cents), cents


def kmeans_assign(
    vectors: DataFrame,
    dim: int,
    k: int = K,
    iters: int = ITERS,
    seed: int = SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster, sq_dist rounded 6) after `iters` Lloyd rounds."""
    assigned, _ = kmeans_fit(vectors, dim, k, iters, seed, id_col, vec_col)
    return assigned.select(
        "vec_id",
        F.col("cluster").cast("int").alias("cluster"),
        F.round("sq_dist", 6).alias("sq_dist"),
    )


def semdedup(
    vectors: DataFrame,
    dim: int,
    k: int = K,
    iters: int = ITERS,
    seed: int = SEED,
    threshold: float = SEM_THRESHOLD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup: k-means-block the corpus, then within each cluster
    drop every vector that is cosine-≥-threshold similar to a
    lower-id keeper.  Returns (vec_id, cluster, dropped).

    The pairwise stage is `cosine_neardup_pairs` with the CLUSTER as
    the blocking key — the salted block join that spreads one
    cluster's quadratic work over n_salts tasks.  Keep-lowest-id over
    the pair list is one aggregation, not a connected-components pass
    (SemDeDup's own rule: any example with a kept near-duplicate of
    lower id is removed; transitive chains drop everything but each
    chain's head, which the pair rule already implies for
    cosine-threshold cliques and conservatively over-drops for
    non-clique chains — the curation-safe direction).
    """
    assigned, _cents = kmeans_fit(vectors, dim, k, iters, seed, id_col, vec_col)
    with_cluster = vectors.join(
        assigned.select(F.col("vec_id").alias(id_col), "cluster"), id_col
    )
    pairs = cosine_neardup_pairs(
        with_cluster,
        block_col="cluster",
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
    )
    dropped = pairs.select(F.col("vec_b").alias("vec_id")).distinct()
    return (
        assigned.select("vec_id", F.col("cluster").cast("int").alias("cluster"))
        .join(dropped.withColumn("dropped", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id", "cluster", F.coalesce("dropped", F.lit(False)).alias("dropped")
        )
    )


def semdedup_auto(
    vectors: DataFrame,
    dim: int,
    target_cluster_size: int = TARGET_CLUSTER_SIZE,
    iters: int = ITERS,
    seed: int = SEED,
    threshold: float = SEM_THRESHOLD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """`semdedup` with k DERIVED from the corpus (round-4 verdict task
    4): one count() sizes k = derive_k(n, target_cluster_size), holding
    expected cluster size — and therefore within-cluster pair work per
    row — constant as the corpus grows.  The count is one extra
    metadata-cheap job against a 10^8-row table; at 100 TB the row
    count is usually already known from the ingest manifest, in which
    case call semdedup(k=derive_k(n, ...)) directly."""
    n = vectors.count()
    k = derive_k(n, target_cluster_size)
    return semdedup(vectors, dim, k, iters, seed, threshold, id_col, vec_col)
