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


def _assign(v_df: DataFrame, cents: list[list[float]]) -> DataFrame:
    """(vec_id, v, cluster, sq_dist): nearest centroid per vector via
    array_min over literal (d2, cid) structs — lexicographic min is
    min distance with ties to the lower cid."""
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
