"""Similarity search over an embedding column (array<float>):

  * brute-force cosine top-k          — the exact baseline
  * LSH-bucketed ANN (random          — the scale path: sign-sketch
    hyperplanes via seeded md5_64)      buckets prune the candidate set
  * embedding-cosine near-dup pairs   — blocked pairwise cosine

The reference has no vector search; these are the engine-added
training-data ops (similar in spirit to the media dedup-by-id at
/root/reference/video_crawler/pixabay/videos/downloader.py:117-167,
generalized to content similarity).

Numeric determinism: dot products are computed with ``F.zip_with`` +
``F.aggregate`` — a sequential left-to-right fold, so the summation
order is fixed (same result every run, any partitioning).  Cosines are
rounded before they are reported; ranking uses the unrounded value with
id tie-breaks.

Scale design (100 TB / 10^9 vectors):
  * brute force is O(|Q|·N) — fine when |Q| is small and the corpus
    side is scanned once (no shuffle: queries are broadcast);
  * LSH variant buckets both sides by a `n_planes`-bit sign sketch and
    joins bucket-to-bucket (equi-join shuffle on a small int key),
    probing only same-bucket candidates; recall is tunable via
    multi-probe (hamming-1 neighbor buckets);
  * near-dup uses a blocking key (caller-supplied, e.g. LSH bucket or a
    cluster label) so the pairwise explosion is per-block.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..xhash import md5_64


def _vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Deterministic sequential-fold dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _partial_topk(slim: DataFrame, k: int) -> DataFrame:
    """Arrow-batched map-side partial top-k over (query_id, neighbor_id,
    cosine): each batch keeps at most k rows per query, so the exchange
    feeding the exact per-query window carries ~k·batches·|Q| rows
    instead of N·|Q|.  Selection only — cosine doubles round-trip Arrow
    bit-exactly and ordering matches the final window: Spark's
    `cosine.desc()` is NULLS LAST, and a zero-norm vector's cosine is
    NULL (dot/0 → NULL, surfacing as NaN in the Arrow batch), so the
    pandas sort uses na_position='last'.  Null rows therefore survive a
    batch only when it has fewer than k real candidates — exactly the
    cases where the exact single-window form could rank them.
    """
    schema = slim.schema

    def topk(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            pdf = pdf.sort_values(
                ["cosine", "neighbor_id"],
                ascending=[False, True],
                na_position="last",
                kind="mergesort",
            )
            yield pdf.groupby("query_id", sort=False).head(k)

    return slim.mapInPandas(topk, schema=schema)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: for each query row, the k nearest corpus rows
    (self-matches excluded).  Queries are broadcast — the corpus is
    scanned once with no shuffle; a map-side partial top-k (Arrow
    batches, _partial_topk) then bounds the rows entering the final
    exact per-query window, so the only exchange carries ~k rows per
    (query, input batch) rather than the full N·|Q| scored set.

    Returns (query_id, neighbor_id, rank, cosine).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _vec(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _vec(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    partial = _partial_topk(
        scored.select("query_id", "neighbor_id", "cosine"), k
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def hyperplane(dim: int, plane: int, seed: int = 7) -> list[float]:
    """Deterministic pseudo-random hyperplane components in [-1, 1],
    derived from md5 so any engine/process regenerates the same planes.
    (Driver-side constant — broadcast as literals into the plan.)"""
    from ..xhash import md5_64_py

    return [
        (md5_64_py(f"plane:{seed}:{plane}:{d}") % 2_000_001) / 1_000_000.0 - 1.0
        for d in range(dim)
    ]


def lsh_bucket(vec_col: Column | str, dim: int, n_planes: int = 8, seed: int = 7) -> Column:
    """Sign-sketch bucket id in [0, 2^n_planes): bit p = 1 iff
    dot(vec, plane_p) > 0.  Planes are literal arrays (no Python at
    runtime — the fold runs JVM-side)."""
    v = _vec(vec_col)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in hyperplane(dim, p, seed)])
        bit = F.when(dot(v, plane) > 0, F.lit(2 ** p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    multiprobe: bool = True,
) -> DataFrame:
    """ANN top-k: candidates share the query's LSH bucket (plus, with
    multiprobe, any hamming-1 neighbor bucket), then exact cosine ranks
    the bucket.  Returns (query_id, neighbor_id, rank, cosine)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _vec(vec_col).alias("c_vec"),
        lsh_bucket(vec_col, dim, n_planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _vec(vec_col).alias("q_vec"),
        lsh_bucket(vec_col, dim, n_planes).alias("qb"),
    )
    if multiprobe:
        probes = F.array_union(
            F.array(F.col("qb")),
            F.array(*[F.expr(f"qb ^ {1 << p}") for p in range(n_planes)]),
        )
    else:
        probes = F.array(F.col("qb"))
    q = q.select("query_id", "q_vec", F.explode(probes).alias("bucket"))

    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine(F.col("q_vec"), F.col("c_vec")))
        # a neighbor can appear via several probe buckets → keep one
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cosine").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def ivf_centroid(dim: int, c: int, seed: int = 11) -> list[float]:
    """Deterministic pseudo-random coarse-quantizer centroid in [-1, 1]
    per component, derived from md5 so any engine regenerates the same
    table (driver-side literals, like `hyperplane`)."""
    from ..xhash import md5_64_py

    return [
        (md5_64_py(f"ivf:{seed}:{c}:{d}") % 2_000_001) / 1_000_000.0 - 1.0
        for d in range(dim)
    ]


def _centroid_rank_structs(
    v: Column, dim: int, n_centroids: int, seed: int
) -> Column:
    """array<struct<negdot, cid>> — lexicographic min = best centroid
    (max dot, ties to the lower centroid id).  Dots are sequential
    folds; negation is IEEE-exact, so cross-engine ordering matches."""
    items = []
    for c in range(n_centroids):
        cen = F.array(*[F.lit(x) for x in ivf_centroid(dim, c, seed)])
        items.append(
            F.struct((-dot(v, cen)).alias("negdot"), F.lit(c).alias("cid"))
        )
    return F.array(*items)


def ivf_cells_for(n_rows: int, n_probe: int = 4,
                  c_min: int = 4, c_max: int = 1 << 20) -> int:
    """IVF cell-count sizing rule — same scale family as
    clustering.derive_k: per-query candidate work is
    ~ n·n_probe/n_cells and the query-side probe fan-out is
    n_probe-bounded, so n_cells = sqrt(n·n_probe) balances the two
    (the FAISS rule of thumb n_cells ≈ sqrt(n), scaled by probes) —
    candidate lists stay O(sqrt(n·n_probe)) per query instead of O(n)
    at a fixed cell count.  Rounded to the next power of two for stable
    cross-run partitioning; clamped.  At 10^9 vectors / n_probe=4 this
    gives 65,536 cells of ~15 k vectors each.

    NOTE for the literal-centroid quantizer here: beyond ~64k
    cells·dim the centroid table should move from plan literals to a
    broadcast join exactly as clustering._assign_broadcast does — the
    rule reports the target size regardless.
    """
    if n_rows <= 0:
        return c_min
    target = (n_rows * max(1, n_probe)) ** 0.5
    cells = 1
    while cells < target:
        cells <<= 1
    return max(c_min, min(c_max, cells))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 11,
) -> DataFrame:
    """IVF-style ANN: a deterministic coarse quantizer assigns every
    corpus vector to its nearest centroid cell (one cell per vector);
    each query probes its `n_probe` nearest cells and ranks candidates
    by exact cosine.  Returns (query_id, neighbor_id, rank, cosine).

    Scale shape (the brief's 'IVF variant as the scale path'): the
    corpus is scanned once to compute cell ids (JVM-side fold dots
    against literal centroids — no Python), the candidate join is an
    equi-join on the small int cell id (shuffle key cardinality =
    n_centroids × queries' probes), and the per-query exact rank runs
    over ~corpus·n_probe/n_centroids candidates instead of the full
    corpus.  Each (query, neighbor) pair arises at most once (a
    neighbor lives in exactly one cell), so no dedup aggregate is
    needed; the final window is bounded by the map-side partial top-k.
    """
    c_structs = _centroid_rank_structs(_vec(vec_col), dim, n_centroids, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _vec(vec_col).alias("c_vec"),
        F.array_min(c_structs)["cid"].alias("cid"),
    )
    q_structs = _centroid_rank_structs(_vec(vec_col), dim, n_centroids, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _vec(vec_col).alias("q_vec"),
        F.explode(
            F.transform(
                F.slice(F.array_sort(q_structs), 1, n_probe),
                lambda s: s["cid"],
            )
        ).alias("cid"),
    )
    scored = (
        c.join(F.broadcast(q), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    partial = _partial_topk(
        scored.select("query_id", "neighbor_id", "cosine"), k
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def cosine_neardup_pairs(
    vectors: DataFrame,
    block_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_salts: int = 32,
) -> DataFrame:
    """Embedding-cosine near-dup: pairwise cosine within blocks (the
    block column bounds the quadratic — label, LSH bucket, cluster id).

    The block join is SALTED: the probe side gets salt = hash(id) mod
    n_salts, the build side is replicated across all salts, and the
    join key is (blk, salt) — so the quadratic cosine work of a block
    spreads over n_salts partitions instead of pinning one task per
    block value (measured: with a handful of label blocks the sf1
    sweep ran the whole 20 M-pair compute in ONE task, 98x the sf0.1
    wall for 10x the rows).  Each (a, b) pair still meets exactly once
    — a's salt picks which replica of b it joins.  Replication costs
    n_salts x the (small) vector table, not n_salts x the pairs.

    Returns (vec_a, vec_b, cosine) with vec_a < vec_b, cosine >= threshold.
    """
    a = vectors.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("vec_a"), _vec(vec_col).alias("va")
    ).withColumn("salt", F.pmod(F.hash(F.col("vec_a")), F.lit(n_salts)).cast("int"))
    # explicit repartition on the join keys: if the build side ends up
    # broadcast, the join would otherwise inherit the probe side's scan
    # partitioning (often 1-2 parquet splits) and the whole quadratic
    # compute runs serial; when the join shuffles anyway, Catalyst
    # elides this exchange as redundant.  The partition COUNT is
    # explicit (REPARTITION_BY_NUM): AQE coalesces shuffles by INPUT
    # bytes, and the vector table is small — it merged the join down
    # to 7 partitions, un-spreading the quadratic output the salt
    # exists to spread
    spark = vectors.sparkSession
    n_part = max(int(spark.conf.get("spark.sql.shuffle.partitions")), n_salts)
    a = a.repartition(n_part, F.col("blk"), F.col("salt"))
    b = vectors.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("vec_b"), _vec(vec_col).alias("vb")
    ).withColumn(
        "salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    return (
        a.join(b, ["blk", "salt"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine"))
    )
