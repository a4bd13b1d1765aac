"""Embedding k-means + SemDeDup: Lloyd-iteration semantics vs an
independent numpy reference, determinism, and scale-relevant plan
shape."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from newscrawler_spark.operators import clustering as CLU


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _vecs(spark, arrs):
    return spark.createDataFrame(
        [(i, [float(x) for x in a]) for i, a in enumerate(arrs)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )


def _numpy_kmeans(arrs, dim, k, iters, seed):
    """Independent Lloyd reference with the SAME quantized update and
    tie rules."""
    cents = [np.array(c) for c in CLU.init_centroids(dim, k, seed)]
    X = [np.array(a) for a in arrs]

    def assign(cents):
        out = []
        for x in X:
            d2s = [float(x @ x - 2.0 * (x @ c) + c @ c) for c in cents]
            cid = min(range(k), key=lambda c: (d2s[c], c))
            out.append((cid, d2s[cid]))
        return out

    for _ in range(iters):
        a = assign(cents)
        sums = {}
        for (cid, _d), x in zip(a, X):
            s, n = sums.setdefault(cid, (np.zeros(dim, dtype=np.int64), 0))
            sums[cid] = (s + np.round(x * CLU.Q_SCALE).astype(np.int64), n + 1)
        cents = [
            (sums[c][0] / (sums[c][1] * float(CLU.Q_SCALE)))
            if c in sums
            else cents[c]
            for c in range(k)
        ]
    return assign(cents)


def test_kmeans_matches_numpy_reference(spark):
    rng = np.random.default_rng(3)
    # three separated blobs in 8-d
    arrs = np.concatenate(
        [rng.normal(loc=m, scale=0.1, size=(12, 8)) for m in (-2.0, 0.0, 2.0)]
    )
    got = {
        r.vec_id: (r.cluster, r.sq_dist)
        for r in CLU.kmeans_assign(_vecs(spark, arrs), dim=8, k=4, iters=2).collect()
    }
    ref = _numpy_kmeans([list(a) for a in arrs], dim=8, k=4, iters=2, seed=CLU.SEED)
    assert len(got) == len(ref)
    for i, (cid, d2) in enumerate(ref):
        assert got[i][0] == cid
        assert abs(got[i][1] - round(d2, 6)) < 1e-9
    # separated blobs must not share clusters
    blobs = [{got[i][0] for i in range(b * 12, (b + 1) * 12)} for b in range(3)]
    assert blobs[0].isdisjoint(blobs[2])


def test_kmeans_deterministic_across_partitioning(spark):
    arrs = np.random.default_rng(5).normal(size=(40, 8))
    df1 = _vecs(spark, arrs).repartition(1)
    df8 = _vecs(spark, arrs).repartition(8)
    a = sorted(map(tuple, CLU.kmeans_assign(df1, dim=8, k=3, iters=2).collect()))
    b = sorted(map(tuple, CLU.kmeans_assign(df8, dim=8, k=3, iters=2).collect()))
    assert a == b


def test_kmeans_assignment_plan_has_no_join(spark):
    """Assignment must be a pure projection over literal centroids —
    no join, no window, one scan per iteration."""
    arrs = np.random.default_rng(7).normal(size=(10, 8))
    assigned, _ = CLU.kmeans_fit(_vecs(spark, arrs), dim=8, k=3, iters=1)
    plan = _plan(assigned)
    for op in ("Join", "Window", "Exchange"):
        assert op not in plan, f"unexpected {op} in assignment plan"


def test_semdedup_drops_higher_id_near_duplicates(spark):
    base = np.random.default_rng(11).normal(size=(20, 8))
    # vectors 20/21 are near-copies of 0/1 (tiny perturbation,
    # cosine ≈ 1); vector 22 is a scaled copy of 2 (cosine exactly 1)
    arrs = np.concatenate([base, base[[0, 1]] * 1.0001, base[[2]] * 3.0])
    rows = CLU.semdedup(_vecs(spark, arrs), dim=8, k=2, iters=2, threshold=0.999)
    got = {r.vec_id: r.dropped for r in rows.collect()}
    assert got[20] and got[21] and got[22]
    assert not got[0] and not got[1] and not got[2]
    assert len(got) == 23


def test_derive_k_rule():
    """k = ceil(n/target), clamped: doubling the corpus doubles k, so
    expected cluster size — and per-row within-cluster pair work —
    stays constant (the round-4 sizing caveat, closed)."""
    assert CLU.derive_k(0) == 1
    assert CLU.derive_k(999, target_cluster_size=1000) == 1
    assert CLU.derive_k(1000, target_cluster_size=1000) == 1
    assert CLU.derive_k(1001, target_cluster_size=1000) == 2
    assert CLU.derive_k(10_000, target_cluster_size=1000) == 10
    assert CLU.derive_k(20_000, target_cluster_size=1000) == 20
    assert CLU.derive_k(10**12, target_cluster_size=1000) == 1_000_000  # k_max clamp
    # SemDeDup-paper shape: 440M rows / ~4400 target ≈ 1e5 clusters
    assert CLU.derive_k(440_000_000, target_cluster_size=4400) == 100_000


def test_assign_paths_agree(spark):
    """The broadcast-join assignment (large-k path) must be value- and
    tie-identical to the plan-literal path."""
    arrs = np.random.default_rng(13).normal(size=(30, 8))
    v_df = _vecs(spark, arrs).select("vec_id", F.col("embedding").alias("v"))
    cents = CLU.init_centroids(8, k=4, seed=3)
    lit = sorted(
        (r.vec_id, r.cluster, round(r.sq_dist, 9))
        for r in CLU._assign_literal(v_df, cents).collect()
    )
    bc = sorted(
        (r.vec_id, r.cluster, round(r.sq_dist, 9))
        for r in CLU._assign_broadcast(v_df, cents).collect()
    )
    assert lit == bc


def test_assign_strategy_switch(spark):
    """k*dim beyond ASSIGN_LITERAL_MAX must route to the broadcast
    join (literal plans at SemDeDup's 1e5 clusters are infeasible)."""
    arrs = np.random.default_rng(17).normal(size=(6, 4))
    v_df = _vecs(spark, arrs).select("vec_id", F.col("embedding").alias("v"))
    small = CLU._assign(v_df, CLU.init_centroids(4, k=2, seed=3))
    assert "Join" not in _plan(small)
    big_k = CLU.ASSIGN_LITERAL_MAX // 4 + 1
    big = CLU._assign(v_df, CLU.init_centroids(4, k=big_k, seed=3))
    assert "BroadcastNestedLoopJoin" in _plan(big) or "BroadcastHashJoin" in _plan(big)


def test_semdedup_auto_cluster_size_bounded(spark):
    """The derived-k invariant end-to-end: growing the corpus 4x with a
    fixed target_cluster_size must NOT grow the max cluster size
    linearly — k scales instead.  (Loose 4x-of-target skew bound; the
    data is well-spread gaussian noise.)"""
    target = 25
    for n in (100, 400):
        arrs = np.random.default_rng(23).normal(size=(n, 8))
        out = CLU.semdedup_auto(
            _vecs(spark, arrs), dim=8, target_cluster_size=target, iters=2
        )
        sizes = [
            r.n for r in out.groupBy("cluster").agg(F.count("*").alias("n")).collect()
        ]
        assert len(sizes) <= CLU.derive_k(n, target)
        assert max(sizes) <= 4 * target, f"n={n}: max cluster {max(sizes)}"
