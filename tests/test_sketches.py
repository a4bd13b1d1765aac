"""Count-min + HyperLogLog sketches (operators/sketches.py)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from newscrawler_spark.operators import sketches as SK


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, source STRING, text STRING")


def test_cms_never_underestimates_and_small_vocab_exact(spark):
    texts = ["alpha beta beta gamma", "alpha delta delta delta", "beta epsilon"]
    docs = _docs(spark, [(i, "s", t) for i, t in enumerate(texts)])
    truth = Counter(w for t in texts for w in t.split())
    rows = SK.cms_estimate(docs).collect()
    assert rows, "probe set empty"
    for r in rows:
        assert r["true_count"] == truth[r["token"]]
        assert r["cms_est"] >= r["true_count"]
        # 5-token vocab in a 4x1024 sketch: collisions are impossible
        # only if no two tokens share a cell in EVERY row; with d=4
        # independent rows this tiny vocab must be exact
        assert r["cms_est"] == r["true_count"]


def test_cms_sketch_size_constant(spark):
    docs = _docs(spark, [(i, "s", " ".join(f"w{j}" for j in range(50)))
                         for i in range(40)])
    n = SK.cms_build(docs).count()
    assert n <= SK.CMS_D * SK.CMS_W


def test_hll_partitioning_invariant(spark):
    """The harmonic sum is an exact integer — the estimate must be
    bit-identical at any parallelism (the property float sums lack)."""
    rows = [(i, f"src{i % 3}", " ".join(f"tok{(i * 37 + j) % 500}" for j in range(30)))
            for i in range(120)]
    a = SK.hll_distinct(_docs(spark, rows).repartition(1)).collect()
    b = SK.hll_distinct(_docs(spark, rows).repartition(17)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hll_accuracy_ballpark(spark):
    """m=64 → standard error ~13%; assert the raw estimator lands
    within 40% on a 2000-distinct-token source."""
    rows = [(i, "s", " ".join(f"u{i * 20 + j}" for j in range(20)))
            for i in range(100)]
    [r] = SK.hll_distinct(_docs(spark, rows)).collect()
    assert r["exact_distinct"] == 2000
    assert 0.6 * 2000 <= r["hll_estimate"] <= 1.4 * 2000
    assert r["registers_hit"] == SK.HLL_M  # 2000 >> 64 registers
