"""Inverted-index build (operators/postings.py) and domain boilerplate
removal (operators/corpusprep.py::strip_boilerplate)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Window
from pyspark.sql import functions as F

from newscrawler_spark.operators import corpusprep as CP
from newscrawler_spark.operators.postings import inverted_index


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, source STRING, text STRING")


def test_inverted_index_matches_bruteforce(spark):
    texts = {
        0: "the cat sat on the mat the",
        1: "the dog the dog",
        2: "cat cat cat the",
        3: "mat",
        4: "the the the the the",
    }
    df = _docs(spark, [(i, "s", t) for i, t in texts.items()])
    got = {
        (r["token"], r["rank"]): (r["df"], r["tf_total"], r["doc_id"], r["tf"])
        for r in inverted_index(df, top_k=3, pre_cap_salt=4).collect()
    }
    # pure-python reference
    tf = Counter()
    for d, t in texts.items():
        for w in t.split():
            tf[(w, d)] += 1
    by_tok: dict[str, list] = {}
    for (w, d), c in tf.items():
        by_tok.setdefault(w, []).append((d, c))
    want = {}
    for w, posts in by_tok.items():
        dfreq, total = len(posts), sum(c for _, c in posts)
        posts.sort(key=lambda p: (-p[1], p[0]))
        for rank, (d, c) in enumerate(posts[:3], 1):
            want[(w, rank)] = (dfreq, total, d, c)
    assert got == want


def test_inverted_index_two_stage_equals_single_window(spark):
    """The salted pre-cap must be invisible: identical output to the
    naive one-window form on a skewed corpus (one token in every doc)."""
    rows = [(i, "s", "hot " * (i % 7 + 1) + f"u{i} u{i % 13}") for i in range(200)]
    df = _docs(spark, rows)
    two = inverted_index(df, top_k=5, pre_cap_salt=8)

    w = df.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    tf = w.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    tot = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("tf_total"),
    )
    naive = (
        tf.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("token").orderBy(F.desc("tf"), F.asc("doc_id"))
            ),
        )
        .filter(F.col("rank") <= 5)
        .join(tot, "token")
        .select("token", "df", "tf_total", F.col("rank").cast("int"),
                "doc_id", F.col("tf").cast("long"))
    )
    assert sorted(map(tuple, two.collect())) == sorted(map(tuple, naive.collect()))


BANNER = "accept cookies"


def test_boilerplate_stripped_domain_scoped(spark):
    # seg_tokens=2 → every 2-word window is a segment
    rows = [
        (0, "a", f"{BANNER} alpha one"),
        (1, "a", f"{BANNER} beta two"),
        (2, "a", f"{BANNER} gamma three shared pair"),
        (3, "a", f"{BANNER} delta four shared pair"),
        # same banner text but a different source: df=1 there → kept
        (4, "b", f"{BANNER} epsilon five"),
    ]
    out = {
        r["doc_id"]: (r["n_segments"], r["n_boiler"], r["text_clean"])
        for r in CP.strip_boilerplate(
            _docs(spark, rows), seg_tokens=2, min_docs=2,
            frac_num=1, frac_den=2,
        ).collect()
    }
    # banner df=4/4 in source a → stripped; "shared pair" df=2/4 → meets
    # the >=1/2 threshold exactly → stripped; unique segments kept
    assert out[0] == (2, 1, "alpha one")
    assert out[1] == (2, 1, "beta two")
    assert out[2] == (3, 2, "gamma three")
    assert out[3] == (3, 2, "delta four")
    # source b has 1 doc: df=1 < min_docs → banner kept
    assert out[4] == (2, 0, f"{BANNER} epsilon five")


def test_boilerplate_below_threshold_kept(spark):
    # 5 docs, shared pair in only 2 of 5 → 2*2 < 1*5? no: frac 1/2 →
    # 2*2=4 < 5 → kept
    rows = [(i, "a", f"u{i} v{i}" + (" same pair" if i < 2 else "")) for i in range(5)]
    out = {
        r["doc_id"]: r["n_boiler"]
        for r in CP.strip_boilerplate(
            _docs(spark, rows), seg_tokens=2, min_docs=2,
            frac_num=1, frac_den=2,
        ).collect()
    }
    assert out == {i: 0 for i in range(5)}
