"""Retrieval (BM25 / TF-IDF), n-gram LM scoring, hashed-classifier and
sampling operators: semantics vs independent Python references, and the
plan shapes that matter at 100 TB."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from newscrawler_spark.operators import classify as CLS
from newscrawler_spark.operators import lmscore as LM
from newscrawler_spark.operators import retrieval as RET
from newscrawler_spark.operators import sampling as SMP
from newscrawler_spark.xhash import md5_64_py


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, "src%d" % (i % 3), t) for i, t in enumerate(rows)],
        "doc_id LONG, source STRING, text STRING",
    )


# ---------------------------------------------------------------------------
# BM25: independent Python reference
# ---------------------------------------------------------------------------

def _bm25_reference(texts: list[str], queries: dict[int, list[str]]):
    toks = [t.split() for t in texts]
    n = len(toks)
    dl = [len(t) for t in toks]
    avgdl = sum(dl) / n
    out = {}
    for qid, terms in queries.items():
        scores = {}
        for d, words in enumerate(toks):
            s = 0
            matched = 0
            for term in terms:
                tf = words.count(term)
                if not tf:
                    continue
                df = sum(1 for w in toks if term in w)
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                tfn = (tf * (RET.K1 + 1)) / (
                    tf + RET.K1 * (1 - RET.B + RET.B * dl[d] / avgdl)
                )
                s += round(idf * tfn * RET.SCORE_SCALE)
                matched += 1
            if matched:
                scores[d] = (s, matched)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))
        out[qid] = [
            (d, r + 1, sc / RET.SCORE_SCALE)
            for r, (d, (sc, _m)) in enumerate(ranked[: RET.TOP_K])
        ]
    return out


def test_bm25_matches_python_reference(spark):
    texts = [
        "apple banana apple cherry",
        "banana cherry cherry date",
        "apple apple apple banana date",
        "date egg fig",
        "egg fig apple banana cherry date",
    ]
    docs = _docs(spark, texts)
    q = spark.createDataFrame(
        [(0, "apple"), (0, "banana"), (1, "date")],
        "query_id INT, token STRING",
    )
    got = {
        (r.query_id, r.doc_id): (r.rank, r.score)
        for r in RET.bm25_topk(docs, q).collect()
    }
    ref = _bm25_reference(texts, {0: ["apple", "banana"], 1: ["date"]})
    assert len(got) == sum(len(v) for v in ref.values())
    for qid, rows in ref.items():
        for d, rank, score in rows:
            grank, gscore = got[(qid, d)]
            assert grank == rank
            assert abs(gscore - score) < 1e-9


def test_bm25_plan_broadcasts_terms_and_caps_windows(spark):
    """Query terms and df table must broadcast; both top-K windows must
    carry the WindowGroupLimit pushdown; no cartesian on a data-
    dependent side (the only nested-loop joins are 1-row scalar
    attaches)."""
    docs = _docs(spark, ["a b c"] * 8)
    q = spark.createDataFrame([(0, "a")], "query_id INT, token STRING")
    plan = _plan(RET.bm25_topk(docs, q))
    assert plan.count("BroadcastHashJoin") >= 2
    assert plan.count("WindowGroupLimit") >= 2
    assert "CartesianProduct" not in plan


def test_tfidf_corpus_wide_token_scores_zero(spark):
    """A token in every document has idf = ln(1) = 0 — it may appear in
    the profile only with tfidf == 0, and rarer tokens must outrank it."""
    docs = _docs(spark, ["common rare%d common other%d" % (i, i % 2) for i in range(6)])
    rows = RET.tfidf_top_terms(docs, top_k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d, rs in by_doc.items():
        top = min(rs, key=lambda r: r.rank)
        assert top.token != "common"
        for r in rs:
            if r.token == "common":
                assert r.tfidf == 0.0


# ---------------------------------------------------------------------------
# LM scoring: independent Python reference
# ---------------------------------------------------------------------------

def _lm_reference(texts: list[str]):
    toks = [t.split() for t in texts]
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for words in toks:
        for w in words:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(words, words[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    total = sum(uni.values())
    out = {}
    for d, words in enumerate(toks):
        s = 0
        n_back = 0
        for i, w in enumerate(words):
            if i == 0:
                lp = math.log(uni[w] / total)
            elif (words[i - 1], w) in big:
                lp = math.log(big[(words[i - 1], w)] / uni[words[i - 1]])
            else:
                lp = math.log(LM.ALPHA) + math.log(uni[w] / total)
                n_back += 1
            s += round(lp * LM.LOGP_SCALE)
        ppl = round(math.exp(-s / LM.LOGP_SCALE / len(words)), 4)
        out[d] = (len(words), n_back, s, ppl)
    return out


def test_lm_perplexity_matches_python_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the cat ate the fish",
        "a dog sat on a log",
        "fish ate the dog",
    ]
    got = {
        r.doc_id: (r.n_tokens, r.n_backoff, r.logprob_scaled, r.ppl)
        for r in LM.lm_perplexity(_docs(spark, texts)).collect()
    }
    assert got == _lm_reference(texts)


def test_lm_repetitive_text_scores_lower_ppl(spark):
    """The canonical use: repeated boilerplate has low perplexity,
    token soup has high — the filter signal must order them."""
    texts = ["spam spam spam spam spam spam"] + [
        " ".join("w%d%d" % (i, j) for j in range(6)) for i in range(4)
    ]
    rows = {r.doc_id: r.ppl for r in LM.lm_perplexity(_docs(spark, texts)).collect()}
    assert rows[0] < min(rows[d] for d in range(1, 5))


def test_lm_adjacency_collapses_whitespace_runs(spark):
    """Pinned contract: tokenization splits on \\s+ RUNS (plus trim),
    so consecutive whitespace yields no empty token and does NOT break
    the bigram chain — 'a  b' contributes the same (a, b) bigram as
    'a b', and no document-internal 'start' positions exist.  Both
    engines' oracles assume exactly this."""
    texts = ["a b", "a  b", "  a \t b  "]
    rows = LM.lm_bigram_table(_docs(spark, texts)).collect()
    got = {(r.w1, r.w2): r.c2 for r in rows}
    assert got == {("a", "b"): 3}
    ppl = {r.doc_id: (r.n_tokens, r.n_backoff)
           for r in LM.lm_perplexity(_docs(spark, texts)).collect()}
    assert ppl == {0: (2, 0), 1: (2, 0), 2: (2, 0)}


def test_lm_bigrams_counts(spark):
    rows = LM.lm_bigram_table(_docs(spark, ["a b a b c", "b c c"])).collect()
    got = {(r.w1, r.w2): (r.c2, r.c1_w1) for r in rows}
    assert got == {
        ("a", "b"): (2, 2),
        ("b", "a"): (1, 3),
        ("b", "c"): (2, 3),
        ("c", "c"): (1, 3),
    }


# ---------------------------------------------------------------------------
# Hashed classifier
# ---------------------------------------------------------------------------

def test_classifier_matches_python_hash_model(spark):
    texts = ["alpha beta gamma", "delta epsilon", "alpha alpha zeta"]
    weights = CLS.hashed_weights(spark.range(CLS.N_BUCKETS))
    rows = CLS.classify_docs(_docs(spark, texts), weights).collect()

    def w(tok: str) -> int:
        b = md5_64_py("f:" + tok) % CLS.N_BUCKETS
        return md5_64_py("w:%d" % b) % CLS.W_SPAN - (CLS.W_SPAN - 1) // 2

    for r in rows:
        toks = texts[r.doc_id].split()
        s = sum(w(t) for t in toks)
        assert r.score_milli_sum == s
        assert r.n_tokens == len(toks)
        assert r.label == (s > 0)
        assert abs(r.score - s / (1000.0 * len(toks))) < 1e-12


def test_classifier_plan_broadcasts_model_no_shuffle_before_agg(spark):
    weights = CLS.hashed_weights(spark.range(CLS.N_BUCKETS))
    plan = _plan(CLS.classify_docs(_docs(spark, ["a b"] * 4), weights))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# Sampling + shard layout
# ---------------------------------------------------------------------------

def test_rate_sample_stable_under_corpus_growth(spark):
    """A kept row stays kept when the corpus doubles — the property
    that makes hash-rate sampling resumable/incremental."""
    small = _docs(spark, ["x"] * 40)
    big = _docs(spark, ["x"] * 80)
    rates = SMP.stratified_rates(big)
    kept_small = {r.doc_id for r in SMP.sample_stratified(small, rates).collect()}
    kept_big = {r.doc_id for r in SMP.sample_stratified(big, rates).collect()}
    assert kept_small == {d for d in kept_big if d < 40}


def test_rate_sample_is_pure_filter_no_shuffle(spark):
    docs = _docs(spark, ["x"] * 10)
    plan = _plan(SMP.sample_stratified(docs, SMP.stratified_rates(docs)))
    assert "SortMergeJoin" not in plan and "Window" not in plan
    assert "CartesianProduct" not in plan


def test_balanced_sample_exact_quota(spark):
    docs = _docs(spark, ["x"] * 31)  # strata of 11/10/10 docs
    rows = SMP.sample_balanced(docs, k=4).collect()
    per = {}
    for r in rows:
        per[r.stratum] = per.get(r.stratum, 0) + 1
        assert 1 <= r.draw_rank <= 4
    assert per == {"src0": 4, "src1": 4, "src2": 4}
    # min-quota mode: every stratum downsampled to the smallest (10)
    rows_min = SMP.sample_balanced(docs).collect()
    per_min = {}
    for r in rows_min:
        per_min[r.stratum] = per_min.get(r.stratum, 0) + 1
    assert per_min == {"src0": 10, "src1": 10, "src2": 10}


def test_shuffle_shards_partitions_and_positions(spark):
    docs = _docs(spark, ["x"] * 100)
    rows = SMP.shuffle_shards(docs, n_shards=8).collect()
    assert len(rows) == 100 and len({r.doc_id for r in rows}) == 100
    by_shard = {}
    for r in rows:
        assert 0 <= r.shard < 8
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # deterministic: a second build is identical
    again = SMP.shuffle_shards(docs, n_shards=8).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


# ---------------------------------------------------------------------------
# Hashed doc embeddings + embedding decontamination
# ---------------------------------------------------------------------------

def test_doc_embed_matches_python_hash_model(spark):
    texts = ["alpha beta", "alpha alpha gamma delta"]
    rows = CLS.hashed_doc_embedding(_docs(spark, texts), dim=4).collect()

    def w(tok, d):
        b = md5_64_py(f"e:{d}:{tok}")
        return b % CLS.W_SPAN - (CLS.W_SPAN - 1) // 2

    for r in rows:
        toks = texts[r.doc_id].split()
        for d in range(4):
            exp = sum(w(t, d) for t in toks) / (1000.0 * len(toks))
            assert abs(r.embedding[d] - exp) < 1e-12
        assert r.n_tokens == len(toks)


def test_doc_embed_feeds_vector_operators(spark):
    """The bridge property: hashed embeddings drive k-means directly."""
    from newscrawler_spark.operators import clustering as CLU

    docs = _docs(spark, ["a b c d"] * 10 + ["x y z w"] * 10)
    emb = CLS.hashed_doc_embedding(docs, dim=8).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    got = {r.vec_id: r.cluster for r in
           CLU.kmeans_assign(emb, dim=8, k=4, iters=2).collect()}
    # identical texts -> identical embeddings -> identical cluster
    assert len({got[i] for i in range(10)}) == 1
    assert len({got[i] for i in range(10, 20)}) == 1


def test_decontaminate_embed_flags_eval_hits(spark):
    from newscrawler_spark.operators.curation import decontaminate_embeddings

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # eval item
        (1, [0.99, 0.1, 0.0, 0.0]),  # near-copy of eval -> contaminated
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal -> clean
        (3, [-1.0, 0.0, 0.0, 0.0]),  # anti-parallel -> clean
    ]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    evalset = emb.filter(F.col("vec_id") == 0)
    got = {r.vec_id: (r.contaminated, r.n_hits)
           for r in decontaminate_embeddings(emb, evalset, threshold=0.9).collect()}
    assert got[1] == (True, 1)
    assert got[2] == (False, 0)
    assert got[3] == (False, 0)
    # default: NO self-exclusion — an external eval set whose ids
    # happen to collide with corpus ids must still flag true hits
    # (round-4 ADVICE); id 0 matches the eval row that IS itself
    assert got[0] == (True, 1)
    # demo mode: the eval set was drawn from the corpus, so the demo
    # opts in to self-exclusion
    got_x = {r.vec_id: (r.contaminated, r.n_hits)
             for r in decontaminate_embeddings(
                 emb, evalset, threshold=0.9, exclude_self=True).collect()}
    assert got_x[0] == (False, 0)
    assert got_x[1] == (True, 1)


def test_write_shards_layout_and_determinism(spark, tmp_path):
    """The written shard files ARE the shuffle_shards layout: per-shard
    parquet in position order, re-write byte-identical."""
    import os

    from pyspark.sql import functions as FF

    docs = _docs(spark, [f"text {i}" for i in range(60)])
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    SMP.write_shards(docs, p1, n_shards=8)
    SMP.write_shards(docs, p2, n_shards=8)

    back = spark.read.parquet(p1)
    assert back.count() == 60
    assert back.select("doc_id").distinct().count() == 60
    # layout equals the standalone operator's
    expect = {(r.doc_id, r.shard, r.pos)
              for r in SMP.shuffle_shards(docs, n_shards=8).collect()}
    got = {(r.doc_id, r.shard, r.pos)
           for r in back.select("doc_id", "shard", "pos").collect()}
    assert got == expect
    # file-level determinism: same bytes per shard dir
    import hashlib

    def dir_hash(root):
        h = hashlib.md5()
        for dirp, _dirs, files in sorted(os.walk(root)):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    h.update(open(os.path.join(dirp, f), "rb").read())
        return h.hexdigest()

    assert dir_hash(p1) == dir_hash(p2)
    # every shard dir holds rows sorted by pos
    one = spark.read.parquet(p1 + "/shard=3")
    poss = [r.pos for r in one.select("pos").collect()]
    assert poss == sorted(poss)
