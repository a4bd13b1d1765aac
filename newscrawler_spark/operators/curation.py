"""Corpus-curation operators for the training-data pipeline surface:
benchmark decontamination, Gopher/C4-style quality filtering, and PII
scrubbing.

These generalize the reference's per-article validation (non-empty
checks, text cleanup — /root/reference/news_crawler/core/base.py:94-97)
to the corpus-level filters a 100 TB pretraining pipeline runs before
training: drop documents that leak evaluation benchmarks, drop
low-quality documents with an auditable reason trail, and redact
personally-identifying strings.

Everything is JVM-side Column expressions (whole-stage codegen, no
Python in the hot path), built on the same cross-engine primitives as
functions/textops.py so the driver's DuckDB oracle reproduces every
value bit-for-bit.

Scale notes:
  * ``decontaminate``: the benchmark side is tiny by construction
    (eval suites are MBs, the corpus is TBs) → its distinct shingle
    hashes are **broadcast**; the corpus side never shuffles for the
    probe, and the only exchange is the map-side-combined count per
    doc_id.  Shingles are md5_64-hashed to 8-byte keys before the join
    so the broadcast table stays compact (16 M shingles ≈ 128 MB).
  * ``quality_flags`` / ``pii_scrub``: embarrassingly parallel per-row
    projections — zero shuffle, they pipeline into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import textops as TX
from ..xhash import md5_64

# --------------------------------------------------------------------------
# Benchmark decontamination
# --------------------------------------------------------------------------

DECONTAM_K = 5  # word n-gram size shared between engines and tests


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DECONTAM_K,
) -> DataFrame:
    """Flag corpus documents sharing any word ``k``-gram with a benchmark.

    Returns one row per corpus document:
    ``(id_col, n_hits bigint, contaminated boolean)`` where ``n_hits``
    is the number of *distinct* k-gram shingles of the document that
    occur anywhere in the benchmark set.

    The benchmark side is deduplicated to distinct shingle hashes and
    broadcast; a document shorter than ``k`` words has no shingles and
    is never flagged (matching the n-gram-overlap decontamination
    convention used by public LLM data pipelines).
    """
    doc_sh = corpus.select(
        id_col,
        F.explode(F.array_distinct(TX.shingles(text_col, k))).alias("_s"),
    ).select(id_col, md5_64(F.col("_s")).alias("_sh"))
    bench_sh = (
        benchmark.select(F.explode(TX.shingles(text_col, k)).alias("_s"))
        .select(md5_64(F.col("_s")).alias("_sh"))
        .distinct()
    )
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "_sh")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# --------------------------------------------------------------------------
# Quality filtering (Gopher/C4-style rule set, public knowledge)
# --------------------------------------------------------------------------

# (rule name, appears in fail_reasons in this fixed order)
QUALITY_RULES = ("n_words", "word_len", "stopwords", "punct")


def quality_flags(text: Column | str) -> dict[str, Column]:
    """The rule inputs + pass/fail columns for ``quality_filter``.

    Exposed separately so callers can project individual signals; all
    thresholds are integer/ratio comparisons reproducible in ANSI SQL.
    """
    c = F.col(text) if isinstance(text, str) else text
    ws = TX.words(c)
    n_words = F.size(ws)
    sum_len = F.aggregate(
        F.transform(ws, F.length), F.lit(0), lambda a, b: a + b
    )
    mean_wlen = F.when(n_words > 0, sum_len / n_words).otherwise(F.lit(0.0))
    stop_ratio = TX.stopword_ratio(c)
    punct_ratio = TX.punct_ratio(c)
    return {
        "n_words": n_words.cast("long"),
        "mean_word_len": mean_wlen,
        "stop_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "ok_n_words": (n_words >= 10) & (n_words <= 100_000),
        "ok_word_len": (mean_wlen >= 2.0) & (mean_wlen <= 12.0),
        "ok_stopwords": stop_ratio >= 0.05,
        "ok_punct": punct_ratio <= 0.3,
    }


def quality_filter(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document quality verdict with an auditable reason trail.

    ``(id_col, n_words, mean_word_len, stop_ratio, punct_ratio,
    fail_reasons string, keep boolean)`` — ``fail_reasons`` is the
    comma-joined fixed-order list of failed rule names ('' if none), so
    downstream filters can both drop and *explain* the drop.
    """
    q = quality_flags(text_col)
    reasons = F.concat_ws(
        ",",
        F.filter(
            F.array(
                *[
                    F.when(~q[f"ok_{r}"], F.lit(r))
                    for r in QUALITY_RULES
                ]
            ),
            lambda x: x.isNotNull(),
        ),
    )
    keep = q["ok_n_words"] & q["ok_word_len"] & q["ok_stopwords"] & q["ok_punct"]
    return docs.select(
        id_col,
        q["n_words"].alias("n_words"),
        F.round(q["mean_word_len"], 6).alias("mean_word_len"),
        F.round(q["stop_ratio"], 6).alias("stop_ratio"),
        F.round(q["punct_ratio"], 6).alias("punct_ratio"),
        reasons.alias("fail_reasons"),
        keep.alias("keep"),
    )


# --------------------------------------------------------------------------
# Composite curation verdict
# --------------------------------------------------------------------------

def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    neardup_pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The whole curation decision in one pass: a document survives iff
    it passes the quality rules, shares no k-gram with the benchmark,
    AND is its duplicate-cluster representative (smallest id — the
    engine's first-wins rule).

    Returns ``(id_col, keep boolean, drop_reasons string)`` where
    ``drop_reasons`` appends 'contaminated' / 'duplicate' to the
    quality rule names in fixed order — the per-document audit trail a
    100 TB curation run needs to answer "why was this dropped".

    Shape: three independent verdicts joined on the id — all three
    shuffles hash on the same key, so the exchanges line up; the
    expensive inputs (benchmark shingles, near-dup edges) keep their
    own operators' broadcast/band-join bounds.
    """
    from .dedup import dup_clusters

    q = quality_filter(docs, text_col, id_col).select(
        id_col, F.col("keep").alias("q_keep"), "fail_reasons"
    )
    c = decontaminate(docs, benchmark, text_col, id_col).select(
        id_col, "contaminated"
    )
    d = dup_clusters(docs, neardup_pairs, id_col).select(id_col, "cluster_id")
    j = q.join(c, id_col).join(d, id_col)
    is_rep = F.col("cluster_id") == F.col(id_col)
    reasons = F.concat_ws(
        ",",
        F.filter(
            F.array(
                F.when(F.col("fail_reasons") != "", F.col("fail_reasons")),
                F.when(F.col("contaminated"), F.lit("contaminated")),
                F.when(~is_rep, F.lit("duplicate")),
            ),
            lambda x: x.isNotNull(),
        ),
    )
    keep = F.col("q_keep") & ~F.col("contaminated") & is_rep
    return j.select(
        id_col, keep.alias("keep"), reasons.alias("drop_reasons")
    )


# --------------------------------------------------------------------------
# PII scrubbing
# --------------------------------------------------------------------------

# Regex subset shared by Java (Spark) and RE2 (DuckDB): character
# classes, bounded repetition, ordered alternation, \b — both engines
# run leftmost-first here (RE2's default longest_match=false), no
# lookaround/backreferences.  Coverage is documented best-effort NANP-ish
# redaction, not a PII guarantee: phone covers +cc / (555) / dotted /
# spaced / hyphenated 10-digit forms plus 7-digit local forms; ip is
# IPv4 with octets bounded to 0-255 (999.999.999.999 no longer
# matches); IPv6 is out of scope (would need case-insensitive hex
# grouping both engines treat identically — revisit if corpora need it).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (
        "phone",
        # branch 1: 10-digit NANP body with optional country code and
        # -/./space/paren separators; branch 2: the 7-digit cc-exchange-
        # local form the original pattern covered (+1-555-0123).  The
        # longer branch is FIRST — both engines pick alternatives in
        # order at each start position, so branch order is part of the
        # cross-engine contract.
        r"(\+?[0-9]{1,3}[-. ])?(\([0-9]{3}\)[-. ]?|[0-9]{3}[-. ])[0-9]{3}[-. ]?[0-9]{4}"
        r"|\+?[0-9]{1,3}[-. ][0-9]{3}[-. ]?[0-9]{4}",
        "<PHONE>",
    ),
    (
        "ip",
        r"\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
        r"\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
        r"\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
        r"\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b",
        "<IP>",
    ),
)


def pii_scrub(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails/phones/IPv4s and count what was redacted.

    ``(id_col, n_email, n_phone, n_ip, scrubbed string)`` — patterns
    apply in the fixed PII_PATTERNS order (email before phone before
    ip) so overlapping matches resolve identically everywhere.
    """
    c = F.col(text_col)
    counts = [
        F.regexp_count(c, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    scrubbed = c
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return docs.select(id_col, *counts, scrubbed.alias("scrubbed"))


def decontaminate_embeddings(
    corpus: DataFrame,
    evalset: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Semantic (embedding-level) decontamination: flag corpus items
    whose cosine similarity to ANY eval-set embedding reaches the
    threshold — the paraphrase-robust complement to the n-gram
    `decontaminate` (exact-overlap probes miss reworded benchmark
    items; embedding probes catch them).

    Scale shape mirrors `decontaminate`: eval suites are KB-to-MB
    scale, so the eval side is BROADCAST (a nested-loop against a
    handful of rows) and the corpus is scanned once — no shuffle
    before the per-item hit count.  Returns (vec_id, n_hits,
    contaminated); n_hits is an exact integer so the flag is
    engine-independent (cosines are sequential folds on both engines).

    ``exclude_self`` skips pairs whose ids are equal — ONLY for demos
    that draw the eval set from the corpus itself (the registry query
    does).  A genuinely external eval set must keep the default False:
    if its id space happened to collide with corpus ids, the guard
    would silently drop a true contamination hit (round-4 ADVICE fix).
    """
    from .similarity import _vec, cosine

    c = corpus.select(F.col(id_col).alias("vec_id"), _vec(vec_col).alias("cv"))
    e = evalset.select(F.col(id_col).alias("eval_id"), _vec(vec_col).alias("ev"))
    # conditional aggregate over the broadcast nested loop: every corpus
    # row survives the groupBy, so no join-back shuffle is needed —
    # one Exchange total (the per-item count), zero-hit rows included
    hit = cosine(F.col("cv"), F.col("ev")) >= F.lit(threshold)
    if exclude_self:
        hit = (F.col("vec_id") != F.col("eval_id")) & hit
    hit = hit.cast("long")
    return (
        c.crossJoin(F.broadcast(e))
        .groupBy("vec_id")
        .agg(F.sum(hit).alias("n_hits"))
        .select(
            "vec_id",
            "n_hits",
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )


DUPFRAC_K = 5  # word k-gram size for the duplicate-fraction signal


def dup_span_fraction(
    docs: DataFrame,
    k: int = DUPFRAC_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Duplicate n-gram fraction (the Dolma / RefinedWeb repetition
    signal at CORPUS scope): for each document, the fraction of its
    distinct word k-grams that also occur in at least one OTHER
    document.  High fractions mark templated/syndicated text that
    exact dedup misses (different ids, overlapping spans).

    Mechanics: distinct (doc, shingle-hash) pairs → shingle df via one
    map-side-combined groupBy → per-doc share with df ≥ 2.  The join
    back is on the 64-bit hash (co-partitioned with the df aggregate's
    own shuffle); no string shingle ever shuffles.  Returns (doc_id,
    n_grams, n_dup, dup_frac) — dup_frac is the exact-integer division
    n_dup / n_grams (NULL-free: docs shorter than k words report 0/0→0).
    """
    from ..functions.textops import shingles

    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(shingles(F.col(text_col), k)).alias("g"),
    ).select(
        "doc_id",
        F.when(F.col("g").isNotNull(), md5_64(F.col("g"))).alias("sh"),
    ).distinct()
    df_tbl = (
        sh.filter(F.col("sh").isNotNull())
        .groupBy("sh")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    per_doc = (
        sh.join(df_tbl, "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("sh").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_grams"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_dup",
        F.when(F.col("n_grams") > 0, F.col("n_dup") / F.col("n_grams"))
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )
