"""Corpus-curation operators (operators/curation.py): semantics on
crafted inputs where the right answer is known by construction.  The
driver's oracle harness additionally checks these against DuckDB on the
sf tables (queries decontaminate / quality_filter / pii_scrub)."""

from __future__ import annotations

import pytest

from newscrawler_spark.operators import curation as CUR

FIVE = "alpha beta gamma delta epsilon"  # exactly one 5-gram


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, f"intro words here then {FIVE} and a tail of more words"),  # leaks
        (1, "no overlap with anything benchmark related at all in this text"),
        (2, "alpha beta gamma delta"),  # 4 words < k: never flagged
        (3, FIVE),  # the benchmark doc itself, present in the corpus
        (4, f"{FIVE} {FIVE} repeated leak still counts each distinct gram once"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_ngram_leaks(spark, corpus):
    bench = spark.createDataFrame([(99, FIVE)], "doc_id long, text string")
    out = {r.doc_id: r for r in CUR.decontaminate(corpus, bench, k=5).collect()}
    assert len(out) == 5  # one row per corpus doc, hit or not
    assert out[0].contaminated and out[0].n_hits == 1
    assert not out[1].contaminated and out[1].n_hits == 0
    assert not out[2].contaminated  # too short to shingle
    assert out[3].contaminated  # verbatim benchmark in corpus
    # distinct shingles only: doc 4 shares several 5-grams spanning the
    # repetition, but each counts once and only those in the benchmark
    assert out[4].contaminated and out[4].n_hits == 1


def test_quality_filter_reasons_per_rule(spark):
    stopful = "the cat sat on the mat with a hat and a bat in the flat"
    rows = [
        (0, stopful),  # passes everything
        (1, "too few"),  # n_words
        (2, " ".join(["antidisestablishmentarianism"] * 20)),  # word_len + stopwords
        (3, " ".join(["rock"] * 30)),  # no stopwords
        (4, "the " * 10 + "!!! ??? *** ### $$$ %%% ^^^ &&& @@@ ;;; ::: ..."),  # punct
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in CUR.quality_filter(docs).collect()}
    assert out[0].keep and out[0].fail_reasons == ""
    assert not out[1].keep and "n_words" in out[1].fail_reasons
    assert set(out[2].fail_reasons.split(",")) == {"word_len", "stopwords"}
    assert out[3].fail_reasons == "stopwords"
    assert not out[4].keep and "punct" in out[4].fail_reasons
    # reasons are emitted in fixed QUALITY_RULES order
    assert out[2].fail_reasons == "word_len,stopwords"


def test_curate_corpus_composite_verdict(spark):
    stopful = "the cat sat on the mat with a hat and a bat in the flat"
    rows = [
        (0, stopful + " plus unique tail zero"),        # survives
        (1, stopful + " plus unique tail zero"),        # dup of 0 -> dropped
        (2, "too few"),                                  # quality drop
        (3, f"{stopful} {FIVE} benchmark leak inside"),  # contaminated
        (4, stopful + " another clean survivor text"),   # survives
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(99, FIVE)], "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1)], "doc_a long, doc_b long")
    out = {r.doc_id: r for r in CUR.curate_corpus(docs, bench, pairs).collect()}
    assert out[0].keep and out[0].drop_reasons == ""
    assert not out[1].keep and out[1].drop_reasons == "duplicate"
    assert not out[2].keep and "n_words" in out[2].drop_reasons
    assert not out[3].keep and out[3].drop_reasons == "contaminated"
    assert out[4].keep


def test_pii_scrub_counts_and_redacts(spark):
    rows = [
        (0, "mail a.b-c@sub.example.org or x@y.io please"),
        (1, "call +1-555-0123 or 44-555-9999 now"),
        (2, "hosts 10.0.0.1 and 192.168.255.3"),
        (3, "clean text with no identifiers at all"),
        (4, "mixed joe@ex.com 1-555-0000 127.0.0.1"),
        # round-3 advice: parens / dotted / spaced 10-digit phone forms
        # must redact, and out-of-range IPv4 octets must NOT match
        (5, "try (555) 123-4567 or 555.867.5309 or 555 123 4567"),
        (6, "bogus 999.999.999.999 real 203.0.113.77 edge 0.255.0.255"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in CUR.pii_scrub(docs).collect()}
    assert (out[0].n_email, out[0].n_phone, out[0].n_ip) == (2, 0, 0)
    assert out[0].scrubbed == "mail <EMAIL> or <EMAIL> please"
    assert out[1].n_phone == 2 and out[1].scrubbed == "call <PHONE> or <PHONE> now"
    assert out[2].n_ip == 2 and out[2].scrubbed == "hosts <IP> and <IP>"
    assert (out[3].n_email, out[3].n_phone, out[3].n_ip) == (0, 0, 0)
    assert out[3].scrubbed == rows[3][1]
    assert out[4].scrubbed == "mixed <EMAIL> <PHONE> <IP>"
    assert out[5].n_phone == 3
    assert out[5].scrubbed == "try <PHONE> or <PHONE> or <PHONE>"
    assert out[6].n_ip == 2
    assert out[6].scrubbed == "bogus 999.999.999.999 real <IP> edge <IP>"


# ---------------------------------------------------------------------------
# Duplicate n-gram fraction (corpus-scope repetition signal)
# ---------------------------------------------------------------------------

def test_dup_span_fraction_flags_shared_spans(spark):
    from newscrawler_spark.operators.curation import dup_span_fraction

    shared = "one two three four five six"            # 2 shared 5-grams
    docs = spark.createDataFrame(
        [
            (0, shared + " alpha beta gamma delta"),  # shares 2 of 6 grams? see below
            (1, shared + " zeta eta theta iota"),
            (2, "totally different words here with no overlap at all"),
            (3, "tiny doc"),                          # < k words → 0 grams
        ],
        "doc_id LONG, text STRING",
    )
    got = {r.doc_id: r for r in dup_span_fraction(docs).collect()}
    # docs 0/1: 10 words → 6 distinct 5-grams each; the 2 grams fully
    # inside the shared prefix have df=2
    assert got[0].n_grams == 6 and got[0].n_dup == 2
    assert got[1].n_grams == 6 and got[1].n_dup == 2
    assert abs(got[0].dup_frac - 2 / 6) < 1e-12
    assert got[2].n_dup == 0 and got[2].dup_frac == 0.0
    assert got[3].n_grams == 0 and got[3].dup_frac == 0.0


def test_dup_span_fraction_within_doc_repeat_not_flagged(spark):
    """Corpus scope: repetition INSIDE one document only (distinct
    per-doc shingles, df=1) must not flag — that's repetition_stats'
    job, not this operator's."""
    from newscrawler_spark.operators.curation import dup_span_fraction

    docs = spark.createDataFrame(
        [(0, "a b c d e a b c d e a b c d e")],
        "doc_id LONG, text STRING",
    )
    r = dup_span_fraction(docs).collect()[0]
    assert r.n_dup == 0 and r.dup_frac == 0.0
