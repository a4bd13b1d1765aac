"""Semantics tests for the training-corpus preparation operators
(operators/corpusprep.py) on constructed extreme documents — the
driver's DuckDB oracle covers the cross-engine hash match; these pin
the behaviors the oracle can't express as plainly (first-wins segment
ownership, partition-count invariance of the packed layout, the
repetition flag firing on the right docs, subset-stability of the
split)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from newscrawler_spark.operators import corpusprep as CP


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    )


SEG = " ".join(f"w{i}" for i in range(CP.SEG_TOKENS))  # one full segment
ALT = " ".join(f"x{i}" for i in range(CP.SEG_TOKENS))


def test_segment_dedup_first_wins(spark):
    docs = _docs(
        spark,
        [
            (0, "a", f"{SEG} {ALT}"),   # owns both segments
            (1, "a", f"{ALT} {SEG}"),   # both already owned by doc 0
            (2, "a", SEG + " tail"),    # shares seg 0, owns partial 'tail'
        ],
    )
    out = {r["doc_id"]: r for r in CP.segment_dedup(docs).collect()}
    assert out[0]["n_segments"] == 2 and out[0]["n_kept"] == 2
    assert out[0]["text_kept"] == f"{SEG} {ALT}"
    assert out[1]["n_kept"] == 0 and out[1]["text_kept"] == ""
    assert out[2]["n_kept"] == 1 and out[2]["text_kept"] == "tail"


def test_segment_dedup_within_doc_repeat(spark):
    docs = _docs(spark, [(7, "a", f"{SEG} {SEG} {SEG}")])
    row = CP.segment_dedup(docs).collect()[0]
    assert row["n_segments"] == 3 and row["n_kept"] == 1
    assert row["text_kept"] == SEG


def test_pack_sequences_matches_serial_cumsum(spark):
    rows = [(i, "s", " ".join(["tok"] * ((i * 37) % 301 + 1))) for i in range(100)]
    docs = _docs(spark, rows)
    got = (
        CP.pack_sequences(docs, seq_len=64, n_parts=5)
        .orderBy("doc_id")
        .toPandas()
    )
    acc = 0
    for _, r in got.iterrows():
        assert r["token_start"] == acc
        assert r["token_end"] == acc + r["n_tokens"]
        assert r["shard_start"] == acc // 64
        assert r["shard_end"] == (acc + r["n_tokens"] - 1) // 64
        acc += r["n_tokens"]


def test_pack_sequences_partition_invariant(spark):
    rows = [(i, "s", " ".join(["t"] * (i % 17 + 1))) for i in range(60)]
    docs = _docs(spark, rows)
    one = CP.pack_sequences(docs, seq_len=32, n_parts=1).orderBy("doc_id").collect()
    many = CP.pack_sequences(docs, seq_len=32, n_parts=7).orderBy("doc_id").collect()
    assert one == many


def test_repetition_flag(spark):
    looping = " ".join(["buy now"] * 50)               # one bigram forever
    diverse = " ".join(f"uniq{i}" for i in range(60))  # all tokens distinct
    docs = _docs(spark, [(0, "a", looping), (1, "a", diverse)])
    out = {r["doc_id"]: r for r in CP.repetition_stats(docs).collect()}
    assert out[0]["flagged"] and out[0]["top_bigram_frac"] > 0.4
    assert out[0]["distinct_ratio"] == pytest.approx(2 / 100)
    assert not out[1]["flagged"]
    assert out[1]["distinct_ratio"] == 1.0
    assert out[1]["top_token_frac"] == pytest.approx(1 / 60, abs=1e-6)


def test_repetition_single_token_doc(spark):
    out = CP.repetition_stats(_docs(spark, [(0, "a", "solo")])).collect()[0]
    assert out["n_tokens"] == 1 and out["top_bigram_frac"] == 0.0


def test_domain_mix_deterministic_and_bounded(spark):
    rows = [(i, f"src{i % 6}", "text here") for i in range(600)]
    docs = _docs(spark, rows)
    a = {r["source"]: r for r in CP.domain_mix(docs).collect()}
    b = {r["source"]: r for r in CP.domain_mix(docs).collect()}
    assert a.keys() == b.keys() and len(a) == 6
    for s, r in a.items():
        assert r["weight"] in (0.25, 0.5, 0.75, 1.0)
        assert 0 <= r["n_kept"] <= r["n_docs"] == 100
        assert b[s]["n_kept"] == r["n_kept"]
        if r["weight"] == 1.0:
            assert r["n_kept"] == r["n_docs"]


def test_train_split_fractions_and_subset_stability(spark):
    rows = [(i, "s", "x") for i in range(3000)]
    full = {r["doc_id"]: r["split"] for r in CP.train_split(_docs(spark, rows)).collect()}
    counts = pd.Series(list(full.values())).value_counts()
    assert set(counts.index) == {"train", "val", "test"}
    assert counts["train"] / 3000 == pytest.approx(0.98, abs=0.02)
    # growing/shrinking the corpus never moves an existing doc's split
    sub = {
        r["doc_id"]: r["split"]
        for r in CP.train_split(_docs(spark, rows[:500])).collect()
    }
    assert all(full[i] == sub[i] for i in sub)


def test_pack_sequences_plan_has_no_window(spark):
    """The packed layout must come from the two-phase prefix sum, never
    a global-ORDER-BY window (single-reducer at corpus scale)."""
    rows = [(i, "s", "a b c") for i in range(10)]
    plan = (
        CP.pack_sequences(_docs(spark, rows), n_parts=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan


def test_repetition_plan_partial_counts(spark):
    """Gram counting must partial-aggregate map-side so a looping doc's
    hot gram collapses before the shuffle."""
    rows = [(0, "a", "x y x y")]
    plan = (
        CP.repetition_stats(_docs(spark, rows))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_count" in plan


def test_segment_dedup_plan_has_partial_min(spark):
    """The owner aggregate must do map-side partial aggregation (the
    skew-immunity argument in the docstring): the physical plan carries
    a partial_min before the exchange."""
    docs = _docs(spark, [(0, "a", SEG), (1, "a", ALT)])
    plan = CP.segment_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan
