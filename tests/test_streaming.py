"""Streaming surface tests: AvailableNow windowed metrics over docs
deltas, and the foreachBatch seed-stream bridge producing the same
results as the plain batch crawl."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from newscrawler_spark import synth
from newscrawler_spark.plans.crawl_round import RoundConfig
from newscrawler_spark.plans.scheduler import crawl, seed_frontier
from newscrawler_spark.sources.catalog import Catalog
from newscrawler_spark.sources.fetch import FixtureFetcher
from newscrawler_spark.streaming.stream import (
    run_doc_metrics_available_now,
    stream_docs,
)

N = 200


@pytest.fixture(scope="module")
def crawled(spark):
    root = tempfile.mkdtemp()
    cat = Catalog(root)
    seed_frontier(cat, synth.synth_frontier(spark, N))
    crawl(
        spark,
        cat,
        FixtureFetcher(synth.synth_pages(spark, N)),
        synth.synth_budgets(spark, 40),
        synth.synth_robots(spark),
        max_rounds=2,
        conf=RoundConfig(n_partitions=4),
    )
    return cat


def test_doc_metrics_available_now(spark, crawled):
    out = tempfile.mkdtemp() + "/out"
    ckpt = tempfile.mkdtemp() + "/ckpt"
    run_doc_metrics_available_now(spark, crawled, out, ckpt)
    got = spark.read.parquet(out)
    docs = crawled.read_table(spark, "docs")
    last_round = docs.agg(F.max("round")).head()[0]
    # append-mode watermarking finalizes a round's window once a later
    # round arrives → the stream reports all rounds except the newest
    batch = (
        docs.filter(F.col("round") < last_round)
        .groupBy("round", "platform")
        .agg(F.count("*").alias("docs"), F.sum(F.size("spans")).alias("spans"))
    )
    g = {(r.round_window, r.platform): (r.docs, r.spans) for r in got.collect()}
    b = {(r.round, r.platform): (r.docs, r.spans) for r in batch.collect()}
    assert g == b and len(g) > 0


def test_metrics_and_budget_state_tables(spark, crawled):
    m = crawled.read_table(spark, "metrics")
    rows = {r.round: r for r in m.collect()}
    assert set(rows) == {0, 1}
    order = crawled.read_table(spark, "fetch_order")
    assert rows[0].scheduled == order.filter("round = 0").count()
    b = crawled.read_table(spark, "budget_state")
    r0 = {r.domain: r for r in b.filter("reset_ts = 60.0").collect()}
    used0 = {
        r.domain: r["count"]
        for r in order.filter("round = 0").groupBy("domain").count().collect()
    }
    for dom, row in r0.items():
        assert row.used == used0.get(dom, 0)
        assert row.remaining == max(0, row.capacity - row.used)


def test_seed_stream_foreachbatch_matches_batch(spark):
    import tempfile

    from newscrawler_spark.streaming.stream import crawl_from_seed_stream

    seeds = synth.synth_frontier(spark, 150)
    seed_dir = tempfile.mkdtemp() + "/seeds"
    seeds.write.parquet(seed_dir)

    # batch ground truth
    b_root = Catalog(tempfile.mkdtemp())
    seed_frontier(b_root, seeds)
    crawl(spark, b_root, FixtureFetcher(synth.synth_pages(spark, 150)),
          synth.synth_budgets(spark, 40), synth.synth_robots(spark),
          max_rounds=3, conf=RoundConfig(n_partitions=4))

    # streaming bridge
    s_root = Catalog(tempfile.mkdtemp())
    stream = spark.readStream.schema(seeds.schema).parquet(seed_dir)
    q = crawl_from_seed_stream(
        spark, stream, s_root, FixtureFetcher(synth.synth_pages(spark, 150)),
        synth.synth_budgets(spark, 40), synth.synth_robots(spark),
        checkpoint=tempfile.mkdtemp() + "/ckpt",
        max_rounds_per_batch=3, conf=RoundConfig(n_partitions=4),
    )
    q.awaitTermination()

    a = sorted(map(str, b_root.read_table(spark, "docs").collect()))
    b = sorted(map(str, s_root.read_table(spark, "docs").collect()))
    assert a == b and len(a) > 0


def test_stateful_sessionize_state_survives_restart(spark):
    """applyInPandasWithState buffering state must persist in the state
    store across query restarts: drain once with NO sentinels (all
    state buffered, nothing emitted), then add the sentinel file and
    drain again from the same checkpoint — the second run must emit the
    complete batch-identical session set from restored state."""
    import os
    import shutil
    import tempfile

    from newscrawler_spark.operators.events import sessionize
    from newscrawler_spark.streaming.stateful import (
        sessionize_stream,
        write_sentinels,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sf_dir = "/root/testdata/sf0.001"
    base = tempfile.mkdtemp(prefix="stateful_")
    events_dir = base + "/events"
    src = f"{sf_dir}/events.parquet"
    if os.path.isdir(src):
        shutil.copytree(src, events_dir)
    else:
        os.makedirs(events_dir)
        shutil.copy(src, events_dir + "/part-data.parquet")
    out, ckpt = base + "/out", base + "/ckpt"

    # drain 1: no sentinels → everything buffered, nothing emitted
    sessionize_stream(spark, events_dir, out, ckpt, gap_minutes=30)
    import glob

    emitted = sum(
        spark.read.parquet(out).count()
        for _ in [0]
        if glob.glob(out + "/*.parquet")
    )
    assert emitted == 0

    # drain 2 (restart from the same checkpoint): sentinels close every
    # user; sessions must come from RESTORED state
    ev = spark.read.parquet(src)
    write_sentinels(spark, ev, events_dir)
    sessionize_stream(spark, events_dir, out, ckpt, gap_minutes=30)
    got = {
        (r.user_id, r.session_id, r.n_events, r.start_epoch, r.end_epoch)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (
            r.user_id,
            r.session_id,
            r.n_events,
            int(r.session_start.timestamp()),
            int(r.session_end.timestamp()),
        )
        for r in sessionize(ev, gap_minutes=30).collect()
    }
    assert got == want and len(got) > 0


def test_stateful_sessionize_rejects_oversized_drain(spark, monkeypatch, tmp_path):
    """The sentinel protocol is only safe when the whole drain fits one
    micro-batch; more input files than maxFilesPerTrigger must fail
    FAST (ValueError before the query starts), never mis-sessionize."""
    import newscrawler_spark.streaming.stateful as st

    events_dir = str(tmp_path / "events")
    import datetime

    ev = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 7, "click", 1.0, None)],
        st.EVENT_SCHEMA,
    )
    ev.write.parquet(events_dir)  # several part files
    ev.coalesce(1).write.mode("append").parquet(events_dir)

    monkeypatch.setattr(st, "MAX_FILES_PER_DRAIN", 1)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="MAX_FILES_PER_DRAIN"):
        st.sessionize_stream(
            spark, events_dir, str(tmp_path / "out"), str(tmp_path / "ckpt")
        )


def test_seed_stream_second_batch_merges_pending_frontier(spark):
    """A later micro-batch against an already-crawled catalog takes the
    merge path (read pending frontier delta + overwrite the same path) —
    regression test for the self-overwrite failure: Spark rejects
    overwriting a path that is also being read unless the merged frame
    is materialized first."""
    import tempfile

    from newscrawler_spark.streaming.stream import crawl_from_seed_stream

    pages = synth.synth_pages(spark, 150)
    budgets, robots = synth.synth_budgets(spark, 40), synth.synth_robots(spark)
    conf = RoundConfig(n_partitions=4)
    seeds = synth.synth_frontier(spark, 150)
    seed_dir = tempfile.mkdtemp() + "/seeds"
    ckpt = tempfile.mkdtemp() + "/ckpt"
    s_root = Catalog(tempfile.mkdtemp())

    # batch 1: seeds 0..59
    seeds.filter("seq % 5 < 2").write.mode("append").parquet(seed_dir)
    q = crawl_from_seed_stream(
        spark, spark.readStream.schema(seeds.schema).parquet(seed_dir),
        s_root, FixtureFetcher(pages), budgets, robots,
        checkpoint=ckpt, max_rounds_per_batch=1, conf=conf,
    )
    q.awaitTermination()
    docs_after_1 = s_root.read_table(spark, "docs").count()
    assert docs_after_1 > 0 and s_root.last_round >= 0

    # batch 2: remaining seeds arrive — catalog already crawled, so the
    # handler must merge into the pending frontier delta
    seeds.filter("seq % 5 >= 2").write.mode("append").parquet(seed_dir)
    q2 = crawl_from_seed_stream(
        spark, spark.readStream.schema(seeds.schema).parquet(seed_dir),
        s_root, FixtureFetcher(pages), budgets, robots,
        checkpoint=ckpt, max_rounds_per_batch=1, conf=conf,
    )
    q2.awaitTermination()
    docs_after_2 = s_root.read_table(spark, "docs").count()
    assert docs_after_2 > docs_after_1
