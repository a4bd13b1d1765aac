"""Engine-vs-simulator equivalence (crawl ordering + URL-seen set, the
north_rule correctness criteria) and kill/resume bit-identity."""

import pytest
from pyspark.sql import functions as F

from newscrawler_spark import schema
from newscrawler_spark.oracle.simulator import simulate_crawl
from newscrawler_spark.plans.crawl_round import RoundConfig
from newscrawler_spark.plans.scheduler import crawl, seed_frontier
from newscrawler_spark.sources.catalog import Catalog
from newscrawler_spark.sources.fetch import FixtureFetcher
from newscrawler_spark.synth import synth_budgets, synth_frontier, synth_pages, synth_robots

N_SEEDS = 120
N_PAGES = 800
MAX_ROUNDS = 4
CONF = RoundConfig(n_buckets=16, m_bits=1 << 16, n_partitions=8, salt_factor=4)


@pytest.fixture(scope="module")
def world(spark):
    seeds = synth_frontier(spark, N_SEEDS).cache()
    pages = synth_pages(spark, N_PAGES).cache()
    budgets = synth_budgets(spark, capacity_default=12).cache()
    robots = synth_robots(spark).cache()
    return seeds, pages, budgets, robots


@pytest.fixture(scope="module")
def sim_result(spark, world):
    seeds, pages, budgets, robots = world
    sim_seeds = [r.asDict() for r in seeds.collect()]
    sim_pages = {
        r["url"]: (r["status"], r["html"], list(r["out_links"] or []))
        for r in pages.collect()
    }
    sim_budgets = {r["domain"]: (r["capacity"], r["window_s"]) for r in budgets.collect()}
    sim_robots = [
        (r["domain"], r["path_prefix"], r["allow"], r["crawl_delay_s"] or 0.0)
        for r in robots.collect()
    ]
    return simulate_crawl(
        sim_seeds, sim_pages, sim_budgets, sim_robots,
        max_rounds=MAX_ROUNDS, max_depth=CONF.max_depth,
    )


@pytest.fixture(scope="module")
def engine_result(spark, world, tmp_path_factory):
    seeds, pages, budgets, robots = world
    cat = Catalog(tmp_path_factory.mktemp("crawl"))
    seed_frontier(cat, seeds)
    crawl(spark, cat, FixtureFetcher(pages), budgets, robots,
          max_rounds=MAX_ROUNDS, conf=CONF)
    return cat


def test_fetch_order_matches_simulator(spark, engine_result, sim_result):
    order = engine_result.read_table(spark, "fetch_order")
    got = {
        (r["round"], r["domain"], r["rank"], r["canonical_url"])
        for r in order.collect()
    }
    want = set(sim_result["fetch_order"])
    assert got == want


def test_seen_set_matches_simulator(spark, engine_result, sim_result):
    seen = engine_result.read_table(spark, "url_seen")
    got = {r["canonical_url"] for r in seen.collect()}
    assert got == sim_result["seen"]
    # seen rows are unique per canonical
    assert seen.count() == seen.select("canonical_url").distinct().count()


def test_docs_and_spans_match_simulator(spark, engine_result, sim_result):
    docs = engine_result.read_table(spark, "docs")
    got = {r["doc_id"]: r for r in docs.collect()}
    want = sim_result["docs"]
    assert set(got) == set(want)
    for doc_id, sim_doc in want.items():
        eng_spans = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in got[doc_id]["spans"]
        ]
        sim_spans = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in sim_doc["spans"]
        ]
        assert eng_spans == sim_spans, doc_id
        assert got[doc_id]["title"] == sim_doc["title"]


def test_quarantine_matches_simulator(spark, engine_result, sim_result):
    q = engine_result.read_table(spark, "quarantine")
    got = {(r["url"], r["round"], r["error"]) for r in q.collect()}
    want = {(u, rnd, err) for (u, rnd, err) in sim_result["quarantine"]}
    assert got == want


def test_kill_and_resume_bit_identical(spark, world, engine_result, tmp_path_factory):
    seeds, pages, budgets, robots = world
    cat2 = Catalog(tmp_path_factory.mktemp("crawl_resume"))
    seed_frontier(cat2, seeds)
    # run rounds 0-1, "die", then resume
    crawl(spark, cat2, FixtureFetcher(pages), budgets, robots,
          max_rounds=MAX_ROUNDS, conf=CONF, stop_after_round=1)
    assert cat2.last_round == 1
    crawl(spark, cat2, FixtureFetcher(pages), budgets, robots,
          max_rounds=MAX_ROUNDS, conf=CONF)

    for table, key in [
        ("fetch_order", ["round", "domain", "rank", "canonical_url", "url"]),
        ("url_seen", ["canonical_url", "round_seen"]),
        ("quarantine", ["url", "round", "error", "attempt"]),
    ]:
        a = engine_result.read_table(spark, table).select(*key)
        b = cat2.read_table(spark, table).select(*key)
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), table
    # docs incl. spans
    a = engine_result.read_table(spark, "docs")
    b = cat2.read_table(spark, "docs")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_crash_with_uncommitted_deltas_redoes_round(spark, world, engine_result,
                                                    tmp_path_factory):
    """The deferred-commit pipeline's crash window: round N's deltas are
    on disk but the manifest never committed N (the docs-write future
    joins before commit, so a crash can leave exactly this state).
    Resume must REDO round N over the stale uncommitted files —
    overwrite-idempotent — and every output must stay bit-identical."""
    import json

    seeds, pages, budgets, robots = world
    cat2 = Catalog(tmp_path_factory.mktemp("crawl_crash"))
    seed_frontier(cat2, seeds)
    crawl(spark, cat2, FixtureFetcher(pages), budgets, robots,
          max_rounds=MAX_ROUNDS, conf=CONF, stop_after_round=1)
    assert cat2.last_round == 1
    # simulate the crash state: round 1's deltas exist, manifest says 0
    manifest = cat2.read_manifest()
    manifest["last_round"] = 0
    del manifest["rounds"]["1"]
    cat2._manifest_path.write_text(json.dumps(manifest))
    assert cat2.last_round == 0

    crawl(spark, cat2, FixtureFetcher(pages), budgets, robots,
          max_rounds=MAX_ROUNDS, conf=CONF)

    for table, key in [
        ("fetch_order", ["round", "domain", "rank", "canonical_url", "url"]),
        ("url_seen", ["canonical_url", "round_seen"]),
        ("quarantine", ["url", "round", "error", "attempt"]),
    ]:
        a = engine_result.read_table(spark, table).select(*key)
        b = cat2.read_table(spark, table).select(*key)
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), table
    a = engine_result.read_table(spark, "docs")
    b = cat2.read_table(spark, "docs")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_crawl_with_cuckoo_filter_identical(spark, world, engine_result,
                                            tmp_path_factory):
    """Swapping the bloom sidecar for the cuckoo filter
    (conf.seen_filter='cuckoo') must leave every crawl output
    bit-identical — both filters are prune-only; the exact anti-join
    decides."""
    seeds, pages, budgets, robots = world
    cat2 = Catalog(tmp_path_factory.mktemp("crawl_cuckoo"))
    seed_frontier(cat2, seeds)
    conf = RoundConfig(n_buckets=16, m_bits=1 << 16, n_partitions=8,
                       salt_factor=4, seen_filter="cuckoo",
                       cuckoo_capacity=2048)
    crawl(spark, cat2, FixtureFetcher(pages), budgets, robots,
          max_rounds=MAX_ROUNDS, conf=conf)

    for table, key in [
        ("fetch_order", ["round", "domain", "rank", "canonical_url", "url"]),
        ("url_seen", ["canonical_url", "round_seen"]),
        ("quarantine", ["url", "round", "error", "attempt"]),
    ]:
        a = engine_result.read_table(spark, table).select(*key)
        b = cat2.read_table(spark, table).select(*key)
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), table
    a = engine_result.read_table(spark, "docs")
    b = cat2.read_table(spark, "docs")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    # the cuckoo sidecar accounted for every seen row
    import pyspark.sql.functions as _F

    side = spark.read.schema(schema.CUCKOO).parquet(
        cat2.delta_path("cuckoo", cat2.last_round)
    )
    assert (
        side.agg(_F.sum("n_items")).first()[0]
        == cat2.read_table(spark, "url_seen").count()
    )


def test_per_round_incremental_dedup(spark, world, tmp_path_factory):
    """conf.dedup_docs=True: each round's docs are probed against the
    accumulated corpus LSH index; the union of the per-round neardup
    deltas must equal a one-shot recompute restricted to cross-round
    pairs (newer doc vs any strictly-earlier round's doc)."""
    from newscrawler_spark.operators import dedup as DD

    seeds, pages, budgets, robots = world
    cat = Catalog(tmp_path_factory.mktemp("crawl_dedup"))
    seed_frontier(cat, seeds)
    conf = RoundConfig(n_buckets=16, m_bits=1 << 16, n_partitions=8,
                       salt_factor=4, dedup_docs=True, dedup_min_common=3)
    totals = crawl(spark, cat, FixtureFetcher(pages), budgets, robots,
                   max_rounds=MAX_ROUNDS, conf=conf)
    assert any("neardup_matches" in c for c in totals.values())

    got_df = cat.read_table(spark, "neardup")
    got = {(r.doc_id, r.dup_of, r.n_common) for r in got_df.collect()} if got_df is not None else set()

    docs = cat.read_table(spark, "docs").select(
        "doc_id", "round", DD.doc_text().alias("text")
    )
    sigs = DD.minhash_signatures(docs)
    bands = DD.signature_bands(sigs).join(
        docs.select("doc_id", "round"), "doc_id"
    )
    new_side = bands.select(
        F.col("doc_id"), F.col("round").alias("r_new"), "band", "key"
    )
    old_side = bands.select(
        F.col("doc_id").alias("dup_of"), F.col("round").alias("r_old"),
        "band", "key",
    )
    cands = (
        new_side.join(old_side, ["band", "key"])
        .filter(F.col("r_new") > F.col("r_old"))
        .select("doc_id", "dup_of")
        .distinct()
    )
    sn = sigs.select("doc_id", *[F.col(f"h{j}").alias(f"na{j}") for j in range(16)])
    so = sigs.select(
        F.col("doc_id").alias("dup_of"),
        *[F.col(f"h{j}").alias(f"ob{j}") for j in range(16)],
    )
    agree = sum(
        F.when(F.col(f"na{j}") == F.col(f"ob{j}"), 1).otherwise(0)
        for j in range(16)
    )
    want_uncapped = {
        (r.doc_id, r.dup_of, r.n_common)
        for r in cands.join(sn, "doc_id").join(so, "dup_of")
        .select("doc_id", "dup_of", agree.cast("int").alias("n_common"))
        .filter(F.col("n_common") >= 3)
        .collect()
    }

    # mirror the production hot-bucket cutoff (conf.dedup_bucket_cap):
    # a round-n batch probes the index of rounds < n MINUS buckets that
    # hold more than cap docs at that point, so the recompute drops a
    # pair iff every bucket it shares was hot when the newer doc's
    # round ran.  The hot set is time-varying → fold it round by round
    # driver-side (the fixture corpus is collectable).
    cap = conf.dedup_bucket_cap
    band_rows = bands.select("doc_id", "round", "band", "key").collect()
    buckets_by_doc: dict = {}
    round_of: dict = {}
    for r in band_rows:
        buckets_by_doc.setdefault(r.doc_id, set()).add((r.band, r.key))
        round_of[r.doc_id] = r["round"]
    from collections import Counter

    counts: Counter = Counter()
    hot_at: dict = {}
    for rnd in sorted(set(round_of.values())):
        # counts currently covers rounds < rnd
        hot_at[rnd] = {b for b, n in counts.items() if n > cap}
        for doc, dr in round_of.items():
            if dr == rnd:
                counts.update(buckets_by_doc[doc])
    want = {
        (a, b, nc)
        for (a, b, nc) in want_uncapped
        if (buckets_by_doc[a] & buckets_by_doc[b]) - hot_at[round_of[a]]
    }
    # the fixture's shared paragraph templates must make the cutoff
    # bite (otherwise this test degenerates to the uncapped one)
    assert want != want_uncapped
    assert got == want
    # and the index accounted for every doc (8 bands each)
    idx = cat.read_table(spark, "dedup_index")
    assert idx.count() == docs.count() * 8


def test_search_sweep_caps_and_dedup(spark):
    """Video-side sweep: per-keyword cap (A5), pagination bounds (L1/L2),
    cross-keyword media dedup (A7) — checked against a python
    re-derivation of the same fixture."""
    from newscrawler_spark.plans.search_sweep import search_sweep
    from newscrawler_spark.synth import synth_api_pages

    kws = ["cat", "dog", "spark", "news"]
    api = synth_api_pages(spark, kws, per_page=4).cache()
    out = search_sweep(
        spark.createDataFrame([(k,) for k in kws], "keyword string"),
        api, max_per_keyword=6, per_page=4,
    ).collect()

    # python oracle from the same fixture
    fixture = {}
    for r in api.collect():
        fixture.setdefault(r.keyword, {})[r.page] = (r.total_hits, list(r.hits))
    expect = []
    for k in sorted(fixture):
        yielded = 0
        for page in sorted(fixture[k]):
            total, hits = fixture[k][page]
            for h in hits:
                if yielded >= 6:
                    break
                yielded += 1
                expect.append((k, h.media_id, yielded))
    # A7 dedup: first (keyword, rank) wins per media_id
    best = {}
    for k, mid, rank in expect:
        if mid not in best or (k, rank) < best[mid]:
            best[mid] = (k, rank)
    want = {(v[0], mid, v[1]) for mid, v in best.items()}
    got = {(r.keyword, r.media_id, r.rank) for r in out}
    assert got == want
    per_kw = {}
    for r in out:
        per_kw[r.keyword] = per_kw.get(r.keyword, 0) + 1
    assert all(v <= 6 for v in per_kw.values())


def test_robots_longest_prefix_wins(spark):
    from newscrawler_spark import schema
    from newscrawler_spark.operators.scheduling import apply_robots

    robots = spark.createDataFrame(
        [
            ("x.com", "/", True, 0.0),
            ("x.com", "/private", False, 0.0),
            ("x.com", "/private/except", True, 0.0),
        ],
        schema.ROBOTS,
    )
    cand = spark.createDataFrame(
        [
            ("https://x.com/a", "x.com", 0, 0, 1),
            ("https://x.com/private/p", "x.com", 0, 0, 2),
            ("https://x.com/private/except/q", "x.com", 0, 0, 3),
            ("https://y.com/no-rules", "y.com", 0, 0, 4),
        ],
        "url string, domain string, priority int, depth int, seq long",
    )
    allowed, denied = apply_robots(cand, robots)
    assert {r.seq for r in allowed.collect()} == {1, 3, 4}
    assert {r.seq for r in denied.collect()} == {2}


def test_adaptive_budgets_are_resumable_state(spark, world, tmp_path_factory):
    """AIMD mode (round-4 verdict task 7): budgets evolve per round from
    fetch outcomes, are persisted as per-round `budgets` deltas, and a
    kill/resume reproduces the uninterrupted run bit-identically —
    including the budget-table state itself."""
    import dataclasses

    seeds, pages, budgets, robots = world
    conf = dataclasses.replace(CONF, adaptive_budgets=True)

    cat_a = Catalog(tmp_path_factory.mktemp("aimd_full"))
    seed_frontier(cat_a, seeds)
    tot_a = crawl(spark, cat_a, FixtureFetcher(pages), budgets, robots,
                  max_rounds=MAX_ROUNDS, conf=conf)

    # capacities actually evolved and were recorded per round
    caps = [tot_a[r]["capacity_total"] for r in sorted(tot_a)]
    assert len(caps) >= 2
    assert len(set(caps)) > 1, f"capacity never changed: {caps}"

    cat_b = Catalog(tmp_path_factory.mktemp("aimd_resume"))
    seed_frontier(cat_b, seeds)
    crawl(spark, cat_b, FixtureFetcher(pages), budgets, robots,
          max_rounds=MAX_ROUNDS, conf=conf, stop_after_round=1)
    assert cat_b.last_round == 1
    crawl(spark, cat_b, FixtureFetcher(pages), budgets, robots,
          max_rounds=MAX_ROUNDS, conf=conf)

    for table, key in [
        ("fetch_order", ["round", "domain", "rank", "canonical_url", "url"]),
        ("url_seen", ["canonical_url", "round_seen"]),
    ]:
        a = cat_a.read_table(spark, table).select(*key)
        b = cat_b.read_table(spark, table).select(*key)
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), table
    # the budget STATE deltas themselves are bit-identical
    for r in sorted(tot_a):
        pa, pb = cat_a.delta_path("budgets", r), cat_b.delta_path("budgets", r)
        da = spark.read.schema(schema.BUDGETS).parquet(pa)
        db = spark.read.schema(schema.BUDGETS).parquet(pb)
        assert da.exceptAll(db).isEmpty() and db.exceptAll(da).isEmpty(), r
