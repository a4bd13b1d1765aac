"""The resumable round scheduler — driver-level iterative control flow
(the reference's politeness blocking and pagination loops have no
Catalyst analog; SURVEY.md §4).

Each round: read frontier delta from the catalog → run_round → write all
deltas → atomically commit the manifest.  A killed run resumes from the
last committed manifest and, because every derived value is a pure
function of (url, round, config), reproduces the uninterrupted run
bit-identically (tested in tests/test_crawl.py).

Bloom lifecycle: the sidecar is rebuilt incrementally per round
(merge_bloom) and persisted as its own delta, so a resume reads the
latest sidecar instead of rescanning 10^10 seen rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.seen import build_bloom, merge_bloom
from ..sources.catalog import Catalog
from .crawl_round import FRONTIER_COLS, RoundConfig, RoundResult, run_round


def bootstrap_hosts_for_round(
    frontier: DataFrame, bootstrap, round_no: int
) -> list[str]:
    """The hosts a round pulls onto the driver for header bootstrapping —
    BOUNDED (round-3 verdict item 2: the naive distinct().collect() of
    frontier domains is millions of rows at 10^10-URL scale).

    Two bounds compose:
      * hosts whose bootstrap entry is still TTL-fresh are anti-joined
        out BEFORE the collect (they need neither re-collect nor
        re-bootstrap — refresh() would skip them anyway, but only after
        they crossed the driver);
      * the remainder is capped to the top `max_hosts_per_round` by
        frontier mass (ties broken by domain for determinism) — compiles
        to TakeOrderedAndProject over the per-domain counts, so the
        driver sees at most K rows however wide the frontier is.  The
        long tail keeps static platform config until it carries weight.
    """
    from pyspark.sql import functions as F

    mass = (
        frontier.filter(F.col("domain").isNotNull())
        .groupBy("domain")
        .agg(F.count("*").alias("__mass"))
    )
    fresh = bootstrap.fresh_hosts(round_no)
    if fresh:
        fresh_df = frontier.sparkSession.createDataFrame(
            [(h,) for h in sorted(fresh)], "domain string"
        )
        mass = mass.join(F.broadcast(fresh_df), "domain", "left_anti")
    top = (
        mass.orderBy(F.col("__mass").desc(), F.col("domain").asc())
        .limit(bootstrap.max_hosts_per_round)
        .collect()
    )
    return [r.domain for r in top]


def seed_frontier(catalog: Catalog, seeds: DataFrame) -> None:
    """Round-0 bootstrap: seeds become frontier delta 0 (idempotent if
    the manifest hasn't committed round 0 yet)."""
    if catalog.last_round >= 0:
        return
    catalog.write_delta(seeds.select(*FRONTIER_COLS), "frontier", 0)


def crawl(
    spark: SparkSession,
    catalog: Catalog,
    fetcher,
    budgets: DataFrame,
    robots: DataFrame,
    max_rounds: int = 10,
    conf: RoundConfig | None = None,
    stop_after_round: int | None = None,
    header_bootstrap=None,
    robots_fetcher=None,
    robots_agent: str = "newscrawler",
) -> dict:
    """Run crawl rounds until the frontier drains or max_rounds.

    `stop_after_round` simulates a kill for resumability tests: the run
    stops *after committing* that round, and a later crawl() call picks
    up from the manifest.
    `header_bootstrap` (operators.projections.HeaderBootstrap) is the S4
    seam: refreshed at every round boundary (TTL-gated), its host→headers
    table is broadcast onto the round's eligible rows.
    `robots_fetcher`, when given, closes the robots loop LIVE: at each
    round boundary robots.txt is fetched (through that fetcher — same
    retry/timeout machinery as page fetches) for frontier domains not
    yet attempted, parsed via sources.robots.parse_robots, and unioned
    onto the static `robots` rules for the round's gate.  Static rules
    take precedence only in the trivial sense that both apply — the
    gate's longest-prefix match sees the union.
    Returns the final metrics dict (also persisted per round).
    """
    conf = conf or RoundConfig()
    totals: dict = {}
    robots_done: set[str] = set()
    live_robots_rows: list[tuple] = []

    boot_hosts = (
        [r.domain for r in budgets.select("domain").distinct().collect()]
        if header_bootstrap is not None
        else None
    )
    # budget table rows, collected ONCE (KB-scale): lets small rounds
    # fold budget accounting driver-side with zero Spark jobs.  In
    # adaptive mode the table is per-round STATE instead: re-read from
    # the last committed `budgets` delta on resume and re-collected
    # after each AIMD update.
    budgets_round = budgets
    if conf.adaptive_budgets and catalog.last_round >= 0:
        import os as _os_ab

        from .. import schema as _schema_ab

        bpath = catalog.delta_path("budgets", catalog.last_round)
        if _os_ab.path.isdir(bpath):
            budgets_round = spark.read.schema(_schema_ab.BUDGETS).parquet(bpath)
    budget_rows = budgets_round.select("domain", "capacity", "window_s").collect()
    # above this many scheduled rows the per-domain fold goes back to a
    # distributed job (driver-side DuckDB over the order partition would
    # otherwise read GBs on one node)
    BUDGET_LOCAL_MAX_ROWS = 5_000_000

    import os as _os
    import sys as _sys
    import time as _time

    _timing = bool(_os.environ.get("SPARK_GRAFT_ROUND_TIMING"))

    def _t(round_no, label, fn):
        t0 = _time.time()
        out = fn()
        if _timing:
            print(
                f"    [round {round_no}] {label}: {_time.time() - t0:.2f}s",
                file=_sys.stderr,
            )
        return out

    # Deferred-commit pipeline: round N's docs write (its biggest delta,
    # needed by nothing round N+1 compiles against) runs on a background
    # thread UNDER round N+1's serial driver work (Catalyst analysis +
    # codegen, measured ~12 s/round at 32 cores — the driver-bound side
    # of the scaling ratio).  All other writes stay strictly sequential
    # in the foreground (concurrent write JOBS measured 4x slower under
    # the shared local-mode scheduler); the only overlap is executor
    # work vs driver compile.  Round N's metrics row + manifest commit
    # happen when the future joins — before any N+1 WRITE — so the
    # manifest never commits a round whose deltas aren't all on disk
    # (crash ⇒ redo the uncommitted round; write_delta overwrites, so
    # the redo is idempotent — unchanged from today's crash story).
    pending: dict | None = None

    def _finalize_pending(final: bool = False) -> None:
        nonlocal pending
        if pending is None:
            return
        p, pending = pending, None
        p["counters"]["docs"] = _t(p["round_no"], "join docs write", p["join"])
        if final:
            # no later round overlapped the write tail — attribute it
            p["counters"]["wall_sec"] = round(_time.time() - p["t_round"], 3)
        catalog.write_metrics_row(p["round_no"], p["counters"])
        catalog.commit_round(p["round_no"], p["counters"])
        p["result"].unpersist()
        totals[p["round_no"]] = p["counters"]

    start = catalog.last_round + 1
    for round_no in range(start, max_rounds):
        t_round = _time.time()
        # committed counters already know if the frontier drained — no
        # isEmpty() job needed except for the un-counted seed round; an
        # uncommitted pending round's counters live in memory
        prev = (
            pending["counters"]
            if pending is not None and pending["round_no"] == round_no - 1
            else catalog.read_manifest().get("rounds", {}).get(str(round_no - 1))
        )
        frontier_path = catalog.delta_path("frontier", round_no)
        # explicit schemas on the per-round reads: schema inference costs
        # a driver-side footer scan per round (pure fixed cost), and at
        # scale a delta's schema is table metadata, never file footers
        from .. import schema as _schema

        frontier = spark.read.schema(_schema.FRONTIER).parquet(frontier_path)
        if prev is not None:
            if prev.get("frontier_next", 0) == 0:
                break
        elif frontier.isEmpty():
            break

        url_seen = catalog.read_table(spark, "url_seen", upto_round=round_no - 1)
        # seen-filter sidecar (bloom bitsets or cuckoo fingerprint
        # tables — same per-bucket delta lifecycle either way)
        sidecar_table = "bloom" if conf.seen_filter == "bloom" else "cuckoo"
        sidecar_schema = (
            _schema.BLOOM if conf.seen_filter == "bloom" else _schema.CUCKOO
        )
        sidecar = (
            spark.read.schema(sidecar_schema).parquet(
                catalog.delta_path(sidecar_table, round_no - 1)
            )
            if round_no > 0
            else None
        )

        boot_cfg = None
        if header_bootstrap is not None:
            # S4 scope: bootstrap every host this round may fetch —
            # budgeted domains PLUS domains discovered mid-crawl (the
            # reference bootstraps per visited host,
            # libs/playwright_driver.py:26-58; a budgets-only scope
            # would never bootstrap hosts that enter via out-links).
            # The collect is BOUNDED: TTL-fresh hosts are anti-joined
            # out and the rest capped to top-K by frontier mass
            # (bootstrap_hosts_for_round) — at most K rows reach the
            # driver however wide the frontier grows.
            round_hosts = set(
                bootstrap_hosts_for_round(frontier, header_bootstrap, round_no)
            )
            header_bootstrap.refresh(
                sorted(round_hosts.union(boot_hosts)), round_no
            )
            boot_cfg = header_bootstrap.config_df(spark)

        robots_round = robots
        if robots_fetcher is not None:
            from ..sources.robots import fetch_robots

            doms, new_rules = _t(round_no, "fetch robots", lambda: fetch_robots(
                frontier, robots_fetcher, agent=robots_agent,
                exclude=robots_done,
            ))
            robots_done.update(doms)
            live_robots_rows.extend(new_rules)
            if live_robots_rows:
                robots_round = robots.unionByName(
                    spark.createDataFrame(live_robots_rows, _schema.ROBOTS)
                )

        result: RoundResult = _t(round_no, "plan round", lambda: run_round(
            frontier, url_seen, sidecar, budgets_round, robots_round, fetcher,
            round_no, conf,
            fetch_size_hint=(prev or {}).get("frontier_next"),
            boot_config=boot_cfg,
        ))

        # the previous round's backgrounded docs write ran under this
        # round's plan compile; join + commit it before any write job
        _finalize_pending()

        # actions: write all deltas, then commit atomically (sequential —
        # measured: concurrent write jobs contend on the shared local-mode
        # scheduler/memory and run 4x slower than back-to-back; the ONLY
        # exception is the docs write, which is spawned LAST and overlaps
        # exclusively with the next round's driver compile).
        # Per-round Spark jobs: docs, round_log (seen ∪ order ∪
        # quarantine in ONE partitioned write), frontier, bloom,
        # budget_state — 5, down from 8; the metrics row is written
        # driver-side (pyarrow), and per-table counts ride on the two
        # big writes as Observations.
        log_counts = _t(round_no, "write round_log", lambda: catalog.write_round_log(result.round_log, round_no))
        n_next = _t(round_no, "write frontier", lambda: catalog.write_delta(
            result.frontier_next, "frontier", round_no + 1
        ))

        from pyspark.sql import functions as F

        # bloom + budget accounting both re-read the just-written (small)
        # round_log delta — partition-pruned by kind, column-pruned —
        # instead of re-executing the round lineage.  Small rounds fold
        # both on the DRIVER (DuckDB + numpy/pyarrow, bit-identical
        # kernels, zero Spark jobs); big rounds use the distributed path.
        log_round = catalog.read_round_log_delta(spark, round_no)
        prev_round = round_no - 1 if round_no > 0 else None
        if conf.seen_filter == "cuckoo":
            if log_counts["seen"] <= BUDGET_LOCAL_MAX_ROWS:
                _t(round_no, "write cuckoo (local)", lambda: (
                    catalog.write_cuckoo_local(
                        round_no, prev_round, conf.cuckoo_capacity
                    )
                ))
            else:
                from ..operators.cuckoo import build_cuckoo, merge_cuckoo

                seen_round = log_round.filter(F.col("kind") == "seen").select(
                    "url_hash", "bucket"
                )
                new_side = (
                    build_cuckoo(seen_round, conf.n_buckets, conf.cuckoo_capacity)
                    if sidecar is None
                    else merge_cuckoo(sidecar, seen_round, conf.cuckoo_capacity)
                )
                _t(round_no, "write cuckoo", lambda: catalog.write_delta(
                    new_side, "cuckoo", round_no
                ))
        elif log_counts["seen"] <= BUDGET_LOCAL_MAX_ROWS:
            _t(round_no, "write bloom (local)", lambda: catalog.write_bloom_local(
                round_no,
                prev_round,
                conf.m_bits,
            ))
        else:
            seen_round = log_round.filter(F.col("kind") == "seen").select(
                "url_hash", "bucket"
            )
            new_bloom = (
                build_bloom(seen_round, conf.n_buckets, conf.m_bits)
                if sidecar is None
                else merge_bloom(sidecar, seen_round, conf.n_buckets, conf.m_bits)
            )
            _t(round_no, "write bloom", lambda: catalog.write_delta(new_bloom, "bloom", round_no))

        # optional per-round incremental dedup: this round's docs delta
        # vs the accumulated corpus index (the 100 TB pipeline's
        # per-ingest dedup shape) — batch = the just-written docs delta
        # (re-read, so the round lineage isn't re-executed), history =
        # the committed index/signature deltas of earlier rounds
        # docs write: foreground when this round must read the delta
        # straight back (incremental dedup); otherwise backgrounded
        # under the NEXT round's driver compile (see pipeline note)
        n_docs = None
        n_neardup = None
        if conf.dedup_docs:
            n_docs = _t(round_no, "write docs", lambda: catalog.write_delta(
                result.docs, "docs", round_no
            ))
        if conf.dedup_docs and n_docs > 0:
            from ..operators.dedup import doc_text, incremental_neardup

            # repartition BEFORE the signature aggregation: the docs
            # delta is a handful of small parquet files, so the scan
            # comes back as 1-2 input partitions — and minhash's md5
            # work happens map-side in the partial agg, i.e. on those
            # few cores (measured: one task grinding 3+ min at 32
            # cores).  One narrow shuffle of the batch text buys full
            # parallelism for the 16x-md5-per-shingle hot loop.
            batch = (
                spark.read.schema(_schema.DOCS)
                .parquet(catalog.delta_path("docs", round_no))
                .select("doc_id", doc_text().alias("text"))
                .repartition(conf.n_partitions)
            )
            dd = incremental_neardup(
                batch,
                catalog.read_table(spark, "dedup_index", upto_round=round_no - 1),
                catalog.read_table(spark, "dedup_sigs", upto_round=round_no - 1),
                min_common=conf.dedup_min_common,
                bucket_cap=conf.dedup_bucket_cap,
                persist_fn=lambda df: df.localCheckpoint(eager=False),
            )
            n_neardup = _t(round_no, "write neardup", lambda: catalog.write_delta(
                dd["matches"], "neardup", round_no
            ))
            _t(round_no, "write dedup_index", lambda: catalog.write_delta(
                dd["index_delta"], "dedup_index", round_no
            ))
            _t(round_no, "write dedup_sigs", lambda: catalog.write_delta(
                dd["sigs_delta"], "dedup_sigs", round_no
            ))
            for df in (dd["index_delta"], dd["sigs_delta"]):
                df.unpersist()

        counters = {
            "scheduled": log_counts["order"],
            "docs": n_docs,
            "new_seen": log_counts["seen"],
            "quarantined": log_counts["quarantine"],
            "frontier_next": n_next,
            "wall_sec": round(_time.time() - t_round, 3),
        }
        if n_neardup is not None:
            counters["neardup_matches"] = n_neardup
        # A3/A4: budget accounting delta (the reference's batch
        # success/fail counters and APIKeyPool folds, round-wise — see
        # operators.scheduling.budget_accounting); the metrics row is
        # written at commit time (it needs the docs count)
        from ..operators.scheduling import budget_accounting

        if log_counts["order"] <= BUDGET_LOCAL_MAX_ROWS:
            _t(round_no, "write budget_state (local)", lambda: (
                catalog.write_budget_state_row_local(round_no, budget_rows)
            ))
        else:
            scheduled = log_round.filter(F.col("kind") == "order").select("domain")
            _t(round_no, "write budget_state", lambda: catalog.write_delta(
                budget_accounting(budgets_round, scheduled, round_no),
                "budget_state",
                round_no,
            ))

        if conf.adaptive_budgets:
            # AIMD update: this round's fetch outcomes → next round's
            # capacities, written as the round's `budgets` delta (KB —
            # one row per domain) so the evolved table is crawl state a
            # resume picks up.  Outcomes are a deterministic pure
            # function of the url (md5-derived latency draw in
            # [50, 2050), ~15 % error rate — the live-fetch path would
            # feed measured latency/status through the same log shape),
            # so re-running a crashed round reproduces the identical
            # next-capacity table.
            from ..operators.profiling import adaptive_budget
            from ..xhash import md5_64

            fetch_log = log_round.filter(F.col("kind") == "order").select(
                "domain",
                "url",
                (
                    F.lit(50)
                    + F.pmod(
                        md5_64(F.concat(F.lit("lat:"), F.col("url"))), F.lit(2000)
                    )
                ).cast("long").alias("latency_ms"),
                (
                    F.pmod(md5_64(F.concat(F.lit("ok:"), F.col("url"))), F.lit(100))
                    >= F.lit(15)
                ).alias("ok"),
            )
            upd = adaptive_budget(fetch_log, budgets_round)
            nxt = (
                upd.select("domain", F.col("next_capacity").alias("capacity"))
                .join(
                    budgets_round.select("domain", "window_s", "reset_ts"),
                    "domain",
                )
                .select("domain", "capacity", "window_s", "reset_ts")
            )
            _t(round_no, "write budgets (adaptive)", lambda: catalog.write_delta(
                nxt, "budgets", round_no
            ))
            # read the delta back (truncates lineage — identical to what
            # a resume at round_no+1 would read) and re-collect the
            # KB-scale row cache
            budgets_round = spark.read.schema(_schema.BUDGETS).parquet(
                catalog.delta_path("budgets", round_no)
            )
            budget_rows = budgets_round.select(
                "domain", "capacity", "window_s"
            ).collect()
            counters["capacity_total"] = int(
                sum(r.capacity for r in budget_rows)
            )

        if n_docs is not None:
            # docs already on disk (dedup mode) — commit inline
            catalog.write_metrics_row(round_no, counters)
            catalog.commit_round(round_no, counters)
            _t(round_no, "unpersist", result.unpersist)
            totals[round_no] = counters
        else:
            # spawn the docs write LAST (all foreground writes done) so
            # it overlaps only the next round's serial driver compile.
            # Every checkpoint except the docs write's own input is
            # consumed by now — release them BEFORE the overlap window
            # so two rounds' block sets never coexist (measured as a
            # 25%-of-runtime GC storm at 32 threads when they did)
            result.unpersist_light()
            from pyspark import InheritableThread

            box: dict = {}

            def _write_docs(res=result, rn=round_no, out=box) -> None:
                try:
                    out["n"] = catalog.write_delta(res.docs, "docs", rn)
                except BaseException as exc:  # noqa: BLE001 — re-raised on join
                    out["exc"] = exc

            th = InheritableThread(target=_write_docs, daemon=True)
            th.start()

            def _join(t=th, out=box) -> int:
                t.join()
                if "exc" in out:
                    raise out["exc"]
                return out["n"]

            pending = {
                "round_no": round_no,
                "counters": counters,
                "join": _join,
                "result": result,
                "t_round": t_round,
            }

        if stop_after_round is not None and round_no >= stop_after_round:
            break
    _finalize_pending(final=True)
    return totals
