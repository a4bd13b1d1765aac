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
) -> dict:
    """Run crawl rounds until the frontier drains or max_rounds.

    `stop_after_round` simulates a kill for resumability tests: the run
    stops *after committing* that round, and a later crawl() call picks
    up from the manifest.
    Returns the final metrics dict (also persisted per round).
    """
    conf = conf or RoundConfig()
    totals: dict = {}

    start = catalog.last_round + 1
    for round_no in range(start, max_rounds):
        import time as _time

        t_round = _time.time()
        # committed counters already know if the frontier drained — no
        # isEmpty() job needed except for the un-counted seed round
        prev = catalog.read_manifest().get("rounds", {}).get(str(round_no - 1))
        frontier_path = catalog.delta_path("frontier", round_no)
        frontier = spark.read.parquet(frontier_path)
        if prev is not None:
            if prev.get("frontier_next", 0) == 0:
                break
        elif frontier.isEmpty():
            break

        url_seen = catalog.read_table(spark, "url_seen", upto_round=round_no - 1)
        bloom = (
            spark.read.parquet(catalog.delta_path("bloom", round_no - 1))
            if round_no > 0
            else None
        )

        result: RoundResult = run_round(
            frontier, url_seen, bloom, budgets, robots, fetcher, round_no, conf,
            fetch_size_hint=(prev or {}).get("frontier_next"),
        )

        # actions: write all deltas, then commit atomically (sequential —
        # measured: concurrent write jobs contend on the shared local-mode
        # scheduler/memory and run 4x slower than back-to-back)
        n_docs = catalog.write_delta(result.docs, "docs", round_no)
        n_seen = catalog.write_delta(result.seen_delta, "url_seen", round_no)
        n_quar = catalog.write_delta(result.quarantine, "quarantine", round_no)
        n_order = catalog.write_delta(result.fetch_order, "fetch_order", round_no)
        n_next = catalog.write_delta(
            result.frontier_next, "frontier", round_no + 1
        )

        seen_round = spark.read.parquet(catalog.delta_path("url_seen", round_no))
        new_bloom = (
            build_bloom(seen_round, conf.n_buckets, conf.m_bits)
            if bloom is None
            else merge_bloom(bloom, seen_round, conf.n_buckets, conf.m_bits)
        )
        catalog.write_delta(new_bloom, "bloom", round_no)

        counters = {
            "scheduled": n_order,
            "docs": n_docs,
            "new_seen": n_seen,
            "quarantined": n_quar,
            "frontier_next": n_next,
            "wall_sec": round(_time.time() - t_round, 3),
        }
        # A3/A4: per-round metrics row + budget accounting delta (the
        # reference's batch success/fail counters and APIKeyPool folds,
        # round-wise — see operators.scheduling.budget_accounting)
        from pyspark.sql import functions as F

        from ..operators.scheduling import budget_accounting

        metrics_row = spark.createDataFrame(
            [
                (
                    round_no,
                    n_order,
                    n_docs,
                    n_quar,
                    n_seen,
                    n_next,
                )
            ],
            "round int, scheduled long, docs long, quarantined long, "
            "new_seen long, frontier_next long",
        )
        catalog.write_delta(metrics_row, "metrics", round_no)
        catalog.write_delta(
            budget_accounting(budgets, result.fetch_order, round_no),
            "budget_state",
            round_no,
        )
        catalog.commit_round(round_no, counters)
        result.unpersist()
        totals[round_no] = counters

        if stop_after_round is not None and round_no >= stop_after_round:
            break
    return totals
