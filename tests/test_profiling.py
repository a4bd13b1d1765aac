"""Exact quantiles + AIMD adaptive politeness budgets."""

from __future__ import annotations

from pyspark.sql import functions as F

from newscrawler_spark.operators import profiling as PF


def test_length_quantiles_exact_order_statistics(spark):
    # stratum a: values 1..10 → p50 = ceil(5)th = 5, p90 = 9, p99 = 10
    # stratum b: single value → all quantiles equal it
    rows = [(i, "a", i + 1) for i in range(10)] + [(99, "b", 7)]
    docs = spark.createDataFrame(rows, "doc_id LONG, source STRING, n_chars LONG")
    got = {r.stratum: r for r in PF.length_quantiles(docs).collect()}
    assert (got["a"].n, got["a"].p50, got["a"].p90, got["a"].p99) == (10, 5, 9, 10)
    assert (got["b"].n, got["b"].p50, got["b"].p90, got["b"].p99) == (1, 7, 7, 7)


def test_length_quantiles_tie_values(spark):
    docs = spark.createDataFrame(
        [(i, "a", 5) for i in range(20)], "doc_id LONG, source STRING, n_chars LONG"
    )
    r = PF.length_quantiles(docs).collect()[0]
    assert (r.p50, r.p90, r.p99) == (5, 5, 5)


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "domain STRING, url STRING, latency_ms LONG, ok BOOLEAN"
    )


def _budgets(spark, rows):
    return spark.createDataFrame(rows, "domain STRING, capacity INT")


def test_adaptive_budget_aimd_branches(spark):
    log = _log(
        spark,
        # healthy host: fast, no errors → +1
        [("good.com", f"u{i}", 100, True) for i in range(10)]
        # error-heavy host: 5/10 errors → halve
        + [("errs.com", f"u{i}", 100, i % 2 == 0) for i in range(10)]
        # slow host: p90 over threshold → halve
        + [("slow.com", f"u{i}", 5000, True) for i in range(10)],
    )
    budgets = _budgets(
        spark,
        [("good.com", 8), ("errs.com", 8), ("slow.com", 8), ("idle.com", 8)],
    )
    got = {r.domain: r for r in PF.adaptive_budget(log, budgets).collect()}
    assert got["good.com"].next_capacity == 9
    assert got["errs.com"].next_capacity == 4
    assert got["errs.com"].err_bp == 5000
    assert got["slow.com"].next_capacity == 4
    assert got["slow.com"].p90_latency == 5000
    # no evidence → unchanged
    assert got["idle.com"].next_capacity == 8
    assert got["idle.com"].n_fetches == 0


def test_adaptive_budget_caps(spark):
    log = _log(
        spark,
        [("max.com", "u", 10, True), ("min.com", "u", 9000, True)],
    )
    budgets = _budgets(spark, [("max.com", PF.CAP_MAX), ("min.com", 1)])
    got = {r.domain: r for r in PF.adaptive_budget(log, budgets).collect()}
    assert got["max.com"].next_capacity == PF.CAP_MAX   # additive increase capped
    assert got["min.com"].next_capacity == PF.CAP_MIN   # halving floored


def test_adaptive_budget_p90_is_exact_rank(spark):
    # latencies 1..10 → p90 = value at ceil(9) = 9
    log = _log(spark, [("d.com", f"u{i}", i + 1, True) for i in range(10)])
    budgets = _budgets(spark, [("d.com", 4)])
    r = PF.adaptive_budget(log, budgets).collect()[0]
    assert r.p90_latency == 9
    assert r.next_capacity == 5
