"""Physical-plan assertions: the properties that matter at 100 TB
(pushdown, broadcast, salting, codegen) are checked on the actual plans
so regressions are caught, not eyeballed."""

from __future__ import annotations

from pyspark.sql import functions as F

from newscrawler_spark import synth
from newscrawler_spark.operators.scheduling import budget_gate, salt_domains


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().toString()


def test_parquet_filter_and_column_pushdown(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("lang") == "en")
        .select("doc_id", "lang")
    )
    plan = _plan(df)
    assert "PushedFilters: [EqualTo(lang,en)]" in plan
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan  # pruned


def test_budget_gate_broadcasts_budgets(spark):
    cand = synth.synth_frontier(spark, 100).withColumn("crawl_delay_s", F.lit(0.0))
    budgets = synth.synth_budgets(spark, 10)
    eligible, _ = budget_gate(cand, budgets)
    assert "BroadcastHashJoin" in _plan(eligible)


def test_salt_domains_spreads_mega_host(spark):
    # one domain, 2000 rows: without salting all rows land in one
    # partition of a domain-hash repartition; with salt they spread
    df = spark.range(2000).select(
        F.concat(F.lit("https://mega.host/a/"), F.col("id")).alias("url"),
        F.lit("mega.host").alias("domain"),
    )
    salted = salt_domains(df, n_partitions=16, salt_factor=8)
    n_parts = (
        salted.withColumn("pid", F.spark_partition_id())
        .select("pid")
        .distinct()
        .count()
    )
    assert n_parts >= 4  # 8 salts over 16 partitions → ≥4 distinct in practice


def test_url_identity_stays_whole_stage_codegen(spark):
    # the hot canonicalization chain (regex CASE dispatch, splits) must
    # stay inside whole-stage codegen; higher-order-function ops
    # (textops lambdas) are expression-level fallback by Spark design
    from newscrawler_spark.canonical import with_url_identity

    out = with_url_identity(synth.synth_frontier(spark, 10))
    # '*(n)' prefixes mark operators inside a WholeStageCodegen stage
    assert _plan(out).startswith("*(")
