"""spark-submit entry point for the crawl engine.

Cluster usage (the north-rule deployment shape):

  zip -r newscrawler_spark.zip newscrawler_spark/
  spark-submit --py-files newscrawler_spark.zip scripts/submit_crawl.py \\
      --catalog s3a://bucket/crawl --seeds s3a://bucket/seeds.parquet \\
      --pages s3a://bucket/pages.parquet --rounds 10 --partitions 4096

Sandbox smoke (synthetic web, local mode):

  python scripts/submit_crawl.py --synthetic 10000 --rounds 3 \\
      --catalog /tmp/crawl_run

On a real cluster, drop ``--synthetic``/``--pages`` and the fetch stage
switches to the live HttpFetcher (mapInPandas over URL batches).
Executor/core counts come from spark-submit (--num-executors etc.); the
N vs 4N scaling comparison is two invocations of this script.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True, help="catalog root (snapshots live here)")
    ap.add_argument("--seeds", help="parquet of frontier-schema seed rows")
    ap.add_argument("--pages", help="parquet fixture web (offline fetch); omit for live HTTP")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate an N-URL synthetic web instead of --seeds/--pages")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--partitions", type=int, default=None,
                    help="shuffle/fetch partitions (default 2x cores)")
    ap.add_argument("--buckets", type=int, default=64, help="seen-set hash buckets")
    ap.add_argument("--bloom-bits", type=int, default=1 << 22, help="bloom bits per bucket")
    ap.add_argument("--capacity", type=int, default=100, help="default per-domain budget/round")
    ap.add_argument("--budgets", help="parquet of per-domain politeness budgets (schema.BUDGETS); default synthetic")
    ap.add_argument("--robots", help="parquet of robots rules (schema.ROBOTS); default synthetic; live fetch overrides per round")
    ap.add_argument("--live-robots", action="store_true",
                    help="fetch robots.txt for frontier domains through the engine's own fetch stage each round")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from newscrawler_spark import synth
    from newscrawler_spark.plans.crawl_round import RoundConfig
    from newscrawler_spark.plans.scheduler import crawl, seed_frontier
    from newscrawler_spark.session import tune
    from newscrawler_spark.sources.catalog import Catalog
    from newscrawler_spark.sources.fetch import FixtureFetcher, HttpFetcher

    # under spark-submit the session/config comes from the submit command;
    # standalone (sandbox) falls back to a local session
    spark = tune(SparkSession.builder.appName("newscrawler-crawl").getOrCreate())
    cores = spark.sparkContext.defaultParallelism
    n_partitions = args.partitions or max(8, 2 * cores)

    cat = Catalog(args.catalog)
    if args.synthetic:
        seeds = synth.synth_frontier(spark, args.synthetic)
        fetcher = FixtureFetcher(synth.synth_pages(spark, args.synthetic))
        budgets = synth.synth_budgets(spark, capacity_default=args.capacity)
        robots = synth.synth_robots(spark)
    else:
        if not args.seeds:
            ap.error("--seeds required without --synthetic")
        seeds = spark.read.parquet(args.seeds)
        fetcher = (
            FixtureFetcher(spark.read.parquet(args.pages)) if args.pages else HttpFetcher()
        )
        budgets = (
            spark.read.parquet(args.budgets)
            if args.budgets
            else synth.synth_budgets(spark, capacity_default=args.capacity)
        )
        robots = (
            spark.read.parquet(args.robots)
            if args.robots
            else synth.synth_robots(spark)
        )

    seed_frontier(cat, seeds)
    totals = crawl(
        spark,
        cat,
        fetcher,
        budgets,
        robots,
        max_rounds=args.rounds,
        conf=RoundConfig(
            n_buckets=args.buckets, m_bits=args.bloom_bits, n_partitions=n_partitions
        ),
        robots_fetcher=fetcher if args.live_robots else None,
    )
    print(json.dumps({"rounds": totals, "catalog": args.catalog}))


if __name__ == "__main__":
    main()
