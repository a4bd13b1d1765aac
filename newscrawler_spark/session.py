"""SparkSession factory for the engine.

Local-mode knobs are sized for the sandbox (local[N] threads, single JVM);
cluster deployment would drop the master/memory overrides and keep the SQL
conf — everything else (partition counts, AQE, Arrow) is cluster-relevant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "newscrawler_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS (driver contract) else 32.
    ``shuffle_partitions`` defaults to 2x cores — small enough to avoid
    tiny-task overhead at sandbox scale, and AQE coalesces further; on a
    real cluster this would be sized to total cores.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(8, 2 * cores)
    # resolved once so -Xms below always equals -Xmx, even when the
    # caller overrides the heap via SPARK_DRIVER_MEM or extra_conf
    driver_mem = os.environ.get(
        "SPARK_DRIVER_MEM", f"{min(48, max(16, 3 * cores))}g"
    )
    if extra_conf and "spark.driver.memory" in extra_conf:
        driver_mem = extra_conf["spark.driver.memory"]

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Heap scales WITH the core budget (3 GB/core, capped at 48g —
        # the cluster model: an executor's spark.executor.memory is
        # provisioned per its cores, so a 4x-bigger cluster brings 4x
        # the RAM).  A fixed-size heap makes small-core runs unfairly
        # fast in N-vs-4N scaling comparisons: with 48g at both widths,
        # local[8] ran with 4x the heap per core, so its young-GC
        # frequency was 1/4 — measured as GC wall 24% of the 32-thread
        # run vs 6.5% of the 8-thread run on identical work.  The cap
        # matters as much as the scaling: an UNDERSIZED -Xms with a big
        # -Xmx let the heap expand continuously under the 32-thread
        # allocation rate, and first-touch page faults put the host at
        # 63-77% KERNEL time during the extract phase (measured via
        # top); -Xms=-Xmx below pins the heap so pages fault once.
        .config("spark.driver.memory", driver_mem)
        # Throughput GC for the batch-shaped local JVM: an event-log
        # audit of a 32-thread crawl measured JVM GC at 17% of executor
        # run time under default G1 (pause-target-oriented) — at 4x the
        # allocation rate of the 8-thread run this is a direct scaling
        # tax.  Parallel GC trades pause latency (irrelevant here) for
        # throughput; on a cluster the same flag rides
        # spark.executor.extraJavaOptions.  ParallelGCThreads is sized
        # to the core budget: the JVM defaults it from HOST cpus (23 on
        # this 32-cpu box), which would hand a local[8] run 23 GC
        # threads — a real 8-core executor host gets 8.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_GC",
                f"-XX:+UseParallelGC -XX:ParallelGCThreads={cores} "
                # -Xms = -Xmx: never expand the heap at runtime (see the
                # driver.memory note — expansion page-faults measured as
                # a 63-77% kernel-time storm at 32 threads)
                f"-Xms{driver_mem} "
                # AlwaysPreTouch: fault every heap page in at JVM start
                # instead of on first allocation.  -Xms alone only
                # RESERVES the range; first-touch faults still land in
                # the middle of the 32-thread extract phase.  Measured
                # A/B on the 400k-seed crawl (identical outputs):
                # 218.6 s -> 158.8 s wall, steady 8,826 -> 11,901 urls/s.
                # Alternatives measured WORSE on the same matrix:
                # -Xmn8g 231 s (young too small at this alloc rate),
                # G1+pretouch 192 s (pause-target GC taxes throughput).
                "-XX:+AlwaysPreTouch",
            ),
        )
        .config("spark.ui.enabled", "false")
        # floor on file-scan splits: CPU-heavy expressions fused into a
        # parquet scan (simhash's 60-bit fold, curation regexes) are
        # otherwise bound by file split count — a 35 MB table is 1-2
        # splits under the 128 MB default, serializing the compute on a
        # 32-core box.  A FLOOR (not a smaller maxPartitionBytes) is
        # the scale-safe form: at 100 TB the natural split count dwarfs
        # it and the knob is inert
        .config("spark.sql.files.minPartitionNum", str(2 * cores))
        # the floor is computed as max(openCostInBytes, bytes/minPartitionNum),
        # so the 4 MB default open-cost re-serializes any table under
        # 4 MB x minPartitionNum; 64 KB keeps the floor effective while
        # still packing genuinely tiny files together
        .config("spark.sql.files.openCostInBytes", "65536")
        # deterministic outputs: never let timezone/locale leak into results
        .config("spark.sql.datetime.java8API.enabled", "true")
        # constraint propagation explodes exponentially on our aliased
        # 11-branch CASE identity expressions when they become join keys
        # (3.2 MB optimized plans, minutes of janino time); disabling it
        # keeps plans ~KB-sized with no semantic change (tune() below has
        # the measurements)
        .config("spark.sql.constraintPropagation.enabled", "false")
        # lz4 serialized-RDD blocks: only consulted by _SER storage
        # levels (the round-checkpoint knob below); shuffle/broadcast
        # compression are separate confs and already default-on.  Text-
        # heavy checkpoint rows compress ~5x, trading abundant CPU for
        # the scarce resource at high thread counts — memory bandwidth
        .config("spark.rdd.compress", "true")
    )
    # benchmarking escape hatch: JSON dict of session confs applied
    # before caller extras (callers stay authoritative) — lets A/B
    # harnesses vary e.g. spark.io.compression.codec without plumbing
    # parameters through every runner
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    if env_conf:
        import json

        for k, v in json.loads(env_conf).items():
            builder = builder.config(k, str(v))
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def tune(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-mutable SQL confs to an externally
    created session (the driver harness owns its own SparkSession).

    constraintPropagation: with it on, composing the url-identity CASE
    chains (11-platform detect/article-id) into a join key made Catalyst
    inline aliases into inferred constraints multiplicatively — a 6.7 KB
    plan became 3.2 MB and one 500-row anti-join took 100+ s of janino
    compile time.  Off: 14 KB plan, 3.6 s.  No result change (it only
    prunes an optional inference rule).

    shuffle.partitions/AQE: an untuned external session keeps Spark's
    200 default — at verification scale that is 200 near-empty tasks
    per Exchange (and 200 state-store instances per stateful streaming
    query).  2x total cores + AQE coalesce is the engine's sizing; both
    confs are runtime-mutable, and on a real cluster the same call
    sizes them to executor count.  None of these change results.
    """
    cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(max(8, 2 * cores)))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.files.minPartitionNum", str(2 * cores))
    spark.conf.set("spark.sql.files.openCostInBytes", "65536")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark
