"""Web-graph and revisit analytics: the crawl-frontier intelligence a
web-scale crawler runs OVER its own output — host-level link centrality
(frontier prioritization), anchor-text aggregation (target-page signal),
crawl-trap detection (URL-space explosion guard), and adaptive recrawl
scheduling (change-rate estimation à la Cho & Garcia-Molina).

Reference parallel: NewsCrawler crawls a fixed configured site list
(news_crawler/core/crawler.py's per-platform loops) and has no
graph-level feedback; these operators are what the same pipeline needs
once the frontier is discovered rather than configured — re-expressed
as Spark-native distributed stages.

Cross-engine rules (see queries.py module docstring): md5_64 hashes,
integer arithmetic end-to-end (PageRank runs in fixed-point BIGINT
micro-units so summation is ORDER-INDEPENDENT — bit-identical at any
partitioning, which also makes speculative re-execution safe), ratios
rounded to 6 places, identical aliases both sides.

Scale notes are per-docstring; the common theme: per-host/per-domain
aggregates are two-stage (map-side partial combine), iteration counts
are fixed and small (plan depth is static), and nothing collects
row-scale data to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- host_rank fixed-point constants ----------------------------------------
# 1.0 of rank mass = 10^9 micro-units (BIGINT).  Bound: even if ALL of a
# 10^8-host graph's mass (10^8 * 10^9 = 10^17) concentrated on one host,
# damping_pct * rank = 8.5e18 < 2^63 — no overflow at any skew.
RANK_SCALE = 10**9
RANK_DAMP_PCT = 85      # damping factor as integer percent
RANK_ITERS = 3          # fixed unrolled iterations (static plan depth)

# --- trap_detect thresholds ---------------------------------------------------
TRAP_QUERY_MAX = 0.50       # > half the domain's URLs carry a query string
TRAP_DEPTH_MAX = 12         # path depth beyond any sane article hierarchy
TRAP_MIN_URLS = 100         # explosion needs volume; small hosts never flag

# --- recrawl_schedule buckets -------------------------------------------------
# change_ratio -> revisit interval (hours).  Integer bucketing instead of
# the continuous -ln(1-r) Poisson estimator keeps the result exact across
# engines (libm vs JVM log differ in ULPs); the bucket edges follow the
# same monotone shape.
RECRAWL_BUCKETS = [  # (min_ratio_inclusive, interval_hours)
    (0.75, 1),
    (0.50, 4),
    (0.25, 12),
    (0.000001, 24),
    (0.0, 72),
]


# ---------------------------------------------------------------------------
# 1. Host-level link centrality (fixed-point PageRank)
# ---------------------------------------------------------------------------

def host_rank(
    edges: DataFrame,
    n_iter: int = RANK_ITERS,
    damping_pct: int = RANK_DAMP_PCT,
    scale: int = RANK_SCALE,
) -> DataFrame:
    """PageRank over the host graph in fixed-point integer arithmetic.

    Input: ``edges(src_host, dst_host)`` — one row per link (multi-edges
    count as weight).  Output per host: ``out_degree`` (BIGINT, 0 for
    pure sinks), ``rank`` (BIGINT micro-units after ``n_iter``
    iterations), ``rank_norm`` (rank / scale, rounded 6).

    Every rank is a BIGINT multiple of one micro-unit; the per-iteration
    update is

        contrib(src)  = rank[src] // out_degree[src]     (integer div)
        rank'[dst]    = (100-d)% * scale // 100
                        + d% * sum(contrib over in-edges) // 100

    Integer division deliberately drops sub-micro-unit mass (dangling
    hosts drop theirs entirely) — the loss is deterministic and the sum
    is associative+commutative over BIGINTs, so the result is
    bit-identical at any partitioning, executor count, or retry
    history.  Floating-point PageRank cannot promise that.

    Scale: hosts are ~10^7-10^8 while edges are ~10^10-10^11, so the
    rank table is 3-4 orders smaller than the edge table.  Each
    iteration is one shuffle-join of edges⋈ranks on src (AQE handles
    hub skew; the rank side is host-level and may even broadcast at the
    low end) followed by one two-stage sum by dst with map-side partial
    aggregation.  Iterations are unrolled into one static plan
    (``n_iter`` is small and fixed); for long chains checkpoint every
    few iterations to cut lineage.
    """
    edges = edges.select("src_host", "dst_host")
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .unionByName(edges.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    outdeg = edges.groupBy(F.col("src_host").alias("host")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    nodes = nodes.join(outdeg, "host", "left").select(
        "host", F.coalesce("out_degree", F.lit(0)).cast("long").alias("out_degree")
    )

    base = (100 - damping_pct) * scale // 100
    ranks = nodes.select("host", F.lit(scale).cast("long").alias("rank"))
    for _ in range(n_iter):
        # `div` is Spark's integral division — exact on BIGINT, unlike
        # `/` (double), whose 53-bit mantissa would corrupt large ranks
        contrib = (
            edges.join(ranks.join(outdeg, "host"), edges.src_host == F.col("host"))
            .select(
                F.col("dst_host").alias("host"),
                F.expr("rank div out_degree").alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("incoming"))
        )
        ranks = (
            nodes.select("host")
            .join(contrib, "host", "left")
            .select(
                "host",
                F.expr(
                    f"CAST({base} + ({damping_pct} * coalesce(incoming, 0)) div 100"
                    " AS BIGINT)"
                ).alias("rank"),
            )
        )
    return nodes.join(ranks, "host").select(
        "host",
        "out_degree",
        F.col("rank").cast("long").alias("rank"),
        F.round(F.col("rank") / F.lit(float(scale)), 6).alias("rank_norm"),
    )


def rank_prioritize(
    frontier: DataFrame,
    host_ranks: DataFrame,
    hi: int = 2 * RANK_SCALE,
    lo: int = RANK_SCALE,
) -> DataFrame:
    """Centrality-aware frontier priority: refine each URL's existing
    ``priority`` band with its host's rank tier, so within a band the
    scheduler (RANK_ORDER sorts priority ASC first) visits central
    hosts before the long tail.

    Tiers use STATIC thresholds on the fixed-point rank — ``hi``
    (≥ 2× average mass → tier 0), ``lo`` (≥ average → tier 1), else
    tier 2; unranked hosts (not in the graph yet) get the middle tier 1
    so cold-start hosts are neither starved nor favored.  Static
    thresholds instead of quantiles keep this a pure join + expression:
    no global sort, no driver collect, same answer at any parallelism.

        new_priority = old_priority * 3 + tier

    is monotone in the original priority (band order is preserved
    exactly) and uses centrality only WITHIN a band.

    Scale: host_ranks is host-level (3-4 orders smaller than the
    frontier) — broadcast it when it fits, else a plain shuffle join on
    ``domain``; downstream politeness/budget stages are unchanged.
    """
    ranks = host_ranks.select(F.col("host").alias("domain"), "rank")
    tier = (
        F.when(F.col("rank") >= F.lit(hi), F.lit(0))
        .when(F.col("rank") >= F.lit(lo), F.lit(1))
        .when(F.col("rank").isNotNull(), F.lit(2))
        .otherwise(F.lit(1))
    )
    return (
        frontier.join(ranks, "domain", "left")
        .withColumn("priority", (F.col("priority") * 3 + tier).cast("int"))
        .drop("rank")
    )


# ---------------------------------------------------------------------------
# 2. Anchor-text aggregation per target host
# ---------------------------------------------------------------------------

def anchor_stats(links: DataFrame) -> DataFrame:
    """Per-target anchor-text signal: in-degree, distinct anchor texts,
    and the dominant anchor (highest count; ties broken by the
    lexicographically GREATEST anchor — the deterministic max-struct
    order, identical in both engines).

    Input: ``links(dst_host, anchor)``.  Output: ``dst_host, n_links,
    n_anchors, top_anchor, top_anchor_count``.

    Scale: two chained hash aggregates, each with map-side partial
    combine — groupBy(dst, anchor).count() then groupBy(dst).max(
    struct(count, anchor)).  No window function, so a mega-target
    (everyone links to the same homepage with the same anchor) never
    funnels raw rows through one task: the first aggregate collapses
    duplicates map-side before any shuffle.
    """
    per_anchor = links.groupBy("dst_host", "anchor").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        per_anchor.groupBy("dst_host")
        .agg(
            F.sum("cnt").cast("long").alias("n_links"),
            F.count(F.lit(1)).cast("long").alias("n_anchors"),
            F.max(F.struct(F.col("cnt"), F.col("anchor"))).alias("top"),
        )
        .select(
            "dst_host",
            "n_links",
            "n_anchors",
            F.col("top.anchor").alias("top_anchor"),
            F.col("top.cnt").cast("long").alias("top_anchor_count"),
        )
    )


# ---------------------------------------------------------------------------
# 3. Crawl-trap detection (URL-space explosion per domain)
# ---------------------------------------------------------------------------

def trap_detect(
    frontier: DataFrame,
    query_max: float = TRAP_QUERY_MAX,
    depth_max: int = TRAP_DEPTH_MAX,
    min_urls: int = TRAP_MIN_URLS,
) -> DataFrame:
    """Per-domain URL-shape statistics with an explosion flag.

    Calendars, session-id links, and faceted-search pages generate
    unbounded URL spaces.  Flag signature: a domain with ``n_urls >=
    min_urls`` whose query-string ratio exceeds ``query_max``
    (session/facet spam) OR whose max path depth exceeds ``depth_max``
    (recursive path traps).  A HIGH distinct-path ratio is deliberately
    NOT a flag criterion — every article on a normal news site is a
    unique path — but the ratio is reported, because its growth ACROSS
    rounds (new URLs keep arriving, none ever repeats) is the signal a
    multi-round controller should watch.

    Input: ``frontier(url, domain)``.  Output per domain: ``n_urls,
    n_query, query_ratio, n_paths, distinct_path_ratio, max_depth,
    flagged``.

    Path/query split is pure regexp on the JVM (no UDF); the aggregate
    is two-stage (distinct paths via a first groupBy(domain, path) —
    map-side combine collapses repeats before the shuffle).  At
    10^10-URL frontiers this is the cheap guard that runs BEFORE
    politeness scheduling each round; flagged domains feed the same
    quarantine channel robots denials use.
    """
    path = F.regexp_replace(F.col("url"), r"^[a-z]+://[^/]*", "")
    parts = frontier.select(
        "domain",
        F.regexp_replace(path, r"\?.*$", "").alias("path"),
        F.when(F.col("url").rlike(r"\?"), F.lit(1)).otherwise(F.lit(0)).alias("has_q"),
    )
    per_path = parts.groupBy("domain", "path").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("has_q").alias("q"),
        F.max(F.size(F.split(F.col("path"), "/")) - 1).alias("depth"),
    )
    stats = per_path.groupBy("domain").agg(
        F.sum("cnt").cast("long").alias("n_urls"),
        F.sum("q").cast("long").alias("n_query"),
        F.count(F.lit(1)).cast("long").alias("n_paths"),
        F.max("depth").cast("long").alias("max_depth"),
    )
    query_ratio = F.round(F.col("n_query") / F.col("n_urls"), 6)
    distinct_ratio = F.round(F.col("n_paths") / F.col("n_urls"), 6)
    return stats.select(
        "domain",
        "n_urls",
        "n_query",
        query_ratio.alias("query_ratio"),
        "n_paths",
        distinct_ratio.alias("distinct_path_ratio"),
        "max_depth",
        (
            (F.col("n_urls") >= F.lit(min_urls))
            & (
                (query_ratio > F.lit(query_max))
                | (F.col("max_depth") > F.lit(depth_max))
            )
        ).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# 4. Adaptive recrawl scheduling (change-rate estimation)
# ---------------------------------------------------------------------------

def recrawl_schedule(visits: DataFrame) -> DataFrame:
    """Estimate per-URL change rate from revisit history and assign the
    next revisit interval (Cho & Garcia-Molina-style freshness
    scheduling, bucketed to integer hours for cross-engine exactness —
    see RECRAWL_BUCKETS).

    Input: ``visits(url_id, ts_epoch, content_fp)`` — one row per past
    fetch with a content fingerprint (rolling_fingerprint / md5 of the
    extracted text).  A "change" is a fingerprint different from the
    previous visit's (visits ordered by ``ts_epoch, content_fp`` — the
    fp tiebreak makes equal-timestamp histories deterministic).

    Output per url: ``n_visits, n_changes, change_ratio`` (rounded 6,
    0.0 for single-visit urls), ``interval_hours``, ``next_fetch_epoch
    = last ts + interval``.

    Scale: the lag() window partitions BY URL — per-URL revisit
    histories are dozens of rows at most (bounded by crawl policy), so
    there is no hot key by construction; the shuffle is one hash
    partition on url_id.  At 10^10 URLs this is a single wide agg over
    the fetch log, run per scheduling epoch.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("url_id").orderBy("ts_epoch", "content_fp")
    marked = visits.select(
        "url_id",
        "ts_epoch",
        F.when(
            F.lag("content_fp").over(w).isNotNull()
            & (F.col("content_fp") != F.lag("content_fp").over(w)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("changed"),
    )
    agg = marked.groupBy("url_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_visits"),
        F.sum("changed").cast("long").alias("n_changes"),
        F.max("ts_epoch").cast("long").alias("last_epoch"),
    )
    ratio = F.when(
        F.col("n_visits") > 1,
        F.round(F.col("n_changes") / (F.col("n_visits") - 1), 6),
    ).otherwise(F.lit(0.0))
    # CASE chain top-down: the first (highest) matching bucket wins,
    # mirroring the SQL twin's CASE order
    interval = None
    for lo, hours in RECRAWL_BUCKETS:
        cond = ratio >= F.lit(lo)
        interval = (
            F.when(cond, F.lit(hours))
            if interval is None
            else interval.when(cond, F.lit(hours))
        )
    interval = interval.otherwise(F.lit(RECRAWL_BUCKETS[-1][1])).cast("long")
    return agg.select(
        "url_id",
        "n_visits",
        "n_changes",
        ratio.alias("change_ratio"),
        interval.alias("interval_hours"),
        (F.col("last_epoch") + interval * 3600).cast("long").alias("next_fetch_epoch"),
    )


def host_components(edges: DataFrame, max_iterations: int = 20) -> DataFrame:
    """Site clusters: connected components of the host link graph —
    the host-level grouping a crawler uses for site-wide policies
    (shared politeness budgets across mirror/CDN hosts, per-site
    dedup scopes, blocklist propagation).

    Delegates to the observe-fused min-label propagation that backs
    dup_clusters (operators/dedup.py) — labels are the host strings
    themselves (min = lexicographically smallest host, a readable
    canonical representative), the edge list is symmetrized inside the
    propagation, and convergence costs one job per iteration with the
    changed-count riding the checkpoint as an Observation.

    Input: edges(src_host, dst_host).  Returns (host, component,
    component_size) for EVERY host, isolated hosts as singletons.
    """
    from pyspark.sql import functions as F

    from .dedup import dup_clusters

    nodes = (
        edges.select(F.col("src_host").alias("doc_id"))
        .unionByName(edges.select(F.col("dst_host").alias("doc_id")))
        .distinct()
    )
    pairs = (
        edges.filter(F.col("src_host") != F.col("dst_host"))
        .select(
            F.col("src_host").alias("doc_a"), F.col("dst_host").alias("doc_b")
        )
        .distinct()
    )
    out = dup_clusters(nodes, pairs, "doc_id", max_iterations)
    return out.select(
        F.col("doc_id").alias("host"),
        F.col("cluster_id").alias("component"),
        F.col("cluster_size").cast("long").alias("component_size"),
    )
