"""A2 — derived flat projections and fetch-config columns.

Reference semantics (studied, not ported):
  * texts/images/videos lists derived from contents by type filter —
    /root/reference/news_crawler/core/models.py:78-94; computed views,
    never stored (model_post_init recomputes on construction);
  * per-platform fetch config (headers model, impersonation browser,
    two-phase hints) bound as crawler class attributes —
    /root/reference/news_crawler/core/base.py:24-29, impersonate set at
    wechat_news.py:506-509 / bbc_news.py:76-79 etc.; header bootstrap
    cache at libs/playwright_driver.py:26-27,56-58 (600 s TTL per host)
    → here a broadcast platform-config table joined onto the frontier
    (J2 broadcast registry lookup), refreshed between crawl rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..canonical import PLATFORMS

# platform -> (impersonate, user_agent) — the engine's equivalent of the
# reference's per-crawler fetcher class attributes.  'requests' = plain
# fetcher (S1), anything else = curl_cffi impersonation target (S2).
PLATFORM_FETCH_CONFIG: dict[str, tuple[str, str]] = {
    "toutiao": ("requests", "Mozilla/5.0 (X11; Linux x86_64)"),
    "wechat": ("chrome", "Mozilla/5.0 (Windows NT 10.0; Win64; x64)"),
    "netease": ("chrome", "Mozilla/5.0 (Windows NT 10.0; Win64; x64)"),
    "sohu": ("chrome", "Mozilla/5.0 (Windows NT 10.0; Win64; x64)"),
    "tencent": ("chrome", "Mozilla/5.0 (Windows NT 10.0; Win64; x64)"),
    "detik": ("requests", "Mozilla/5.0 (X11; Linux x86_64)"),
    "naver": ("requests", "Mozilla/5.0 (X11; Linux x86_64)"),
    "lenny": ("requests", "Mozilla/5.0 (X11; Linux x86_64)"),
    "quora": ("requests", "Mozilla/5.0 (X11; Linux x86_64)"),
    "bbc": ("chrome", "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7)"),
    "cnn": ("chrome", "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7)"),
}


def platform_config_df(spark) -> DataFrame:
    """The 11-row broadcast registry (J2)."""
    rows = [
        (p, PLATFORM_FETCH_CONFIG[p][0], PLATFORM_FETCH_CONFIG[p][1])
        for p in PLATFORMS
    ]
    return spark.createDataFrame(rows, "platform string, impersonate string, user_agent string")


class HeaderBootstrap:
    """S4 — per-host header/cookie bootstrap with TTL-cached refresh,
    the engine's twin of the reference's browser-driven header cache
    (/root/reference/libs/playwright_driver.py:26-87: one real-browser
    visit per host, cached 600 s, refreshed on expiry).

    Engine shape: the expensive bootstrap runs on the DRIVER between
    crawl rounds (never in executors — a browser per task would be
    absurd at 10^10 URLs); the resulting host→headers table is broadcast
    and merged onto frontier rows by with_fetch_config.  TTL is counted
    in ROUNDS (deterministic — wall clocks never reach outputs; at the
    reference's ~1 fetch/s budgets a round ≈ 60 s, so ttl_rounds=10
    matches the 600 s TTL).

    `provider` is the production seam: host -> {header: value}, backed
    by playwright/DrissionPage where those ship.  This container has no
    browser, so the default provider is None (no bootstrapped hosts —
    static platform config still applies); tests inject a fake.

    `max_hosts_per_round` bounds how many NEW (non-fresh) hosts a round
    may pull onto the driver for bootstrapping — the bootstrap itself is
    inherently driver-side (a real browser visit per host), so at
    10^10-URL scale the bound is a necessity, not an optimization: a
    round's distinct frontier domains can be millions of rows, and one
    browser visit each would dwarf the round anyway.  The scheduler
    selects the top-K hosts by frontier mass (see
    plans.scheduler.bootstrap_hosts_for_round); the long tail keeps the
    static platform config until it carries enough frontier weight.
    """

    def __init__(
        self,
        provider=None,
        ttl_rounds: int = 10,
        max_hosts_per_round: int = 10_000,
    ):
        self.provider = provider
        self.ttl_rounds = ttl_rounds
        self.max_hosts_per_round = max_hosts_per_round
        self._cache: dict[str, tuple[int, dict[str, str]]] = {}

    def fresh_hosts(self, round_no: int) -> set[str]:
        """Hosts whose cache entry is still inside the TTL at round_no —
        these need no re-collect and no re-bootstrap this round."""
        return {
            h
            for h, (stamp, _) in self._cache.items()
            if round_no - stamp < self.ttl_rounds
        }

    def refresh(self, hosts, round_no: int) -> None:
        """Round-boundary hook: (re)bootstrap any host whose entry is
        missing or older than ttl_rounds."""
        if self.provider is None:
            return
        for h in hosts:
            hit = self._cache.get(h)
            if hit is None or round_no - hit[0] >= self.ttl_rounds:
                self._cache[h] = (round_no, dict(self.provider(h)))

    def config_df(self, spark) -> DataFrame | None:
        """(host, boot_headers) broadcast table; None when empty."""
        if not self._cache:
            return None
        rows = [(h, hdrs) for h, (_, hdrs) in sorted(self._cache.items())]
        return spark.createDataFrame(
            rows, "host string, boot_headers map<string,string>"
        )


def with_fetch_config(
    frontier: DataFrame,
    config: DataFrame,
    boot_config: DataFrame | None = None,
) -> DataFrame:
    """Broadcast-join fetch config onto frontier rows; unmatched
    platforms fall back to the plain fetcher.  Adds a `headers` map
    column (RequestHeaders shape, core/models.py:18-36).  When a
    HeaderBootstrap config is given, its per-host headers override the
    static defaults (map_concat right-biased merge), mirroring the
    reference's bootstrap-over-defaults precedence
    (playwright_driver.py:60-86)."""
    cfg = config.select(
        F.col("platform").alias("cf_platform"), "impersonate", "user_agent"
    )
    out = frontier.join(
        F.broadcast(cfg), frontier["platform"] == cfg["cf_platform"], "left"
    ).drop("cf_platform")
    out = out.withColumn(
        "impersonate", F.coalesce(F.col("impersonate"), F.lit("requests"))
    ).withColumn(
        "headers",
        F.create_map(
            F.lit("User-Agent"),
            F.coalesce(F.col("user_agent"), F.lit("Mozilla/5.0")),
            F.lit("Accept-Language"),
            F.lit("en-US,en;q=0.9"),
        ),
    ).drop("user_agent")
    if boot_config is not None:
        bc = boot_config.select(F.col("host").alias("bc_host"), "boot_headers")
        out = (
            out.join(F.broadcast(bc), out["domain"] == bc["bc_host"], "left")
            .withColumn(
                "headers",
                F.when(
                    F.col("boot_headers").isNotNull(),
                    # right-biased merge over the key union: bootstrap
                    # value wins where present, static default otherwise
                    F.map_zip_with(
                        "headers",
                        "boot_headers",
                        lambda k, v1, v2: F.coalesce(v2, v1),
                    ),
                ).otherwise(F.col("headers")),
            )
            .drop("bc_host", "boot_headers")
        )
    return out


def with_flat_projections(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """texts / images / videos derived lists (A2) — computed views over
    the spans array, offset order preserved; never stored."""
    s = F.col(spans_col)

    def flat(kind: str, field: str):
        return F.transform(F.filter(s, _kind_pred(kind)), _field_getter(field))

    return (
        docs.withColumn("texts", flat("text", "text"))
        .withColumn("images", flat("image", "media_ref"))
        .withColumn("videos", flat("video", "media_ref"))
    )


def media_manifest(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """S8/A7 — the media-fetch worklist: every distinct media_ref across
    the corpus with kind and first-seen doc (one fetch per media id even
    when many docs embed it — downloader.py:117-167 semantics).  The
    actual byte fetch is a separate job writing (media_ref, bytes) to an
    object store; bytes never enter the docs table."""
    exploded = docs.select(
        F.col("doc_id"), F.explode(spans_col).alias("s")
    ).filter(F.col("s.kind").isin("image", "video"))
    return (
        exploded.groupBy(F.col("s.media_ref").alias("media_ref"))
        .agg(
            # min not first(): deterministic under any partitioning (kind
            # is functionally dependent on the ref anyway)
            F.min("s.kind").alias("kind"),
            F.min("doc_id").alias("first_doc_id"),
            F.count("*").alias("n_refs"),
        )
    )


def _kind_pred(kind: str):
    def pred(x):
        return x["kind"] == kind

    return pred


def _field_getter(field: str):
    def get(x):
        return x[field]

    return get
