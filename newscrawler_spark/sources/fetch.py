"""U3 — the fetch stage.

Two implementations behind one seam:

  * FixtureFetcher — joins the eligible frontier against an offline
    ``pages`` table (url, status, html, out_links).  This is the test /
    bench path: deterministic, no network.  Retry semantics collapse
    (a fixture status is stable across attempts), so attempts is
    reported as 1 for 200s and `max_attempts` for failures — exactly
    what tenacity's stop_after_attempt(3) would have produced for a
    deterministic failure (/root/reference/news_crawler/core/base.py:73-78).

  * HttpFetcher — mapInPandas over URL batches with one requests.Session
    per Arrow batch, a real retry loop (3 attempts, 1 s fixed wait,
    15 s timeout — base.py:26-28) and per-row error isolation.  Carried
    for live use; tests never hit the network.

Both return the frontier columns + (status:int, html:string,
out_links:array<string>, attempts:int).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FETCH_ATTEMPTS = 3     # base.py:26
FETCH_WAIT_S = 1.0     # base.py:27
FETCH_TIMEOUT_S = 15.0 # base.py:28

# S3 — two-phase fetch (iframe indirection): naver serves a holder page
# whose real content sits behind //iframe[@id='mainFrame']/@src
# (/root/reference/news_crawler/naver_news/naver_news.py:179-195).  The
# hop happens INSIDE the fetch stage (like the reference — the document
# keeps the ORIGINAL url/canonical identity; re-enqueueing the iframe
# URL would key the seen-set on the wrong URL).
IFRAME_SRC_RE = r'<iframe[^>]*id="mainFrame"[^>]*src="([^"]+)"'


def iframe_target_py(html: str | None, base_url: str) -> str | None:
    """Pure-python twin (drives HttpFetcher and the simulator oracle)."""
    import re

    if not html:
        return None
    m = re.search(IFRAME_SRC_RE, html)
    if not m:
        return None
    src = m.group(1)
    if src.startswith("//"):
        return "https:" + src
    if src.startswith("/"):
        m2 = re.match(r"^(https?://[^/?#\s]+)", base_url)
        return (m2.group(1) if m2 else "") + src
    return src


# Link discovery (the engine's frontier-expansion loop).  The reference
# expands its work queue from fetched payloads (next-page URLs,
# /root/reference/video_crawler/pixabay/videos/downloader.py:91-98); the
# general-crawl analog is anchor extraction.  href values are attribute
# text: entity-decoded, then resolved browser-style against the URL the
# HTML was actually served from (the iframe TARGET after an S3 hop —
# relative links inside iframe content resolve against the frame src,
# not the holder).  Fragments are dropped (never sent to a server; the
# canonicalizer strips them from identity anyway); only http(s) results
# survive; first-occurrence document order is kept so discovery is
# deterministic.
HREF_RE = r"""<a\s[^>]*?href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))"""

_SKIP_SCHEMES = ("javascript:", "mailto:", "tel:", "data:", "about:")


def extract_links_py(
    html: str | None, base_url: str, max_links: int | None = None
) -> list[str]:
    """Anchor hrefs of `html`, resolved against `base_url`, in document
    order, first-occurrence-deduped, http(s)-only, fragment-stripped.

    Shared by HttpFetcher (executor-side, per fetched page) and the
    crawl-semantics oracle — one spec, two call sites.  `max_links`
    bounds pathological pages (a 10^5-anchor page would otherwise fan
    its whole anchor set into the frontier); None = unbounded, matching
    FixtureFetcher's verbatim pass-through of the pages table.
    """
    import html as html_mod
    import re
    from urllib.parse import urljoin

    if not html:
        return []
    out: list[str] = []
    seen: set[str] = set()
    for m in re.finditer(HREF_RE, html, re.IGNORECASE):
        raw = m.group(2) or m.group(3) or m.group(4) or ""
        href = html_mod.unescape(raw).strip()
        if not href or href.startswith("#"):
            continue
        if href.lower().startswith(_SKIP_SCHEMES):
            continue
        try:
            resolved = urljoin(base_url, href)
        except ValueError:
            continue
        resolved = resolved.split("#", 1)[0]
        if not resolved.startswith(("http://", "https://")) or resolved in seen:
            continue
        seen.add(resolved)
        out.append(resolved)
        if max_links is not None and len(out) >= max_links:
            break
    return out


def iframe_target_col(html_col, url_col):
    """Column twin of iframe_target_py (NULL when no iframe)."""
    src = F.regexp_extract(html_col, IFRAME_SRC_RE, 1)
    base = F.concat(F.lit("https://"), F.parse_url(url_col, F.lit("HOST")))
    resolved = (
        F.when(src.startswith("//"), F.concat(F.lit("https:"), src))
        .when(src.startswith("/"), F.concat(base, src))
        .otherwise(src)
    )
    return F.when(src == "", F.lit(None).cast("string")).otherwise(resolved)


class FixtureFetcher:
    # Above this many request rows the broadcast hint is withheld and the
    # join falls back to a plain shuffle join: broadcasting an unbounded
    # round's full-width frontier (the hint bypasses
    # autoBroadcastJoinThreshold) risks driver OOM.
    BROADCAST_MAX_ROWS = 4_000_000

    def __init__(
        self,
        pages: DataFrame,
        max_attempts: int = FETCH_ATTEMPTS,
        broadcast_max_rows: int | None = None,
        corpus_partitions: int | None = 64,
    ):
        from pyspark.storagelevel import StorageLevel

        self.max_attempts = max_attempts
        self.broadcast_max_rows = (
            self.BROADCAST_MAX_ROWS if broadcast_max_rows is None else broadcast_max_rows
        )
        # The page corpus is probed every round (main lookup + iframe
        # hop): persist the projection once so rounds read the columnar
        # cache instead of re-scanning/decompressing the parquet corpus
        # each time (event-log audit: repeated pages scans were ~40% of
        # all crawl task time).  MEMORY_AND_DISK: spills, never OOMs.
        #
        # HASH-repartition (url) to corpus_partitions, not coalesce: the
        # fetch-join output inherits the corpus partitioning, so the
        # cached layout decides which cores run everything downstream of
        # the join — including the extract UDF, the crawl's dominant CPU
        # stage.  A crawl round's URLs are id-contiguous in the archive
        # parquet's write order, so under coalesce a round's matched
        # pages concentrated in the few splits covering that id range
        # (measured: 94% of a 400k-row round in 8 of 64 partitions —
        # extraction serialized on 8 cores however many exist, the
        # measured cause of the flat 8->32 scaling ratio).  Hashing by
        # url spreads any round's match set uniformly for a one-time
        # init shuffle, and matches live-fetch reality: HTTP responses
        # arrive partitioned by the request side, never by archive file
        # order.  Bounding the partition count also keeps small rounds
        # from paying one near-empty task per source split per scan
        # (a 182-partition parquet source measured hundreds of no-op
        # tasks per round write).
        src = pages.select("url", "status", "html", "out_links")
        if corpus_partitions is not None:
            src = src.repartition(corpus_partitions, "url")
        self.pages = src.persist(StorageLevel.MEMORY_AND_DISK)
        # URL-only projection, cached across rounds: the miss-recovery
        # anti-join probes this instead of rescanning page HTML
        self._urls = pages.select(F.col("url").alias("p_url"))
        if corpus_partitions is not None:
            self._urls = self._urls.coalesce(corpus_partitions)
        self._urls = self._urls.cache()
        # S3 hop prepass, ONCE at init (amortized over rounds): which
        # corpus pages are iframe HOLDERS (url → resolved target), and
        # the sub-corpus their targets can reach.  fetch() previously
        # detected holders per round by regexing every fetched page's
        # html AND resolved them by streaming the full HTML cache a
        # second (and, via the nonhop/hop filter-split re-executing the
        # main join, a third) time — measured as the crawl's dominant
        # memory-bandwidth term.  With the mapping precomputed, a round
        # streams the corpus exactly once: hop requests split off by a
        # broadcast join against the (tiny, html-free) holder mapping
        # and resolve against the (small) target sub-corpus.  A target
        # can only be a URL some 200-status corpus page references, so
        # the sub-corpus is exhaustive by construction; misses still
        # recover against the full URL list.
        holders = (
            self.pages.filter(F.col("status") == 200)
            .select(
                F.col("url").alias("h_url"),
                iframe_target_col(F.col("html"), F.col("url")).alias("h_target"),
            )
            .filter(F.col("h_target").isNotNull())
        )
        self._holders = holders.persist(StorageLevel.MEMORY_AND_DISK)
        targets = self._holders.select(F.col("h_target").alias("t_url")).distinct()
        hop_pages = self.pages.join(
            targets, self.pages["url"] == targets["t_url"], "left_semi"
        )
        if corpus_partitions is not None:
            hop_pages = hop_pages.coalesce(corpus_partitions)
        self._hop_pages = hop_pages.persist(StorageLevel.MEMORY_AND_DISK)

    def close(self) -> None:
        """Release the cached corpus projections.  Callers that outlive
        a crawl (bench, long-lived sessions) must call this — otherwise
        the persisted blocks live for the JVM lifetime; context-manager
        use (``with FixtureFetcher(pages) as f:``) does it for you."""
        self.pages.unpersist()
        self._urls.unpersist()
        self._holders.unpersist()
        self._hop_pages.unpersist()

    def __enter__(self) -> "FixtureFetcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _lookup(
        self,
        requests: DataFrame,
        url_col: str,
        hint_broadcast: bool = True,
        pages_src: DataFrame | None = None,
    ) -> DataFrame:
        """Left-join `requests` against the page table WITHOUT ever
        shuffling page HTML: the request side (a round's eligible rows,
        MBs) is broadcast into an inner join that streams the pages
        scan, and misses are recovered with a second broadcast anti-join.
        (The naive left join sort-merge-shuffled the full HTML corpus —
        GBs — every round.)  With hint_broadcast=False the explicit
        hints are withheld and AQE/planner statistics pick the strategy
        (the oversized-request fallback).  pages_src narrows the streamed
        table (the iframe-target sub-corpus for S3 hops); miss recovery
        always probes the FULL url list, so a request absent from a
        narrowed pages_src but present in the corpus would surface as a
        found-vs-missing contradiction rather than silently misses —
        callers must pass a pages_src exhaustive for their request set."""
        pages = (pages_src if pages_src is not None else self.pages).select(
            F.col("url").alias("p_url"), "status", "html", "out_links"
        )
        req = F.broadcast(requests) if hint_broadcast else requests
        found = pages.join(
            req, pages["p_url"] == requests[url_col], "inner"
        ).drop("p_url")
        missing = requests.join(
            self._urls, requests[url_col] == self._urls["p_url"], "left_anti"
        )
        missing = (
            missing.withColumn("status", F.lit(0))
            .withColumn("html", F.lit(None).cast("string"))
            .withColumn("out_links", F.array().cast("array<string>"))
        )
        return found.unionByName(missing)

    def fetch(self, eligible: DataFrame, size_hint_rows: int | None = None) -> DataFrame:
        """size_hint_rows: a free upper bound on the request row count
        (the scheduler passes the previous round's committed
        frontier_next counter — no extra job); None means "unknown,
        assume broadcastable" (tests / first round over seed lists)."""
        bc = size_hint_rows is None or size_hint_rows <= self.broadcast_max_rows

        # S3 two-phase hop: rows whose page is an iframe holder fetch the
        # target within the same stage; the document keeps the original
        # URL identity.  The hop/nonhop split happens BEFORE the main
        # join, against the init-time holder mapping (broadcast, html-
        # free): nonhop requests stream the full corpus exactly once,
        # hop requests resolve against the small target sub-corpus.
        # (Splitting AFTER the join — the previous shape — re-executed
        # the corpus-streaming join once per filter branch and regexed
        # every page's html every round.)
        holders = F.broadcast(self._holders)
        hop = eligible.join(
            holders, eligible["url"] == holders["h_url"], "inner"
        ).drop("h_url")
        nonhop = eligible.join(
            holders, eligible["url"] == holders["h_url"], "left_anti"
        )
        out = self._lookup(nonhop, "url", hint_broadcast=bc)
        # hop rows are the (few) iframe-holder pages — always broadcast
        resolved = self._lookup(
            hop, "h_target", pages_src=self._hop_pages
        ).drop("h_target")
        out = out.unionByName(resolved)

        return out.withColumn(
            "attempts",
            F.when(F.col("status") == 200, F.lit(1)).otherwise(
                F.lit(self.max_attempts)
            ),
        )


class HttpFetcher:
    """Live fetch via mapInPandas; requests imported lazily on executors.

    Before fetching, eligible rows are repartitioned by (domain, salt)
    — politeness locality (a host's requests cluster on few executors)
    with mega-host skew spread over `salt_factor` partitions
    (operators.scheduling.salt_domains)."""

    # run_round attaches the platform fetch-config columns (impersonate,
    # headers) for any fetcher that declares it consumes them (S2/S4)
    wants_fetch_config = True

    def __init__(self, max_attempts: int = FETCH_ATTEMPTS,
                 wait_s: float = FETCH_WAIT_S, timeout_s: float = FETCH_TIMEOUT_S,
                 n_partitions: int = 64, salt_factor: int = 8,
                 max_links_per_page: int | None = None):
        self.max_attempts = max_attempts
        self.wait_s = wait_s
        self.timeout_s = timeout_s
        self.n_partitions = n_partitions
        self.salt_factor = salt_factor
        self.max_links_per_page = max_links_per_page

    def fetch(self, eligible: DataFrame, size_hint_rows: int | None = None) -> DataFrame:
        from ..operators.scheduling import salt_domains

        eligible = salt_domains(eligible, self.n_partitions, self.salt_factor)
        max_attempts, wait_s, timeout_s = self.max_attempts, self.wait_s, self.timeout_s
        max_links = self.max_links_per_page
        out_schema = (
            eligible.schema.simpleString()[7:-1]
            + ",status int,html string,out_links array<string>,attempts int"
        )
        cols = [f.name for f in eligible.schema.fields]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import time

            import requests

            session = requests.Session()
            for pdf in batches:
                statuses, htmls, links, attempts = [], [], [], []
                # per-row header maps from with_fetch_config (S4/J2); the
                # `impersonate` column targets a curl_cffi-backed fetcher
                # (S2) on deployments that ship it — requests ignores it
                hdr_col = pdf["headers"] if "headers" in pdf.columns else None
                for i, url in enumerate(pdf["url"]):
                    headers = dict(hdr_col.iloc[i]) if hdr_col is not None and hdr_col.iloc[i] is not None else None
                    status, html, n = 0, None, 0
                    base = url  # link-resolution base: the URL the html came from
                    for n in range(1, max_attempts + 1):
                        try:
                            resp = session.get(url, timeout=timeout_s, headers=headers)
                            status = resp.status_code
                            if status == 200:
                                html = resp.text
                                target = iframe_target_py(html, url)
                                if target:  # S3 hop, same attempt
                                    resp2 = session.get(
                                        target, timeout=timeout_s, headers=headers
                                    )
                                    status = resp2.status_code
                                    html = resp2.text if status == 200 else None
                                    base = target
                            if status == 200:
                                break
                        except requests.RequestException:
                            status = 0
                        if n < max_attempts:
                            time.sleep(wait_s)
                    statuses.append(status)
                    htmls.append(html)
                    links.append(
                        extract_links_py(html, base, max_links)
                        if status == 200
                        else []
                    )
                    attempts.append(n)
                out = pdf[cols].copy()
                out["status"] = statuses
                out["html"] = htmls
                out["out_links"] = links
                out["attempts"] = attempts
                yield out

        return eligible.mapInPandas(run, schema=out_schema)
