"""Sitemap ingestion — the seed-discovery channel robots.txt points at.

The reference crawler seeds each site from hard-coded entry URLs (e.g.
``news_crawler/cores/*/crawler.py`` homepage/list fetches); at web
scale the standard discovery channel is the sitemaps.org protocol:

  robots.txt ``Sitemap:`` lines  →  sitemap XML  →  frontier seeds

Two XML shapes, one parse (``SITEMAP_XML_SCHEMA`` covers both):

  * ``<urlset>``       — leaf sitemaps: ``<url><loc/><lastmod/>
    <changefreq/><priority/></url>`` entries → frontier candidates;
  * ``<sitemapindex>`` — index sitemaps: ``<sitemap><loc/></sitemap>``
    entries → MORE sitemap URLs to fetch (one hop per crawl round,
    like the naver two-phase iframe hop in sources/fetch.py).

Everything stays JVM-side: the ``Sitemap:`` line grammar reuses the
robots.txt line walk (sources/robots.py — posexplode + codegen string
ops), and the XML parse is ``from_xml`` (Catalyst's StaxXmlParser, one
pass, PERMISSIVE: malformed XML → NULL struct → quarantined row, never
a thrown task).  The only Python in the path is the optional gzip
decode for ``.xml.gz`` bodies (an Arrow-batched pandas UDF — gzip is
not expressible in Spark SQL), gated to rows whose bytes carry the
gzip magic so plain-text sitemaps never leave the JVM.

At 10^10-URL scale sitemap ingestion is a tiny side input (millions of
sitemap files, each ≤ 50 k URLs per the protocol cap) feeding the
frontier union; the parse is embarrassingly parallel with no shuffle
until the frontier-merge dedup that already exists.
"""

from __future__ import annotations

import gzip
import io

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# one schema covers urlset and sitemapindex; whichever array the
# document actually carries is non-NULL after from_xml
SITEMAP_XML_SCHEMA = (
    "STRUCT<url: ARRAY<STRUCT<loc STRING, lastmod STRING, "
    "changefreq STRING, priority DOUBLE>>, "
    "sitemap: ARRAY<STRUCT<loc STRING, lastmod STRING>>>"
)

# sitemaps.org protocol cap: one sitemap file may list at most 50k URLs
PROTOCOL_MAX_URLS = 50_000


def sitemap_urls_from_robots(bodies: DataFrame) -> DataFrame:
    """(domain, body) → (domain, sitemap_url) from ``Sitemap:`` lines.

    Same line grammar as ``parse_robots`` (comments stripped, keys
    case-insensitive); per RFC 9309 §2.2.4 / sitemaps.org, ``Sitemap:``
    is group-independent — every occurrence anywhere in the file
    counts.  Values must be absolute http(s) URLs; anything else is a
    malformed line and is dropped (the sitemap channel is additive
    discovery, so dropping fails safe — unlike Disallow rules, which
    fail closed in parse_robots).
    """
    lines = bodies.select(
        "domain",
        F.explode(
            F.split(F.regexp_replace("body", "﻿", ""), "\r?\n")
        ).alias("line"),
    )
    cleaned = F.trim(F.regexp_replace("line", "#.*$", ""))
    parsed = lines.select(
        "domain",
        F.lower(F.trim(F.regexp_extract(cleaned, "^([^:]+):", 1))).alias("key"),
        # split on the FIRST colon only: the value is itself a URL with
        # a scheme colon
        F.trim(F.regexp_extract(cleaned, "^[^:]+:(.*)$", 1)).alias("val"),
    )
    return (
        parsed.filter(
            (F.col("key") == "sitemap")
            & (F.col("val").rlike(r"(?i)^https?://\S+$"))
        )
        .select("domain", F.col("val").alias("sitemap_url"))
        .distinct()
    )


@F.pandas_udf(T.StringType())
def _gunzip_text(body: pd.Series) -> pd.Series:
    """bytes → str, transparently gunzipping gzip-magic payloads.

    Arrow-batched; undecodable rows → None (quarantine, not task
    failure).  Kept out of the hot path by the caller's magic-byte
    pre-filter — plain XML never crosses the Arrow boundary.
    """

    def one(b) -> str | None:
        if b is None:
            return None
        try:
            if len(b) >= 2 and b[0] == 0x1F and b[1] == 0x8B:
                b = gzip.GzipFile(fileobj=io.BytesIO(bytes(b))).read()
            return bytes(b).decode("utf-8", errors="replace")
        except OSError:
            return None

    return body.map(one)


def decode_sitemap_bodies(
    pages: DataFrame, bin_col: str = "content", out_col: str = "xml"
) -> DataFrame:
    """binary body → text ``out_col``; only gzip rows pay the UDF.

    The gzip magic test is JVM-side (substring on binary), so the
    common plain-XML case is a zero-copy cast and only ``.xml.gz``
    bodies take the Arrow round-trip.
    """
    is_gzip = F.substring(F.col(bin_col), 1, 2) == F.lit(b"\x1f\x8b")
    return pages.withColumn(
        out_col,
        F.when(is_gzip, _gunzip_text(F.col(bin_col))).otherwise(
            F.col(bin_col).cast("string")
        ),
    )


def parse_sitemaps(
    pages: DataFrame, url_col: str = "url", xml_col: str = "xml"
) -> DataFrame:
    """(sitemap_url, xml) → one row per entry.

    Output: ``(sitemap_url, kind, loc, lastmod, changefreq, priority)``
    where ``kind`` is ``'url'`` (leaf entry → frontier candidate) or
    ``'sitemap'`` (index entry → fetch next hop).  Rows whose XML
    parses to neither array (malformed / not a sitemap) come back as a
    single ``kind='error'`` row so the caller can count quarantines —
    silent drops would make a 10^10-URL discovery channel unauditable.

    Plan shape: one projection with from_xml, two explodes unioned —
    no shuffle, no UDF.
    """
    parsed = pages.select(
        F.col(url_col).alias("sitemap_url"),
        F.from_xml(F.col(xml_col), SITEMAP_XML_SCHEMA).alias("p"),
    )
    urls = parsed.filter(F.col("p.url").isNotNull()).select(
        "sitemap_url",
        F.lit("url").alias("kind"),
        F.explode("p.url").alias("e"),
    ).select(
        "sitemap_url",
        "kind",
        F.trim(F.col("e.loc")).alias("loc"),
        F.col("e.lastmod").alias("lastmod"),
        F.col("e.changefreq").alias("changefreq"),
        F.col("e.priority").alias("priority"),
    )
    idx = parsed.filter(F.col("p.sitemap").isNotNull()).select(
        "sitemap_url",
        F.lit("sitemap").alias("kind"),
        F.explode("p.sitemap").alias("e"),
    ).select(
        "sitemap_url",
        "kind",
        F.trim(F.col("e.loc")).alias("loc"),
        F.col("e.lastmod").alias("lastmod"),
        F.lit(None).cast("string").alias("changefreq"),
        F.lit(None).cast("double").alias("priority"),
    )
    bad = parsed.filter(
        F.col("p").isNull()
        | (F.col("p.url").isNull() & F.col("p.sitemap").isNull())
    ).select(
        "sitemap_url",
        F.lit("error").alias("kind"),
        F.lit(None).cast("string").alias("loc"),
        F.lit(None).cast("string").alias("lastmod"),
        F.lit(None).cast("string").alias("changefreq"),
        F.lit(None).cast("double").alias("priority"),
    )
    out = urls.unionByName(idx).unionByName(bad)
    return out.filter((F.col("kind") == "error") | (F.col("loc") != ""))


def sitemap_seeds(
    entries: DataFrame, round_no: int = 0, source: str = "sitemap"
) -> DataFrame:
    """Leaf entries → frontier-schema rows (schema.FRONTIER).

    Sitemap ``priority`` (1.0 = most important) maps onto the
    frontier's integer priority (0 = sooner): priority 0 for ≥ 0.75,
    1 for ≥ 0.4 or unset (protocol default 0.5), 2 below.  ``seq`` is
    a 63-bit hash of the loc — deterministic at any parallelism, and
    only a tie-break after (priority, depth) so collisions cost
    nothing.  Domain comes from the loc itself, not the sitemap's
    host: cross-host locs are allowed by the protocol when the sitemap
    is referenced from the target host's robots.txt, and the
    politeness scheduler must budget by TARGET host.
    """
    pr = F.coalesce(F.col("priority"), F.lit(0.5))
    return (
        entries.filter(F.col("kind") == "url")
        .select(
            F.col("loc").alias("url"),
            F.lower(F.regexp_extract("loc", r"^https?://([^/:]+)", 1)).alias(
                "domain"
            ),
            F.when(pr >= 0.75, 0).when(pr >= 0.4, 1).otherwise(2)
            .cast("int")
            .alias("priority"),
            F.lit(0).cast("int").alias("depth"),
            F.abs(F.xxhash64("loc")).cast("long").alias("seq"),
            F.lit(round_no).cast("int").alias("round_added"),
            F.lit(0).cast("int").alias("attempt"),
            F.lit(source).alias("source_seed"),
        )
    )
