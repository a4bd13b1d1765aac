"""Sitemap ingestion (sources/sitemaps.py): robots `Sitemap:` line
extraction, urlset/sitemapindex XML parse via from_xml, gzip decode
seam, and the frontier-seed mapping.

The oracle queries (`sitemap_parse`, `sitemap_discover`) cover the
bulk grammar round-trip; these tests pin the edges the synthetic
generator can't reach: gzip bodies, entity-escaped locs, the protocol
cross-host rule, and schema conformance of the seed rows.
"""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from newscrawler_spark import schema
from newscrawler_spark.sources.sitemaps import (
    decode_sitemap_bodies,
    parse_sitemaps,
    sitemap_seeds,
    sitemap_urls_from_robots,
)

URLSET = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    "<url><loc>https://news.example/a?x=1&amp;y=2</loc>"
    "<lastmod>2026-03-01</lastmod><priority>0.9</priority></url>\n"
    "<url><loc> https://other-host.example/b </loc></url>\n"
    "</urlset>"
)
INDEX = (
    '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<sitemap><loc>https://news.example/sitemap-1.xml.gz</loc>"
    "<lastmod>2026-02-02</lastmod></sitemap></sitemapindex>"
)


def test_parse_urlset_and_index(spark):
    df = spark.createDataFrame(
        [("https://news.example/sitemap.xml", URLSET),
         ("https://news.example/sitemap_index.xml", INDEX),
         ("https://bad.example/sitemap.xml", "<html>soft 404</html>")],
        "url string, xml string",
    )
    rows = {(r.kind, r.loc): r for r in parse_sitemaps(df).collect()}
    # entity unescape is the XML parser's job: &amp; comes back as &
    assert ("url", "https://news.example/a?x=1&y=2") in rows
    assert rows[("url", "https://news.example/a?x=1&y=2")].priority == 0.9
    # loc whitespace trimmed; cross-host loc preserved (protocol allows
    # it when authorized via robots.txt — politeness re-checks later)
    assert ("url", "https://other-host.example/b") in rows
    # index entries are a next-hop fetch list, not frontier rows
    assert ("sitemap", "https://news.example/sitemap-1.xml.gz") in rows
    # non-sitemap body quarantined, not dropped
    assert ("error", None) in rows
    assert len(rows) == 4


def test_gzip_decode_only_pays_udf_for_gzip_rows(spark):
    plain = URLSET.encode()
    gz = gzip.compress(INDEX.encode())
    df = spark.createDataFrame(
        [("u1", bytearray(plain)), ("u2", bytearray(gz)),
         ("u3", bytearray(b"\x1f\x8b corrupt gzip"))],
        "url string, content binary",
    )
    out = decode_sitemap_bodies(df)
    got = {r.url: r.xml for r in out.collect()}
    assert got["u1"] == URLSET
    assert got["u2"] == INDEX
    assert got["u3"] is None  # undecodable → quarantine, not task failure
    # plan: the UDF sits under a CASE WHEN on the magic bytes — the
    # common plain-XML branch is a JVM cast
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CASE WHEN" in plan or "ArrowEvalPython" in plan
    # end-to-end: decoded text parses
    kinds = {r.kind for r in parse_sitemaps(out.filter("xml is not null")).collect()}
    assert kinds == {"url", "sitemap"}


def test_sitemap_seeds_schema_and_priority_mapping(spark):
    df = spark.createDataFrame(
        [("s", "url", "https://News.Example/a", None, None, 0.9),
         ("s", "url", "https://news.example/b", None, None, None),
         ("s", "url", "https://news.example/c", None, None, 0.1),
         ("s", "sitemap", "https://news.example/next.xml", None, None, None)],
        "sitemap_url string, kind string, loc string, lastmod string,"
        " changefreq string, priority double",
    )
    seeds = sitemap_seeds(df, round_no=3)
    assert [f.name for f in seeds.schema.fields] == [
        f.name for f in schema.FRONTIER.fields
    ]
    rows = {r.url: r for r in seeds.collect()}
    assert set(rows) == {
        "https://News.Example/a", "https://news.example/b",
        "https://news.example/c",
    }  # index entries excluded
    a, b, c = (rows[k] for k in sorted(rows))
    assert a.priority == 0 and a.domain == "news.example"  # host lowercased
    assert b.priority == 1  # protocol default 0.5 → middle band
    assert c.priority == 2
    assert all(r.round_added == 3 and r.depth == 0 for r in rows.values())
    # seq deterministic: same loc → same seq on recompute
    again = {r.url: r.seq for r in sitemap_seeds(df, round_no=3).collect()}
    assert {u: r.seq for u, r in rows.items()} == again


def test_robots_sitemap_lines(spark):
    body = (
        "User-agent: *\nDisallow: /x\n"
        "sitemap: https://a.example/s.xml\n"
        "SITEMAP: https://a.example/s2.xml # comment\n"
        "Sitemap: /relative-dropped.xml\n"
        "Sitemap: ftp://a.example/nope.xml\n"
        "Sitemap: https://a.example/s.xml\n"  # dup → distinct
    )
    df = spark.createDataFrame([("a.example", body)], "domain string, body string")
    got = sorted(r.sitemap_url for r in sitemap_urls_from_robots(df).collect())
    assert got == ["https://a.example/s.xml", "https://a.example/s2.xml"]


def test_parse_is_shuffle_free(spark):
    df = spark.createDataFrame([("u", URLSET)], "url string, xml string")
    plan = parse_sitemaps(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # union of three projections, no shuffle
