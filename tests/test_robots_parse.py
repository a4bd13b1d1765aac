"""robots.txt parsing (sources/robots.py): the JVM window pipeline must
agree with the pure-python twin on adversarial bodies, and its output
must drive apply_robots correctly end-to-end."""

import pytest
from pyspark.sql import functions as F

from newscrawler_spark.operators.scheduling import apply_robots
from newscrawler_spark.sources.robots import parse_robots, parse_robots_py

BODIES = {
    "plain.com": "User-agent: *\nDisallow: /private\nAllow: /private/ok\n",
    "specific.com": (
        "User-agent: googlebot\nDisallow: /google-only\n\n"
        "User-agent: newscrawler\nDisallow: /api\nCrawl-delay: 2\n\n"
        "User-agent: *\nDisallow: /everything\n"
    ),
    "multi-ua.com": (
        "User-agent: a\nUser-agent: newscrawler\nUser-agent: b\n"
        "Disallow: /shared\n"
    ),
    "comments.com": (
        "# header comment\nUser-agent: * # trailing\nDisallow: /x # why\n"
        "# Disallow: /commented-out\n"
    ),
    "crlf.com": "User-agent: *\r\nDisallow: /crlf\r\nCrawl-delay: 1.5\r\n",
    "bom.com": "﻿User-agent: *\nDisallow: /bom\n",
    "preamble.com": "Disallow: /ignored-before-any-group\nUser-agent: *\nDisallow: /kept\n",
    "empty-disallow.com": "User-agent: *\nDisallow:\nDisallow: /real\n",
    "wildcards.com": "User-agent: *\nDisallow: /w*ld\nDisallow: /end$\nDisallow: /lit\n",
    "no-slash.com": "User-agent: *\nDisallow: relative\nDisallow: /abs\n",
    "star-all.com": "User-agent: *\nDisallow: *\n",
    "wild-allow.com": (
        "User-agent: *\nDisallow: /private\nAllow: /private/ok*\nAllow: rel\n"
    ),
    "delay-only.com": "User-agent: *\nCrawl-delay: 7\n",
    "blocked.com": "User-agent: *\nDisallow: /\n",
    "caps.com": "USER-AGENT: *\nDISALLOW: /caps\nCrawl-Delay: 3\n",
    "star-ignored.com": (
        "User-agent: *\nDisallow: /star\n\nUser-agent: NewsCrawler\nAllow: /nc\n"
    ),
    "empty.com": "",
    "garbage.com": "not a robots file at all\n<<<>>>\n",
}


@pytest.fixture(scope="module")
def parsed(spark):
    bodies = spark.createDataFrame(
        list(BODIES.items()), "domain string, body string"
    )
    rows = parse_robots(bodies, agent="newscrawler").collect()
    out = {}
    for r in rows:
        out.setdefault(r.domain, set()).add(
            (r.path_prefix, r.allow, r.crawl_delay_s)
        )
    return out


def test_matches_python_twin_on_every_body(parsed):
    for domain, body in BODIES.items():
        want = set(parse_robots_py(body, agent="newscrawler"))
        got = parsed.get(domain, set())
        assert got == want, f"{domain}: spark={got} twin={want}"


def test_selection_and_grammar_specifics(parsed):
    # specific group wins, star ignored; the domain delay rides on every
    # rule plus the '/' carrier (so unmatched URLs inherit it)
    assert parsed["specific.com"] == {("/api", False, 2.0), ("/", True, 2.0)}
    assert parsed["star-ignored.com"] == {("/nc", True, None)}
    # multi-UA run shares one rule set
    assert parsed["multi-ua.com"] == {("/shared", False, None)}
    # comments stripped, preamble rules ignored, CRLF + BOM tolerated
    assert parsed["comments.com"] == {("/x", False, None)}
    assert parsed["preamble.com"] == {("/kept", False, None)}
    assert parsed["crlf.com"] == {("/crlf", False, 1.5), ("/", True, 1.5)}
    assert parsed["bom.com"] == {("/bom", False, None)}
    # empty disallow = RFC allow-all idiom, dropped; wildcard disallows
    # FAIL CLOSED to their literal prefix (round-3 advice: RFC 9309
    # §2.2.3 wildcards are mandatory — over-block, never under-block);
    # relative disallows get '/' prepended
    assert parsed["empty-disallow.com"] == {("/real", False, None)}
    assert parsed["wildcards.com"] == {
        ("/w", False, None),
        ("/end", False, None),
        ("/lit", False, None),
    }
    assert parsed["no-slash.com"] == {
        ("/relative", False, None),
        ("/abs", False, None),
    }
    # a bare-wildcard disallow blocks everything
    assert parsed["star-all.com"] == {("/", False, None)}
    # wildcard/relative ALLOWS drop (covering disallows keep blocking)
    assert parsed["wild-allow.com"] == {("/private", False, None)}
    # delay-only group emits the allow-carrier so the delay survives
    assert parsed["delay-only.com"] == {("/", True, 7.0)}
    # degenerate inputs parse to nothing
    assert "empty.com" not in parsed and "garbage.com" not in parsed


def test_feeds_apply_robots_end_to_end(spark):
    bodies = spark.createDataFrame(
        [("s.com", BODIES["specific.com"]), ("b.com", BODIES["blocked.com"])],
        "domain string, body string",
    )
    rules = parse_robots(bodies, agent="newscrawler")
    cand = spark.createDataFrame(
        [
            ("https://s.com/api/x", "s.com"),
            ("https://s.com/news/1", "s.com"),
            ("https://b.com/anything", "b.com"),
            ("https://other.com/ok", "other.com"),
        ],
        "url string, domain string",
    )
    allowed, denied = apply_robots(cand, rules)
    assert {r.url for r in denied.collect()} == {
        "https://s.com/api/x",
        "https://b.com/anything",
    }
    got = {r.url: r.crawl_delay_s for r in allowed.collect()}
    assert set(got) == {"https://s.com/news/1", "https://other.com/ok"}
    # the crawl-delay reaches allowed rows of the delayed domain
    assert got["https://s.com/news/1"] == 2.0
