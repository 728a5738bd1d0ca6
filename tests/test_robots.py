"""robots.txt (RFC 9309): group parsing, agent selection,
longest-match rule evaluation with wildcards/anchors, and the Spark
URL-gating operator."""

from __future__ import annotations

import sys
from pathlib import Path

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bigdata_invoice_stream_analysis_spark.operators.robots import (
    _pattern_matches,
    evaluate,
    parse_robots,
    parse_sitemap,
    robots_url_gate,
    select_group,
    sitemap_urls,
)

SAMPLE = """\
# global comment
Sitemap: https://example.com/sitemap.xml

User-agent: googlebot
Disallow: /private/
Allow: /private/ok
Crawl-delay: 2.5

User-agent: corpusbot
User-agent: otherbot
Disallow: /

User-agent: *
Disallow: /tmp/*.log$
Disallow: /cgi-bin
Allow: /cgi-bin/public
"""


def test_parse_groups_and_sitemaps():
    r = parse_robots(SAMPLE)
    assert r["sitemaps"] == ["https://example.com/sitemap.xml"]
    assert [g["agents"] for g in r["groups"]] == [
        ["googlebot"], ["corpusbot", "otherbot"], ["*"],
    ]
    assert r["groups"][0]["crawl_delay"] == 2.5
    assert r["groups"][0]["rules"] == [
        (False, "/private/"), (True, "/private/ok"),
    ]


def test_group_selection_longest_match_then_star():
    r = parse_robots(SAMPLE)
    assert select_group(r, "Googlebot/2.1")["agents"] == ["googlebot"]
    assert select_group(r, "CorpusBot")["agents"] == [
        "corpusbot", "otherbot",
    ]
    assert select_group(r, "unknown-agent")["agents"] == ["*"]
    # Longest token wins among several substring matches.
    r2 = parse_robots(
        "User-agent: bot\nDisallow: /a\n\n"
        "User-agent: corpusbot\nDisallow: /b\n"
    )
    g = select_group(r2, "corpusbot/1.0")
    assert g["rules"] == [(False, "/b")]


def test_rules_outside_group_ignored_and_empty_disallow():
    r = parse_robots("Disallow: /orphan\nUser-agent: *\nDisallow:\n")
    assert r["groups"][0]["rules"] == []
    assert evaluate(r, "any", "/anything")["allowed"] is True


def test_same_specificity_groups_merge():
    """§2.2.1: rules of all groups matching at the winning specificity
    combine — two '*' groups is the classic real-world layout."""
    r = parse_robots(
        "User-agent: *\nDisallow: /a\n\nUser-agent: *\nDisallow: /b\n"
    )
    assert evaluate(r, "bot", "/a/x")["allowed"] is False
    assert evaluate(r, "bot", "/b/x")["allowed"] is False
    # Equal-length named tokens merge too; shorter ones are excluded.
    r2 = parse_robots(
        "User-agent: corpusbot\nDisallow: /a\nCrawl-delay: 3\n\n"
        "User-agent: corpusbot\nDisallow: /b\n\n"
        "User-agent: bot\nDisallow: /c\n"
    )
    assert evaluate(r2, "corpusbot", "/a")["allowed"] is False
    assert evaluate(r2, "corpusbot", "/b")["allowed"] is False
    assert evaluate(r2, "corpusbot", "/c")["allowed"] is True
    assert evaluate(r2, "corpusbot", "/b")["crawl_delay"] == 3.0


def test_empty_user_agent_token_cannot_outrank_star():
    r = parse_robots(
        "User-agent:\nDisallow: /private\n\nUser-agent: *\nAllow: /\n"
    )
    g = select_group(r, "anybot")
    assert g["agents"] == ["*"]
    assert evaluate(r, "anybot", "/private/x")["allowed"] is True


def test_no_groups_means_allowed():
    v = evaluate(parse_robots("# empty\n"), "bot", "/x")
    assert v == {"allowed": True, "matched": None, "crawl_delay": None}


def test_longest_match_wins_allow_beats_equal_disallow():
    r = parse_robots(
        "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"
    )
    assert evaluate(r, "b", "/private/secret")["allowed"] is False
    assert evaluate(r, "b", "/private/ok/page")["allowed"] is True
    assert evaluate(r, "b", "/public")["matched"] is None
    # Equal-length allow vs disallow: allow wins (§2.2.2).
    tie = parse_robots("User-agent: *\nDisallow: /abc\nAllow: /ab*\n")
    assert evaluate(tie, "b", "/abc")["allowed"] is True


def test_wildcards_and_anchors():
    assert _pattern_matches("/tmp/*.log$", "/tmp/a/b.log")
    assert not _pattern_matches("/tmp/*.log$", "/tmp/a/b.log.html")
    assert _pattern_matches("/cgi-bin", "/cgi-bin/x")
    assert _pattern_matches("*.gif$", "/a/b.gif")
    assert not _pattern_matches("*.gif$", "/a/b.gifx")
    assert _pattern_matches("/a*b*c", "/a__b__c__")
    assert not _pattern_matches("/a*b*c", "/a__c__b")
    assert _pattern_matches("/p$", "/p")
    assert not _pattern_matches("/p$", "/pq")
    assert _pattern_matches("/a*", "/a")
    # The anchored last literal may not overlap the earlier parts.
    assert not _pattern_matches("/ab*b$", "/ab")
    assert _pattern_matches("/ab*b$", "/ab_b")


@given(st.text(alphabet="/ab*$", min_size=0, max_size=8),
       st.text(alphabet="/ab$", min_size=0, max_size=12))
@settings(max_examples=300, deadline=None)
def test_pattern_matcher_agrees_with_regex_oracle(pattern, path):
    import re as _re

    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if c == "*" else _re.escape(c) for c in body)
    rx = "^" + rx + ("$" if anchored else "")
    assert _pattern_matches(pattern, path) == bool(_re.match(rx, path))


def test_crawl_delay_and_bom_and_crlf():
    r = parse_robots("﻿User-agent: *\r\nCrawl-delay: 10\r\n"
                     "Disallow: /x\r\n")
    v = evaluate(r, "bot", "/x/1")
    assert v["allowed"] is False
    assert v["crawl_delay"] == 10.0


URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://ex.com/a</loc><lastmod>2026-01-02</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>https://ex.com/b</loc></url>
  <url><priority>0.5</priority></url><!-- no loc: dropped -->
</urlset>"""

INDEX = b"""<sitemapindex>
  <sitemap><loc>https://ex.com/s1.xml</loc>
           <lastmod>2026-02-03</lastmod></sitemap>
  <sitemap><loc>https://ex.com/s2.xml.gz</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemap_urlset_and_index():
    u = parse_sitemap(URLSET)
    assert u["kind"] == "urlset"
    assert u["entries"] == [
        {"loc": "https://ex.com/a", "lastmod": "2026-01-02",
         "changefreq": "daily", "priority": 0.8},
        {"loc": "https://ex.com/b", "lastmod": None,
         "changefreq": None, "priority": None},
    ]
    i = parse_sitemap(INDEX)  # namespace-free variant parses too
    assert i["kind"] == "sitemapindex"
    assert [e["loc"] for e in i["entries"]] == [
        "https://ex.com/s1.xml", "https://ex.com/s2.xml.gz",
    ]


def test_parse_sitemap_rejects_non_sitemap():
    import pytest

    with pytest.raises(ValueError, match="not a sitemap"):
        parse_sitemap(b"not xml at all")
    with pytest.raises(ValueError, match="unexpected sitemap root"):
        parse_sitemap(b"<rss><channel/></rss>")
    # bad priority degrades to None, not an exception
    bad = parse_sitemap(
        b"<urlset><url><loc>/x</loc><priority>high</priority>"
        b"</url></urlset>"
    )
    assert bad["entries"][0]["priority"] is None


def test_sitemap_urls_operator(spark):
    import gzip

    df = spark.createDataFrame(
        [(1, bytearray(URLSET)), (2, bytearray(gzip.compress(INDEX)))],
        "sitemap_id long, payload binary",
    )
    rows = sorted(
        sitemap_urls(df).collect(),
        key=lambda r: (r["sitemap_id"], r["loc"]),
    )
    assert [(r["sitemap_id"], r["is_index"], r["loc"], r["priority"])
            for r in rows] == [
        (1, False, "https://ex.com/a", 0.8),
        (1, False, "https://ex.com/b", None),
        (2, True, "https://ex.com/s1.xml", None),
        (2, True, "https://ex.com/s2.xml.gz", None),
    ]
    assert rows[2]["lastmod"] == "2026-02-03"


def test_robots_url_gate_operator(spark):
    robots = spark.createDataFrame(
        [("a.com", SAMPLE), ("b.com", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            (1, "a.com", "/private/secret"),
            (2, "a.com", "/private/ok/x"),
            (3, "a.com", "/tmp/x.log"),
            (4, "b.com", "/anything"),
            (5, "c.com", "/no-robots-here"),
        ],
        "url_id long, host string, path string",
    )
    rows = {r["url_id"]: r
            for r in robots_url_gate(urls, robots, "CorpusBot").collect()}
    # corpusbot group on a.com disallows everything.
    assert rows[1]["allowed"] is False
    assert rows[2]["allowed"] is False
    assert rows[3]["allowed"] is False
    assert rows[4]["allowed"] is False
    assert rows[5]["allowed"] is True
    assert rows[5]["has_robots"] is False
    # A different agent falls through to the * group on a.com.
    rows_g = {r["url_id"]: r
              for r in robots_url_gate(urls, robots, "Googlebot").collect()}
    assert rows_g[1]["allowed"] is False   # /private/
    assert rows_g[2]["allowed"] is True    # /private/ok wins
    assert rows_g[3]["allowed"] is True    # googlebot group has no /tmp rule
    assert rows_g[1]["crawl_delay"] == 2.5
