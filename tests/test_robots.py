"""RFC 9309 robots exclusion + sitemap discovery (operators/robots.py):
spec-shaped vectors for group selection / longest-match / allow-wins /
wildcards, a generated cross-check of the Spark gate against the
pure-Python referee, plan assertions (broadcast join, no Python on the
corpus side), and sitemap <loc> extraction incl. the tag-soup cases.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from muopdb_spark.operators.robots import (
    extract_sitemap_locs,
    parse_robots,
    parse_robots_txt,
    robots_allowed,
    robots_gate,
    sitemap_urls,
)

BASIC = """
User-Agent: *
Allow: /example/page/
Disallow: /example/
Disallow: /*.gif$
Sitemap: https://ex.com/sitemap.xml
Crawl-delay: 2.5
"""

GROUPS = """
User-Agent: alpha
Disallow: /x

User-Agent: beta
User-Agent: gamma
Disallow: /y

User-Agent: *
Disallow: /z
"""


def test_longest_match_and_wildcards():
    assert robots_allowed(BASIC, "/example/page/deep") is True
    assert robots_allowed(BASIC, "/example/other") is False
    assert robots_allowed(BASIC, "/pics/cat.gif") is False
    assert robots_allowed(BASIC, "/pics/cat.gifx") is True  # $ anchored
    assert robots_allowed(BASIC, "/anything/else") is True


def test_tie_resolves_to_allow():
    txt = "User-agent: *\nAllow: /p\nDisallow: /p\n"
    assert robots_allowed(txt, "/page") is True
    # and the reverse rule order too
    txt2 = "User-agent: *\nDisallow: /p\nAllow: /p\n"
    assert robots_allowed(txt2, "/page") is True


def test_group_selection():
    # multi-UA group: beta and gamma share /y
    assert robots_allowed(GROUPS, "/y", "beta") is False
    assert robots_allowed(GROUPS, "/y", "gamma") is False
    # a specific group suppresses the '*' group entirely
    assert robots_allowed(GROUPS, "/z", "beta") is True
    assert robots_allowed(GROUPS, "/x", "beta") is True
    # unmatched token falls to '*'
    assert robots_allowed(GROUPS, "/z", "delta") is False
    assert robots_allowed(GROUPS, "/y", "delta") is True


def test_ua_prefix_and_longest_ua_wins():
    txt = (
        "User-agent: foobot\nDisallow: /a\n"
        "User-agent: foobot-news\nDisallow: /b\n"
    )
    # exact-prefix selection: foobot-news picks its own group only
    assert robots_allowed(txt, "/a", "foobot-news") is True
    assert robots_allowed(txt, "/b", "foobot-news") is False
    assert robots_allowed(txt, "/a", "foobot") is False
    assert robots_allowed(txt, "/b", "foobot") is True


def test_same_ua_groups_merge():
    txt = (
        "User-agent: bot\nDisallow: /a\n"
        "User-agent: other\nDisallow: /c\n"
        "User-agent: bot\nDisallow: /b\n"
    )
    assert robots_allowed(txt, "/a", "bot") is False
    assert robots_allowed(txt, "/b", "bot") is False
    assert robots_allowed(txt, "/c", "bot") is True


def test_rules_before_any_ua_are_ignored_and_empty_disallow_noop():
    assert robots_allowed("Disallow: /\n", "/x") is True
    assert robots_allowed("User-agent: *\nDisallow:\n", "/x") is True


def test_malformed_lines_are_skipped():
    txt = "User-agent: *\nnonsense line\nDisallow /nocolon\nDisallow: /real\n"
    assert robots_allowed(txt, "/real/x") is False
    assert robots_allowed(txt, "/nocolon") is True
    assert robots_allowed("", "/x") is True


def test_sitemap_and_crawl_delay_collection():
    parsed = parse_robots_txt(BASIC)
    assert parsed.sitemaps == ["https://ex.com/sitemap.xml"]
    assert parsed.crawl_delay == 2.5
    assert parse_robots_txt("User-agent: *\nCrawl-delay: soon\n").crawl_delay is None


def _referee_matrix():
    texts = [BASIC, GROUPS, "User-agent: *\nDisallow: /\nAllow: /ok\n", ""]
    paths = [
        "/", "/x", "/y", "/z", "/ok", "/ok/sub", "/example/",
        "/example/page/", "/a.gif", "/deep/a.gif?x=1",
    ]
    return [
        (ti, p, robots_allowed(t, p))
        for ti, t in enumerate(texts)
        for p in paths
    ], texts


def test_spark_gate_matches_referee(spark):
    cases, texts = _referee_matrix()
    robots = spark.createDataFrame(
        [(f"h{i}.com", t) for i, t in enumerate(texts)],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [(f"https://h{ti}.com{p}",) for ti, p, _ in cases], "url string"
    )
    parsed = parse_robots(robots)
    got = {
        r["url"]: r["robots_allowed"]
        for r in robots_gate(urls, parsed).collect()
    }
    for ti, p, want in cases:
        u = f"https://h{ti}.com{p}"
        assert got[u] == want, f"{u}: want {want}"


def test_gate_unknown_host_allowed_and_query_in_match_target(spark):
    robots = spark.createDataFrame(
        [("ex.com", "User-agent: *\nDisallow: /s?*q=hide\n")],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            ("https://ex.com/s?q=hide",),
            ("https://ex.com/s?q=fine",),
            ("https://elsewhere.com/s?q=hide",),
        ],
        "url string",
    )
    got = {
        r["url"]: r["robots_allowed"]
        for r in robots_gate(urls, parse_robots(robots)).collect()
    }
    assert got["https://ex.com/s?q=hide"] is False
    assert got["https://ex.com/s?q=fine"] is True
    assert got["https://elsewhere.com/s?q=hide"] is True


def test_gate_plan_broadcast_no_corpus_python(spark):
    robots = spark.createDataFrame(
        [("ex.com", BASIC)], "host string, robots_txt string"
    )
    urls = spark.range(100).select(
        F.concat(F.lit("https://ex.com/p/"), F.col("id")).alias("url")
    )
    out = robots_gate(urls, parse_robots(robots))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    # the only Arrow stage is the robots-side parse, which feeds the
    # broadcast exchange — the corpus side stays JVM-only
    assert plan.count("MapInPandas") == 1
    assert not re.search(r"Exchange hashpartitioning", plan)


def test_user_agent_group_selection_through_spark(spark):
    robots = spark.createDataFrame(
        [("ex.com", GROUPS)], "host string, robots_txt string"
    )
    urls = spark.createDataFrame(
        [("https://ex.com/y",), ("https://ex.com/z",)], "url string"
    )
    got = {
        r["url"]: r["robots_allowed"]
        for r in robots_gate(
            urls, parse_robots(robots, user_agent="beta")
        ).collect()
    }
    assert got["https://ex.com/y"] is False
    assert got["https://ex.com/z"] is True


# ------------------------------------------------------------ sitemaps

SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://ex.com/a?x=1&amp;y=2</loc><lastmod>2026-01-01</lastmod></url>
  <url><loc> https://ex.com/b </loc></url>
  <url><lastmod>2026-01-01</lastmod></url>
</urlset>
"""

SITEMAP_INDEX = """<sitemapindex>
  <sitemap><loc><![CDATA[https://ex.com/maps/1.xml]]></loc></sitemap>
  <sitemap><loc>https://ex.com/maps/2.xml</loc></sitemap>
</sitemapindex>
"""


def test_extract_sitemap_locs():
    assert extract_sitemap_locs(SITEMAP) == [
        ("https://ex.com/a?x=1&y=2", "url"),
        ("https://ex.com/b", "url"),
    ]
    assert extract_sitemap_locs(SITEMAP_INDEX) == [
        ("https://ex.com/maps/1.xml", "sitemap"),
        ("https://ex.com/maps/2.xml", "sitemap"),
    ]
    # truncated XML still yields intact entries; garbage yields none
    truncated = SITEMAP.split("<url><lastmod>")[0]
    assert [l for l, _ in extract_sitemap_locs(truncated)] == [
        "https://ex.com/a?x=1&y=2",
        "https://ex.com/b",
    ]
    assert extract_sitemap_locs("not xml at all") == []
    assert extract_sitemap_locs("") == []


def test_sitemap_urls_spark(spark):
    df = spark.createDataFrame(
        [("ex.com", SITEMAP), ("ix.com", SITEMAP_INDEX), ("no.com", "x")],
        "host string, sitemap_xml string",
    )
    rows = sorted(
        (r["host"], r["loc"], r["kind"])
        for r in sitemap_urls(df).collect()
    )
    assert rows == [
        ("ex.com", "https://ex.com/a?x=1&y=2", "url"),
        ("ex.com", "https://ex.com/b", "url"),
        ("ix.com", "https://ex.com/maps/1.xml", "sitemap"),
        ("ix.com", "https://ex.com/maps/2.xml", "sitemap"),
    ]


def test_sitemap_line_does_not_split_user_agent_run():
    """RFC 9309 §2.2.1: only rule lines terminate a startgroupline
    run; Sitemap: is a non-group record and must be TRANSPARENT —
    'User-agent: a / Sitemap: x / User-agent: b / Disallow: /y' is ONE
    group covering both agents (r15 ADVICE regression: agent a used to
    be stranded with no rules and fall through to *)."""
    txt = """User-agent: a
Sitemap: https://ex.com/s.xml
User-agent: b
Disallow: /x
User-agent: *
Allow: /
"""
    assert not robots_allowed(txt, "/x/deep", "a")
    assert not robots_allowed(txt, "/x/deep", "b")
    assert robots_allowed(txt, "/ok", "a")
    parsed = parse_robots_txt(txt, "a")
    assert parsed.sitemaps == ["https://ex.com/s.xml"]
    # a rule line still ends the run: c is NOT merged into the a/b group
    txt2 = "User-agent: a\nDisallow: /x\nUser-agent: c\nDisallow: /y\n"
    assert robots_allowed(txt2, "/y/d", "a")
    assert not robots_allowed(txt2, "/x/d", "a")


def test_parse_robots_random_fuzz():
    """Seeded random robots.txt fuzz (r16): parse_robots_txt +
    robots_allowed must be total over arbitrary line salads, and every
    compiled rule regex must be valid for the Python engine (the JVM /
    RE2 compatibility is covered by the oracle-backed rows)."""
    import random
    import re

    from muopdb_spark.operators.robots import (
        parse_robots_txt,
        robots_allowed,
    )

    rng = random.Random(9)
    lines = [
        "User-agent: *", "User-agent: mybot", "user-AGENT:", "Allow: /",
        "Disallow: /private", "Disallow:", "Allow: /*.php$", "Allow: /a*b",
        "Crawl-delay: 2", "Crawl-delay: fast", "Sitemap: http://x/s.xml",
        "# comment", "", "garbage line", ":", "Disallow: /p?q=*",
        "Allow: /$$", "Disallow: *", "User-agent: Mybot/2.1",
    ]
    for _ in range(200):
        txt = "\n".join(rng.choice(lines) for _ in range(rng.randint(0, 25)))
        rules = parse_robots_txt(txt, user_agent="mybot")
        for rx, _allow, _n in rules.rules:
            re.compile(rx)  # every emitted pattern must compile
        for path in ("/", "/private/x.php", "/a" * 5, "", "/p?q=zz"):
            assert robots_allowed(txt, path, "mybot") in (True, False)
