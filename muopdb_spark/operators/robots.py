"""Robots Exclusion Protocol (RFC 9309) and sitemap URL discovery —
the crawl-politeness half of the acquisition family. After WARC
ingestion (sources/warc.py), HTML extraction (operators/html.py) and
URL gating (operators/urls.py), a real crawl pipeline must also honor
per-host robots.txt rules and discover URLs from sitemaps; both are
public specs (RFC 9309; sitemaps.org XML).

Scale shape: robots.txt files are a |hosts|-sized table — the SMALL
side. The expensive parse (group selection, pattern -> regex
compilation) runs ONCE per robots file in an Arrow mapInPandas pass
over that small side. The URL corpus — the 100 TB side — is then
gated with a broadcast join on host plus a pure-JVM higher-order
fold over the pre-compiled rule array (regexp_like inside
filter/aggregate lambdas): zero Python per URL, no corpus shuffle.

RFC 9309 semantics implemented:
  - groups = consecutive user-agent lines + following allow/disallow
    rules; rules before any user-agent line are ignored; groups with
    the same effective user-agent merge (§2.2.1);
  - group selection for a crawler product token: case-insensitive,
    most-specific (longest) user-agent value that is a prefix of the
    token; '*' groups apply only when nothing else matches (§2.2.1);
  - path matching is case-sensitive on the percent-encoded
    path(+query), '*' matches any octet sequence, '$' anchors the
    end (§2.2.2-2.2.3);
  - precedence: the matching rule with the MOST OCTETS in its pattern
    wins; a tie between allow and disallow resolves to allow
    (§2.2.2); no matching rule -> allowed;
  - an empty disallow value disallows nothing (§5.1 example);
  - unknown lines are ignored; crawl-delay (de-facto extension) and
    sitemap (sitemaps.org cross-reference, §5.2) are collected.

Reference parity note: the reference engine (hicder/muopdb) has no
crawl operators; this family is brief-driven (training-data pipeline
requirement) like WARC/HTML/URL.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import NamedTuple

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "RobotsRules",
    "parse_robots_txt",
    "robots_allowed",
    "parse_robots",
    "robots_gate",
    "extract_sitemap_locs",
    "sitemap_urls",
]


class RobotsRules(NamedTuple):
    """Parsed, group-selected robots rules for one crawler token."""

    rules: list[tuple[str, bool, int]]  # (regex, allow, pattern_octets)
    sitemaps: list[str]
    crawl_delay: float | None


def _pattern_to_regex(pattern: str) -> str:
    """RFC 9309 path pattern -> anchored Java/Python-compatible regex:
    '*' -> '.*', trailing '$' -> end anchor, everything else literal."""
    anchored_end = pattern.endswith("$")
    body = pattern[:-1] if anchored_end else pattern
    out = ["^"]
    for ch in body:
        if ch == "*":
            out.append(".*")
        else:
            out.append(re.escape(ch))
    if anchored_end:
        out.append("$")
    return "".join(out)


def parse_robots_txt(content: str, user_agent: str = "*") -> RobotsRules:
    """Parse one robots.txt and select the rule group for
    ``user_agent`` (a product token, e.g. 'mybot'). Total: malformed
    lines are skipped, never raised on."""
    token = user_agent.strip().lower()
    # groups[ua_value] -> list of (pattern, allow); same-UA groups merge
    groups: dict[str, list[tuple[str, bool]]] = {}
    sitemaps: list[str] = []
    delays: dict[str, float] = {}
    current_uas: list[str] = []
    seen_rule_since_ua = True  # rules before any UA line are dropped
    for raw in (content or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            ua = value.lower()
            if seen_rule_since_ua:
                current_uas = []
                seen_rule_since_ua = False
            if ua:
                current_uas.append(ua)
                groups.setdefault(ua, [])
        elif field in ("allow", "disallow"):
            seen_rule_since_ua = True
            if not current_uas:
                continue
            if not value:
                # 'Disallow:' (empty) disallows nothing; 'Allow:'
                # (empty) allows nothing new — both are no-op rules
                continue
            for ua in current_uas:
                groups.setdefault(ua, []).append((value, field == "allow"))
        elif field == "crawl-delay":
            seen_rule_since_ua = True
            try:
                for ua in current_uas:
                    delays[ua] = float(value)
            except ValueError:
                pass
        elif field == "sitemap":
            # sitemap lines are global, not group-scoped (§5.2) —
            # and TRANSPARENT to grouping: a Sitemap: line between two
            # User-agent lines must not terminate the user-agent run,
            # or 'User-agent: a / Sitemap: x / User-agent: b /
            # Disallow: /y' would strand agent a with no rules
            # (RFC 9309 §2.2.1: only rule lines end a startgroupline
            # run; fixed r15, ADVICE)
            if value:
                sitemaps.append(value)

    # group selection: longest UA value that prefixes the token;
    # '*' only when nothing specific matches
    chosen = None
    if token and token != "*":
        specific = [
            ua for ua in groups if ua != "*" and token.startswith(ua)
        ]
        if specific:
            best_len = max(len(u) for u in specific)
            merged: list[tuple[str, bool]] = []
            for ua in specific:
                if len(ua) == best_len:
                    merged.extend(groups[ua])
            chosen = merged
            delay = max(
                (delays[u] for u in specific if len(u) == best_len and u in delays),
                default=None,
            )
    if chosen is None:
        chosen = groups.get("*", [])
        delay = delays.get("*")
    rules = [
        (_pattern_to_regex(p), allow, len(p.encode("utf-8")))
        for p, allow in chosen
    ]
    return RobotsRules(rules, sitemaps, delay)


def robots_allowed(
    content: str, path: str, user_agent: str = "*"
) -> bool:
    """Pure-Python referee: is ``path`` (path + optional ?query)
    fetchable for ``user_agent`` under this robots.txt?"""
    parsed = parse_robots_txt(content, user_agent)
    best_len = -1
    best_allow = True
    for regex, allow, plen in parsed.rules:
        if re.match(regex, path or "/"):
            if plen > best_len:
                best_len, best_allow = plen, allow
            elif plen == best_len:
                best_allow = best_allow or allow
    return best_allow


RULES_SCHEMA = (
    "host string, rules array<struct<regex:string,allow:boolean,"
    "plen:int>>, sitemaps array<string>, crawl_delay double"
)


def parse_robots(
    robots: DataFrame,
    *,
    content_col: str = "robots_txt",
    host_col: str = "host",
    user_agent: str = "*",
) -> DataFrame:
    """(host, rules, sitemaps, crawl_delay): parse + group-select each
    robots.txt ONCE (Arrow pass over the |hosts|-sized table); rules
    carry pre-compiled regexes so the corpus-side gate is pure JVM."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"host": [], "rules": [], "sitemaps": [], "crawl_delay": []}
            for host, content in zip(pdf[host_col], pdf[content_col]):
                parsed = parse_robots_txt(content or "", user_agent)
                out["host"].append(host)
                out["rules"].append(
                    [
                        {"regex": r, "allow": a, "plen": n}
                        for r, a, n in parsed.rules
                    ]
                )
                out["sitemaps"].append(list(parsed.sitemaps))
                out["crawl_delay"].append(parsed.crawl_delay)
            yield pd.DataFrame(out)

    return robots.mapInPandas(gen, RULES_SCHEMA)


def _url_path_query(col: Column | str) -> Column:
    """The RFC match target: percent-encoded path (+'?'+query) of a
    URL; fragment excluded; empty path -> '/'."""
    c = F.col(col) if isinstance(col, str) else col
    rest = F.regexp_extract(
        c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1
    )
    return F.when(rest == "", F.lit("/")).otherwise(rest)


def robots_gate(
    urls: DataFrame,
    parsed_robots: DataFrame,
    *,
    url_col: str = "url",
    out_col: str = "robots_allowed",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Gate the URL corpus against parsed robots rules: adds
    ``out_col`` (boolean; hosts with no robots row are allowed — the
    RFC's unavailable-robots default, §2.3.1.3).

    Plan: one broadcast (or shuffle, for very large rule tables) left
    join on host + a JVM fold over each URL's rule array implementing
    the longest-match / allow-wins-ties precedence — regexp_like
    inside filter(), no Python, the corpus is never re-shuffled when
    broadcast. Set broadcast_rules=False if the parsed table exceeds
    broadcastable size (millions of hosts x large rule lists); the
    join then shuffles BOTH sides on host — prefer pre-partitioning
    the corpus by host upstream in that regime.
    """
    from muopdb_spark.operators.urls import url_host

    side = parsed_robots.select(
        F.col("host").alias("_rb_host"), F.col("rules").alias("_rb_rules")
    )
    if broadcast_rules:
        side = F.broadcast(side)
    out = urls.withColumn("_rb_path", _url_path_query(url_col)).join(
        side, url_host(url_col) == F.col("_rb_host"), "left"
    )
    matching = F.filter(
        F.col("_rb_rules"),
        lambda r: F.regexp_like(F.col("_rb_path"), r["regex"]),
    )
    best = F.aggregate(
        matching,
        F.struct(
            F.lit(-1).alias("plen"), F.lit(True).alias("allow")
        ),
        lambda acc, r: F.when(
            r["plen"] > acc["plen"],
            F.struct(r["plen"].alias("plen"), r["allow"].alias("allow")),
        )
        .when(
            r["plen"] == acc["plen"],
            F.struct(
                acc["plen"].alias("plen"),
                (acc["allow"] | r["allow"]).alias("allow"),
            ),
        )
        .otherwise(acc),
    )
    allowed = F.when(F.col("_rb_rules").isNull(), F.lit(True)).otherwise(
        best["allow"]
    )
    return out.withColumn(out_col, allowed).drop(
        "_rb_host", "_rb_rules", "_rb_path"
    )


# ------------------------------------------------------------ sitemaps

_LOC_RE = re.compile(
    r"<(loc|sitemap|url|sitemapindex|urlset)[\s>]|</(loc)\s*>", re.I
)


def extract_sitemap_locs(content: str) -> list[tuple[str, str]]:
    """[(loc, kind)] from one sitemap XML document, where kind is
    'url' (a page, <urlset>) or 'sitemap' (a child index,
    <sitemapindex>). Regex-scanned rather than DOM-parsed so real-world
    truncated/invalid XML still yields its intact entries (the same
    totality stance as the HTML extractor); CDATA unwrapped, the five
    XML entities decoded (sitemaps.org requires entity-escaped URLs)."""
    out: list[tuple[str, str]] = []
    for m in re.finditer(
        r"<(url|sitemap)\b[^>]*>(.*?)</\1\s*>",
        content or "",
        re.I | re.S,
    ):
        kind = m.group(1).lower()
        inner = m.group(2)
        loc = re.search(r"<loc\s*>(.*?)</loc\s*>", inner, re.I | re.S)
        if not loc:
            continue
        val = loc.group(1).strip()
        cdata = re.fullmatch(r"<!\[CDATA\[(.*)\]\]>", val, re.S)
        if cdata:
            val = cdata.group(1).strip()
        for ent, ch in (
            ("&amp;", "&"),
            ("&lt;", "<"),
            ("&gt;", ">"),
            ("&quot;", '"'),
            ("&apos;", "'"),
        ):
            val = val.replace(ent, ch)
        if val:
            out.append((val, "url" if kind == "url" else "sitemap"))
    return out


SITEMAP_SCHEMA = "host string, loc string, kind string"


def sitemap_urls(
    sitemaps: DataFrame,
    *,
    content_col: str = "sitemap_xml",
    host_col: str = "host",
) -> DataFrame:
    """(host, loc, kind) — one row per <loc> entry across the sitemap
    table (Arrow pass; 'url' rows feed the URL family, 'sitemap' rows
    are child indexes for the caller's fetch loop)."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts: list = []
            locs: list = []
            kinds: list = []
            for host, content in zip(pdf[host_col], pdf[content_col]):
                for loc, kind in extract_sitemap_locs(content or ""):
                    hosts.append(host)
                    locs.append(loc)
                    kinds.append(kind)
            yield pd.DataFrame({"host": hosts, "loc": locs, "kind": kinds})

    return sitemaps.mapInPandas(gen, SITEMAP_SCHEMA)
