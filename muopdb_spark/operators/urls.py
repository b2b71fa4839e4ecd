"""URL-level curation — the first pass of every web-crawl pipeline
(C4, CCNet, RefinedWeb, Gopher all gate on URLs before touching
text): canonicalize URLs, extract the registered domain, dedup by
canonical URL, and cap the per-domain document count so no single
site dominates the mixture.

Everything here is pure Catalyst (lower / regexp_replace /
regexp_extract chains + one window for the caps) — map-side JVM
expressions with zero Python, so the pass costs one scan plus one
shuffle (the per-domain window) at any corpus size.

Registered-domain extraction here uses a HEURISTIC public-suffix
subset (the standard two-label rule, three labels under the common
country-code second-level domains like co.uk / com.au) because a
pure Column expression cannot carry a 10k-rule list. The FULL
Mozilla Public Suffix List lives in operators/psl.py (r14):
`with_registered_domain` resolves hosts against the vendored list
with broadcast joins — use it whenever a DataFrame-level pass is
acceptable; this expression-level heuristic remains for contexts
that need a bare Column and is disclosed rather than silently wrong
for exotic suffixes.

Reference parity note: the reference engine (hicder/muopdb) has no
URL operators; this family is brief-driven (training-data pipeline
requirement) like dedup/quality/sampling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

# tracking params stripped by canonicalization (the de-facto standard
# removal set: UTM campaign tags + click identifiers)
_TRACKING = (
    "utm_[a-z]+", "fbclid", "gclid", "msclkid", "mc_eid", "igshid",
    "ref_src",
)

# common country-code second-level domains where the registered
# domain is three labels (heuristic subset; see module docstring)
_CC_SLD = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za", "com.ar", "com.tr", "com.tw", "co.kr",
)


def url_normalize(col: Column | str) -> Column:
    """Canonical URL: lowercase scheme+host, the scheme's default port
    dropped (http:80 / https:443 ONLY — other ports are a different
    origin and survive), fragment dropped, tracking query params
    dropped case-insensitively (separators cleaned up), trailing slash
    on a bare path dropped. URLs without a scheme (relative hrefs)
    pass through trimmed but otherwise untouched — they have no
    authority to canonicalize and must never collapse together."""
    raw = F.trim(F.col(col) if isinstance(col, str) else col)
    # scheme://authority prefix, lowered; default port stripped HERE,
    # anchored to the authority (':80' in a path must survive)
    pre = F.lower(F.regexp_extract(raw, r"^([^/?#]*//[^/?#]*)", 1))
    pre = (
        F.when(pre.startswith("http://"),
               F.regexp_replace(pre, r":80$", ""))
        .when(pre.startswith("https://"),
              F.regexp_replace(pre, r":443$", ""))
        .otherwise(pre)
    )
    rest = F.regexp_extract(raw, r"^[^/?#]*//[^/?#]*(.*)$", 1)
    c = F.concat(pre, rest)
    c = F.regexp_replace(c, r"#.*$", "")  # fragment
    for p in _TRACKING:
        c = F.regexp_replace(c, rf"([?&])(?i:{p})=[^&#]*", "$1")
    c = F.regexp_replace(c, r"\?&+", "?")       # ?& left by removals
    c = F.regexp_replace(c, r"&&+", "&")
    c = F.regexp_replace(c, r"[?&]$", "")       # trailing separator
    c = F.regexp_replace(c, r"^([^?]*[^/?])/$", "$1")  # trailing slash
    # no scheme://authority -> not canonicalizable; keep the raw value
    return F.when(pre == "", raw).otherwise(c)


def url_host(col: Column | str) -> Column:
    """Lowercased hostname (port and credentials stripped)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(
        F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1)
    )


def url_registered_domain(col: Column | str) -> Column:
    """Registered domain of the URL's host: last two labels, or last
    three under a known cc-2LD (heuristic — see module docstring).
    A 'www.' prefix never survives."""
    host = url_host(col)
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    three = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    is_cc = F.lit(False)
    for sld in _CC_SLD:
        is_cc = is_cc | two.eqNullSafe(F.lit(sld))
    dom = F.when(is_cc & (three != ""), three).otherwise(two)
    # hostless (relative) URLs have no domain — NULL, never ''
    return F.when(dom == "", F.lit(None).cast("string")).otherwise(dom)


def url_dedup(
    df: DataFrame, *, url_col: str = "url", id_col: str = "doc_id",
) -> DataFrame:
    """Keep one document per canonical URL (lowest id wins — the
    deterministic keep-first rule every dedup op here uses). Adds
    `url_canon`."""
    out = df.withColumn("url_canon", url_normalize(url_col))
    w = Window.partitionBy("url_canon").orderBy(id_col)
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def domain_cap(
    df: DataFrame, *, cap: int, url_col: str = "url",
    id_col: str = "doc_id", order_col: str | None = None,
    salt_buckets: int = 16, domain_col: str | None = None,
) -> DataFrame:
    """Cap documents per registered domain (anti-dominance: no site
    contributes more than `cap` docs to the mixture). Keeps the top
    `cap` by `order_col` descending (quality-first) or by id ascending
    when no order column is given. Adds `domain`.

    SKEW-SAFE two-phase top-cap (the operators/skew.py shape): a
    single `row_number() over (partitionBy domain)` would route EVERY
    row of a domain to one task, and at crawl scale the head domain is
    1-2% of the corpus — a TB-sized straggler partition at 100 TB.
    Instead, rows are salted deterministically by id into
    `salt_buckets` lanes; phase 1 keeps the per-(domain, salt) top
    `cap`, bounding survivors at salt_buckets*cap per domain; phase 2
    re-ranks those survivors per domain and keeps the global top
    `cap`. The global top `cap` of a domain is a subset of the union
    of per-lane top `cap`s (each kept row ranks <= cap within its own
    lane), so the result is IDENTICAL to the single-window form — the
    tiebreak on the unique id makes the order total. NULL domains
    (relative URLs) are not one pseudo-site: they bypass the cap
    entirely and never enter either window.

    ``domain_col`` names a PRE-COMPUTED domain column to cap on
    instead of deriving one with the cc-2LD heuristic expression —
    pass the output of psl.with_registered_domain here for
    full-Public-Suffix-List grouping."""
    if cap < 1:
        raise ValueError(f"domain_cap: cap must be >= 1, got {cap}")
    if salt_buckets < 1:
        raise ValueError(
            f"domain_cap: salt_buckets must be >= 1, got {salt_buckets}"
        )
    if domain_col is not None:
        if domain_col not in df.columns:
            raise ValueError(
                f"domain_cap: domain_col {domain_col!r} not in frame"
            )
        out = (df if domain_col == "domain"
               else df.withColumn("domain", F.col(domain_col)))
    else:
        out = df.withColumn("domain", url_registered_domain(url_col))
    order = (
        [F.col(order_col).desc(), F.col(id_col).asc()]
        if order_col else [F.col(id_col).asc()]
    )
    nulls = out.filter(F.col("domain").isNull())
    sited = out.filter(F.col("domain").isNotNull()).withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy("domain", "_salt").orderBy(*order)
    survivors = (
        sited.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= cap)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy("domain").orderBy(*order)
    capped = (
        survivors.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
    return capped.unionByName(nulls)


def domain_link_edges(
    pages: DataFrame, links: DataFrame, *,
    url_col: str = "url", href_col: str = "href",
    id_col: str = "doc_id", psl: bool = False,
) -> DataFrame:
    """(src_domain, dst_domain, n_links) — the domain-level link graph
    from pages (id, url) and their extracted anchors (id, href — the
    operators/html.extract_links output). Relative hrefs resolve to
    the page's own domain and self-edges carry no endorsement, so
    both drop; NULL domains (unparseable hosts) drop. Pure Catalyst:
    one broadcast-able join on the page id + one groupBy on the edge
    key. ``psl=True`` roots domains with the full Public Suffix List
    (operators/psl.py — adds the PSL broadcast joins on each side;
    exotic cc-2LDs and private-registry hosts like github.io then
    count each site separately instead of lumping under the suffix)."""
    if psl:
        from muopdb_spark.operators.psl import with_registered_domain

        src = with_registered_domain(
            pages.select(id_col, url_col), url_col=url_col,
            out_col="src_domain",
        ).select(id_col, "src_domain")
        dst = with_registered_domain(
            links.select(id_col, href_col), url_col=href_col,
            out_col="dst_domain",
        ).select(id_col, "dst_domain")
        return (
            dst.join(src, id_col)
            .filter(
                F.col("src_domain").isNotNull()
                & F.col("dst_domain").isNotNull()
                & (F.col("src_domain") != F.col("dst_domain"))
            )
            .groupBy("src_domain", "dst_domain")
            .agg(F.count("*").cast("long").alias("n_links"))
        )
    src = pages.select(
        F.col(id_col).alias(id_col),
        url_registered_domain(url_col).alias("src_domain"),
    )
    dst = links.select(
        F.col(id_col).alias(id_col),
        url_registered_domain(href_col).alias("dst_domain"),
    )
    return (
        dst.join(src, id_col)
        .filter(
            F.col("src_domain").isNotNull()
            & F.col("dst_domain").isNotNull()
            & (F.col("src_domain") != F.col("dst_domain"))
        )
        .groupBy("src_domain", "dst_domain")
        .agg(F.count("*").cast("long").alias("n_links"))
    )


def domain_quality_prior(
    pages: DataFrame, links: DataFrame, *,
    url_col: str = "url", href_col: str = "href",
    id_col: str = "doc_id", damping: float = 0.85, n_iter: int = 5,
) -> DataFrame:
    """URL quality prior from the link graph (the RefinedWeb/Gopher
    idea: inbound attention at domain level is a cheap corpus-wide
    quality signal): (domain, in_domains, n_inlinks, rank) — distinct
    referring domains, inbound link count, and fixed-iteration
    weighted PageRank (operators/graph.pagerank). Join to documents
    on url_registered_domain(url) and combine with the text-quality
    score downstream."""
    from muopdb_spark.operators.graph import pagerank

    edges = domain_link_edges(
        pages, links, url_col=url_col, href_col=href_col, id_col=id_col,
    )
    indeg = edges.groupBy("dst_domain").agg(
        F.count_distinct("src_domain").cast("long").alias("in_domains"),
        F.sum("n_links").cast("long").alias("n_inlinks"),
    )
    ranks = pagerank(
        edges, src_col="src_domain", dst_col="dst_domain",
        weight_col="n_links", damping=damping, n_iter=n_iter,
    )
    return (
        ranks.join(
            indeg, ranks["node"] == indeg["dst_domain"], "left"
        )
        .select(
            F.col("node").alias("domain"),
            F.coalesce("in_domains", F.lit(0)).alias("in_domains"),
            F.coalesce("n_inlinks", F.lit(0)).alias("n_inlinks"),
            "rank",
        )
    )
