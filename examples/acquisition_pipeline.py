"""Crawl-acquisition pipeline — the full path from raw crawl archives
to a curated page table, each stage one of the engine's operators:

    synthetic crawl (pages + a robots.txt per host) ->
    WARC export (sources/warc.py, gzip member-per-record shards) ->
    CDXJ capture index (sources/cdx.py: SURT keys, sorted shards +
    cluster.idx) + a targeted SURT lookup demo ->
    archive read (byte-range indexed) ->
    robots gate (RFC 9309, operators/robots.py — broadcast rule fold)
    -> HTML -> text + links (operators/html.py) ->
    sitemap <loc> discovery feeding the frontier ->
    URL canonicalize + dedup + PSL-grouped per-domain cap
    (operators/urls.py + operators/psl.py full Public Suffix List) ->
    link-graph domain-quality prior (operators/graph.py PageRank) ->
    URL-frontier streaming admission replay
    (streaming/admission.py url_state_path) ->
    per-stage funnel report

Run: python examples/acquisition_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from muopdb_spark.operators.graph import pagerank
    from muopdb_spark.operators.html import extract_links, extract_text
    from muopdb_spark.operators.psl import with_registered_domain
    from muopdb_spark.operators.robots import (
        parse_robots,
        robots_gate,
        sitemap_urls,
    )
    from muopdb_spark.operators.urls import (
        domain_cap,
        domain_link_edges,
        url_dedup,
    )
    from muopdb_spark.session import get_spark
    from muopdb_spark.sources.cdx import build_cdxj, lookup_warc
    from muopdb_spark.sources.warc import read_warc, write_warc_sharded
    from muopdb_spark.streaming.admission import admit_batch, bootstrap_corpus

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("acquisition-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="muopdb_acq_")
    try:
        # ---- 0. the "crawler output": deterministic pages across 23
        # hosts (some under PSL-exotic suffixes), with messy URLs,
        # realistic tag soup, and cross-site links for the link graph
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .select("doc_id", "text")
        d = F.col("doc_id")
        host = F.concat(
            F.lit("www.site"), (d % 23).cast("string"),
            F.when(d % 23 % 3 == 0, F.lit(".co.il"))
            .when(d % 23 % 3 == 1, F.lit(".github.io"))
            .otherwise(F.lit(".com")),
        )
        url = F.concat(
            F.lit("HTTPS://"), F.upper(host), F.lit("/p/"),
            d.cast("string"),
            F.when(d % 3 == 0, F.lit("?utm_source=crawl"))
            .otherwise(F.lit("")),
        )
        href = F.concat(
            F.lit("https://www.site"), ((d * 7) % 23).cast("string"),
            F.when((d * 7) % 23 % 3 == 0, F.lit(".co.il"))
            .when((d * 7) % 23 % 3 == 1, F.lit(".github.io"))
            .otherwise(F.lit(".com")), F.lit("/ref"),
        )
        pages = docs.select(
            "doc_id",
            url.alias("url"),
            host.alias("host"),
            F.concat(
                F.lit("<html><head><title>doc</title></head><body>"
                      "<nav>chrome</nav><p>"),
                F.col("text"),
                F.lit("</p><a href='"), href, F.lit("'>see also</a>"
                      # a link farm in a PLAIN div: invisible to tag
                      # suppression, dropped by html2's density pass
                      "<div><a href='/t/1'>tag one</a> "
                      "<a href='/t/2'>tag two</a> "
                      "<a href='/t/3'>tag three</a></div>"
                      "<footer>footer</footer></body></html>"),
            ).alias("html"),
        )
        n0 = pages.count()

        # ---- 1. WARC export + CDXJ capture index
        wdir = os.path.join(tmp, "crawl")
        cdir = os.path.join(tmp, "cdx")
        write_warc_sharded(pages, wdir, payload_col="html", n_shards=4)
        manifest = build_cdxj(spark, wdir, cdir, n_shards=2).collect()
        print(f"archive: {n0} pages in 4 WARC shards; CDXJ index "
              f"{sum(r['n_entries'] for r in manifest)} entries in "
              f"{len(manifest)} sorted shards + cluster.idx")

        # targeted lookup: fetch 3 specific pages without a scan
        some = pages.limit(3).select("url")
        hits = lookup_warc(spark, wdir, cdir, some).count()
        print(f"cdx lookup: {hits} records fetched by SURT key "
              f"(byte-range reads, no archive scan)")

        # ---- 2. read the archive back + robots politeness gate
        crawled = read_warc(spark, wdir, types=("response",)).select(
            F.col("target_uri").alias("url"),
            F.decode("payload", "UTF-8").alias("html"),
        ).join(pages.select("doc_id", "url"), "url")
        robots = pages.select("host").distinct().withColumn(
            "robots_txt",
            F.when(
                F.xxhash64("host") % 5 == 0,
                F.lit("User-agent: *\nDisallow: /p/\n"),
            ).otherwise(F.lit("User-agent: *\nDisallow: /private/\n")),
        )
        polite = robots_gate(crawled, parse_robots(robots)) \
            .filter("robots_allowed").drop("robots_allowed")
        n1 = polite.count()
        print(f"robots gate (RFC 9309): {n0} -> {n1} pages "
              f"(disallowed hosts dropped before any text work)")

        # ---- 2b. sitemap discovery feeds the next crawl's frontier
        sitemaps = pages.select("host").distinct().limit(5).withColumn(
            "sitemap_xml",
            F.concat(
                F.lit("<urlset><url><loc>https://"), F.col("host"),
                F.lit("/fresh/1</loc></url><url><loc>https://"),
                F.col("host"), F.lit("/fresh/2</loc></url></urlset>"),
            ),
        )
        n_locs = sitemap_urls(sitemaps).count()
        print(f"sitemap discovery: {n_locs} frontier candidates from "
              f"5 hosts' sitemaps")

        # ---- 3. HTML -> text + links; density pass drops the link
        # farm the tag pass keeps (r15)
        from muopdb_spark.operators.html import extract_main_content

        extracted = extract_text(polite, html_col="html")
        main = extract_main_content(polite, html_col="html")
        links = extract_links(polite, html_col="html")
        tag_chars = extracted.agg(
            F.sum(F.length("text"))).collect()[0][0]
        main_chars = main.agg(F.sum(F.length("text"))).collect()[0][0]
        print(f"extract: {extracted.count()} text docs, "
              f"{links.count()} anchors; density main-content pass "
              f"trims {tag_chars - main_chars} boilerplate chars "
              f"({tag_chars} -> {main_chars}) — the plain-div link "
              f"farms tag suppression cannot see")

        # ---- 4. URL pass with FULL-PSL domain grouping
        kept = url_dedup(polite)
        kept = with_registered_domain(
            kept, url_col="url", out_col="psl_domain"
        )
        capped = domain_cap(kept, cap=10**6, domain_col="psl_domain")
        n2 = capped.count()
        n_dom = capped.select("psl_domain").distinct().count()
        print(f"url pass: {n1} -> {n2} after canonical dedup; "
              f"{n_dom} PSL registered domains (github.io subdomains "
              f"each count as their own site)")

        # ---- 5. link-graph domain-quality prior
        edges = domain_link_edges(polite, links, psl=True)
        ranks = pagerank(
            edges, src_col="src_domain", dst_col="dst_domain",
            weight_col="n_links", n_iter=3,
        )
        top = ranks.orderBy(F.desc("rank")).limit(3).collect()
        print("link-graph prior (top-3): "
              + ", ".join(f"{r[0]} rank={r['rank']:.5f}" for r in top))

        # ---- 6. URL-frontier streaming admission: a re-crawl batch
        # is rejected without touching content
        corpus = os.path.join(tmp, "corpus")
        sig = os.path.join(tmp, "sigs")
        rej = os.path.join(tmp, "rejected")
        state = os.path.join(tmp, "urlstate")
        seed = capped.join(extracted.select("doc_id", "text"), "doc_id") \
            .select("doc_id", "text", "url")
        bootstrap_corpus(seed.limit(0), corpus, sig)
        admit_batch(seed, 1, corpus, sig, rej, url_state_path=state)
        admit_batch(seed, 2, corpus, sig, rej, url_state_path=state)
        admitted = spark.read.parquet(corpus).count()
        rejected = spark.read.parquet(rej) \
            .filter("reason = 'url_duplicate' and batch_id = 2").count()
        print(f"frontier admission: batch1 admitted {admitted}; the "
              f"full re-crawl (batch2) rejected {rejected} as "
              f"url_duplicate before any content gate")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
