"""Tests for repetition-based quality stats and duplicate-cluster
connected components."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from muopdb_spark.operators.graph import connected_components, dup_clusters
from muopdb_spark.operators.quality import repetition_stats

# ---------------------------------------------------------- repetition


def test_repetition_stats_hand_computed(spark):
    # "a b a b a": tokens 5, distinct 2; 2-grams: "a b" x2, "b a" x2 →
    # top is "a b" (tie broken by gram asc), frac 2/4; 3-grams:
    # "a b a" x2? -> grams: aba, bab, aba → dup occurrences 2 of 3
    df = spark.createDataFrame([(1, "a b a b a")], "doc_id long, text string")
    r = repetition_stats(df, top_n=2, dup_n=3).collect()[0]
    assert r.n_tokens == 5 and r.n_distinct_tokens == 2
    assert r.distinct_ratio == 0.4
    assert r.top_gram == "a b" and r.top_gram_frac == 0.5
    assert r.dup_gram_frac == pytest.approx(round(2 / 3, 6))


def test_repetition_stats_no_repeats(spark):
    df = spark.createDataFrame([(1, "one two three four")], "doc_id long, text string")
    r = repetition_stats(df, top_n=2, dup_n=3).collect()[0]
    assert r.distinct_ratio == 1.0
    assert r.top_gram_frac == pytest.approx(round(1 / 3, 6))
    assert r.dup_gram_frac == 0.0


def test_repetition_stats_short_doc_kept(spark):
    df = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    r = repetition_stats(df, top_n=2, dup_n=3).collect()[0]
    assert r.n_tokens == 1 and r.top_gram is None
    assert r.top_gram_frac == 0.0 and r.dup_gram_frac == 0.0


# ---------------------------------------------------------- components


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_components_chain_and_isolated(spark):
    # chain 1-2-3-4 plus isolated 9: one component labeled 1, one {9}
    comp = connected_components(
        _nodes(spark, [1, 2, 3, 4, 9]),
        _edges(spark, [(1, 2), (2, 3), (3, 4)]),
    )
    got = {r.id: r.component for r in comp.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 9: 9}


def test_components_merge_two_clusters(spark):
    # two triangles bridged by one edge collapse to min id 1
    edges = [(1, 2), (2, 3), (5, 6), (6, 7), (3, 5)]
    comp = connected_components(_nodes(spark, [1, 2, 3, 5, 6, 7]), _edges(spark, edges))
    assert {r.component for r in comp.collect()} == {1}


def test_components_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError):
        connected_components(
            _nodes(spark, list(range(10))),
            _edges(spark, [(i, i + 1) for i in range(9)]),
            max_iter=2,
        )


def test_dup_clusters_report(spark):
    nodes = spark.createDataFrame([(i,) for i in [10, 11, 12, 20, 21, 30]], "doc_id long")
    pairs = spark.createDataFrame([(10, 11), (11, 12), (20, 21)], "doc_a long, doc_b long")
    rows = {r.doc_id: r for r in dup_clusters(nodes, pairs).collect()}
    assert rows[10].cluster_id == 10 and rows[12].cluster_id == 10
    assert rows[10].cluster_size == 3 and rows[20].cluster_size == 2
    assert rows[30].cluster_size == 1 and rows[30].is_canonical
    assert rows[10].is_canonical and not rows[11].is_canonical
    # exactly one canonical per cluster
    canon = [r for r in rows.values() if r.is_canonical]
    assert len(canon) == 3


# --------------------------------------- t11 per-source calibration


def test_t11_approx_matches_exact(spark, sf_dir):
    """The scale-safe two-pass threshold form must agree with the exact
    cume_dist window on the keep-set, except possibly documents whose
    quality TIES the per-source boundary score (the exact form breaks
    ties by id; a threshold cannot)."""
    from muopdb_spark.operators.quality import quality_percentile_by_source

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = quality_percentile_by_source(docs, keep_frac=0.7).collect()
    approx = quality_percentile_by_source(
        docs, keep_frac=0.7, approx=True
    ).collect()
    assert len(exact) == len(approx) == docs.count()

    kept_exact = {r.doc_id for r in exact if r.keep}
    kept_approx = {r.doc_id for r in approx if r.keep}
    # any disagreement must sit exactly on a boundary-score tie
    thr = {r.source: r.q_thr for r in approx}
    quality = {r.doc_id: (r.source, r.quality) for r in approx}
    for doc in kept_exact ^ kept_approx:
        src, q = quality[doc]
        assert abs(q - thr[src]) < 1e-9, (
            f"doc {doc} disagrees off-boundary: quality={q} thr={thr[src]}"
        )
    # a threshold keeps the WHOLE boundary tie-group, so approx can
    # only ADD boundary-tied docs relative to the exact form
    assert kept_exact <= kept_approx
    # and the disagreement is a boundary fringe, not a different answer
    assert len(kept_approx - kept_exact) <= 0.05 * len(exact)


def test_t11_approx_plan_has_no_window(spark, sf_dir):
    """Plan audit: the approx path must contain NO window operator (the
    hot-partition shape it exists to avoid) and must broadcast the
    threshold table; the exact path is the one with the window."""
    from muopdb_spark.operators.quality import quality_percentile_by_source

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    approx_plan = quality_percentile_by_source(
        docs, keep_frac=0.7, approx=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in approx_plan
    assert "BroadcastHashJoin" in approx_plan
    exact_plan = quality_percentile_by_source(
        docs, keep_frac=0.7
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" in exact_plan


# ---------------------------------------------- r14: link-graph prior


def test_pagerank_uniform_on_symmetric_cycle(spark):
    from muopdb_spark.operators.graph import pagerank

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    r = {x["node"]: x["rank"] for x in pagerank(e, n_iter=8).collect()}
    # a symmetric cycle is rank-uniform and mass-conserving
    for v in r.values():
        assert abs(v - 1 / 3) < 1e-9
    assert abs(sum(r.values()) - 1.0) < 1e-9


def test_pagerank_dangling_mass_redistributes(spark):
    from muopdb_spark.operators.graph import pagerank

    # b is a sink: without redistribution total mass decays below 1
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    r = {x["node"]: x["rank"] for x in pagerank(e, n_iter=6).collect()}
    assert abs(sum(r.values()) - 1.0) < 1e-9
    assert r["b"] > r["a"]


def test_pagerank_weighted_and_self_loops(spark):
    from muopdb_spark.operators.graph import pagerank

    # c gets 3x a's outflow vs b; a's self-loop is dropped
    e = spark.createDataFrame(
        [("a", "b", 1.0), ("a", "c", 3.0), ("a", "a", 99.0),
         ("b", "a", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    r = {x["node"]: x["rank"]
         for x in pagerank(e, weight_col="w", n_iter=10).collect()}
    assert r["c"] > r["b"]
    assert abs(sum(r.values()) - 1.0) < 1e-9
    import pytest

    with pytest.raises(ValueError, match="damping"):
        pagerank(e, damping=1.5)
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(e, n_iter=0)


def test_domain_quality_prior_end_to_end(spark):
    from muopdb_spark.operators.html import extract_links
    from muopdb_spark.operators.urls import domain_quality_prior

    pages = spark.createDataFrame(
        [(i,
          f"https://src{i % 2}.com/p/{i}",
          "<a href='https://hub.com/x'>h</a>"
          "<a href='/relative'>r</a>"
          f"<a href='https://src{i % 2}.com/self'>s</a>")
         for i in range(10)],
        "doc_id long, url string, html string",
    )
    links = extract_links(pages)
    out = {r["domain"]: r
           for r in domain_quality_prior(pages, links).collect()}
    # relative + self links dropped; hub.com referenced by both srcs
    assert out["hub.com"]["in_domains"] == 2
    assert out["hub.com"]["n_inlinks"] == 10
    assert out["hub.com"]["rank"] == max(v["rank"] for v in out.values())
