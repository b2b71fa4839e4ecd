"""BM25 scoring and reciprocal rank fusion."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from muopdb_spark.operators.relevance import bm25_scores, rrf_fuse


def _toks(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, toks array<string>")


def test_bm25_hand_computed(spark):
    # 3 docs; query = ["cat"]; df(cat)=2, N=3
    docs = _toks(spark, [
        (1, ["cat", "sat", "cat"]),     # tf=2, dl=3
        (2, ["cat", "dog"]),            # tf=1, dl=2
        (3, ["dog", "bird"]),           # no match
    ])
    out = {r.doc_id: r.bm25 for r in bm25_scores(docs, ["cat"]).collect()}
    assert set(out) == {1, 2}
    avgdl = (3 + 2 + 2) / 3
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    k1, b = 1.2, 0.75

    def s(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert out[1] == pytest.approx(s(2, 3), rel=1e-12)
    assert out[2] == pytest.approx(s(1, 2), rel=1e-12)
    # higher tf with modest length penalty still wins
    assert out[1] > out[2]


def test_bm25_rare_term_outweighs_common(spark):
    docs = _toks(spark, [
        (i, ["common"] + (["rare"] if i == 0 else [])) for i in range(10)
    ])
    out = {r.doc_id: r.bm25 for r in bm25_scores(docs, ["common", "rare"]).collect()}
    # doc 0 has both terms; the rare term dominates its score
    assert out[0] == max(out.values())
    only_common = out[1]
    assert out[0] > 2 * only_common


def test_bm25_multi_term_sums(spark):
    docs = _toks(spark, [(1, ["a", "b"]), (2, ["a"]), (3, ["b"])])
    both = {r.doc_id: r.bm25 for r in bm25_scores(docs, ["a", "b"]).collect()}
    a_only = {r.doc_id: r.bm25 for r in bm25_scores(docs, ["a"]).collect()}
    b_only = {r.doc_id: r.bm25 for r in bm25_scores(docs, ["b"]).collect()}
    assert both[1] == pytest.approx(a_only[1] + b_only[1], rel=1e-12)


def test_rrf_hand_computed(spark):
    a = spark.createDataFrame([(1, 0.1), (2, 0.2), (3, 0.3)], "doc_id long, score double")
    b = spark.createDataFrame([(3, 9.0), (1, 5.0)], "doc_id long, score double")
    rows = {r.doc_id: r for r in rrf_fuse(a, b, k=60).collect()}
    # a (asc): 1,2,3 ; b (desc): 3,1
    assert (rows[1].rank_a, rows[1].rank_b) == (1, 2)
    assert (rows[3].rank_a, rows[3].rank_b) == (3, 1)
    assert rows[2].rank_b is None
    assert rows[1].rrf == pytest.approx(1 / 61 + 1 / 62)
    assert rows[3].rrf == pytest.approx(1 / 63 + 1 / 61)
    assert rows[2].rrf == pytest.approx(1 / 62)
    # doc in both lists beats doc in one
    assert rows[1].rrf > rows[2].rrf


def test_rrf_deterministic_tiebreak(spark):
    a = spark.createDataFrame([(5, 1.0), (2, 1.0)], "doc_id long, score double")
    b = spark.createDataFrame([(5, 1.0), (2, 1.0)], "doc_id long, score double")
    rows = {r.doc_id: r for r in rrf_fuse(a, b).collect()}
    # equal scores: lower id ranks first in BOTH orderings
    assert rows[2].rank_a == 1 and rows[2].rank_b == 1
    assert rows[5].rank_a == 2 and rows[5].rank_b == 2


def test_bm25_precomputed_stats_skip_jobs_and_match(spark):
    """corpus_stats + n_docs/avgdl passthrough: same scores as the
    self-computed path, and building the scoring plan schedules NO
    driver-side stats job (the count()/first() calls of the old shape)."""
    from muopdb_spark.index.terms import corpus_stats

    docs = spark.createDataFrame(
        [(1, ["cat", "dog"]), (2, ["cat", "cat", "fish"]), (3, ["bird"])],
        "doc_id long, toks array<string>",
    )
    n, avgdl = corpus_stats(docs, tokens_col="toks")
    assert n == 3 and avgdl == pytest.approx((2 + 3 + 1) / 3)
    auto = {r.doc_id: r.bm25 for r in bm25_scores(docs, ["cat"]).collect()}
    pre = {
        r.doc_id: r.bm25
        for r in bm25_scores(docs, ["cat"], n_docs=n, avgdl=avgdl).collect()
    }
    assert auto.keys() == pre.keys()
    for k in auto:
        assert auto[k] == pytest.approx(pre[k])
    # plan construction with precomputed stats launches zero Spark jobs
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    bm25_scores(docs, ["cat"], n_docs=n, avgdl=avgdl)
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before), "stats job ran despite precomputed stats"
