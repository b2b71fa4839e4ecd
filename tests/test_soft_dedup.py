"""Tests for the r8 duplication-aware operators: quality-aware
cluster-representative selection (operators/graph.cluster_representatives)
and soft-dedup reweighting (operators/dedup.soft_dedup_weights)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from muopdb_spark.operators.dedup import soft_dedup_weights
from muopdb_spark.operators.graph import cluster_representatives

# ------------------------------------------- cluster representatives


def _clusters(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, cluster_id long")


def _scores(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, quality double")


def test_keeps_highest_quality_member(spark):
    clusters = _clusters(spark, [(1, 1), (2, 1), (3, 1), (9, 9)])
    scores = _scores(spark, [(1, 0.2), (2, 0.9), (3, 0.5), (9, 0.1)])
    out = {r.doc_id: r for r in cluster_representatives(clusters, scores).collect()}
    assert out[2].keep and out[2].keeper_id == 2
    assert not out[1].keep and out[1].keeper_id == 2
    assert not out[3].keep
    # singleton cluster keeps itself regardless of score
    assert out[9].keep and out[9].keeper_id == 9


def test_ties_break_to_smallest_id(spark):
    # exact duplicates have IDENTICAL quality — the common case;
    # determinism requires the min-id member to win
    clusters = _clusters(spark, [(5, 3), (3, 3), (7, 3)])
    scores = _scores(spark, [(5, 0.5), (3, 0.5), (7, 0.5)])
    out = {r.doc_id: r for r in cluster_representatives(clusters, scores).collect()}
    assert out[3].keep and not out[5].keep and not out[7].keep
    assert all(out[i].keeper_id == 3 for i in (3, 5, 7))


def test_differs_from_min_id_canonical(spark):
    # the point of the operator: when a LATER doc is better, d6's
    # min-id canonical and d10's quality keeper disagree
    clusters = _clusters(spark, [(1, 1), (2, 1)])
    scores = _scores(spark, [(1, 0.1), (2, 0.8)])
    out = {r.doc_id: r for r in cluster_representatives(clusters, scores).collect()}
    assert out[2].keep and not out[1].keep


def test_missing_score_fails_fast_not_silent_drop(spark):
    # r8 ADVICE: an inner join would silently drop a scoreless cluster
    # member (and could silently change the keeper); the left-join +
    # in-plan raise_error names the offending doc instead
    clusters = _clusters(spark, [(1, 1), (2, 1)])
    scores = _scores(spark, [(1, 0.9)])  # doc 2 has no score row
    with pytest.raises(Exception, match="missing or null score"):
        cluster_representatives(clusters, scores).collect()


def test_null_score_fails_fast_too(spark):
    # r9 ADVICE: the guard also fires when a score ROW exists but its
    # value is NULL — the message must not misdiagnose that case as a
    # missing row
    clusters = _clusters(spark, [(1, 1), (2, 1)])
    scores = _scores(spark, [(1, 0.9), (2, None)])
    with pytest.raises(Exception, match="missing or null score"):
        cluster_representatives(clusters, scores).collect()


def test_winner_is_aggregate_not_window(spark):
    clusters = _clusters(spark, [(1, 1), (2, 1)])
    scores = _scores(spark, [(1, 0.1), (2, 0.8)])
    plan = (
        cluster_representatives(clusters, scores)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan


# --------------------------------------------------- soft-dedup weights


def _docs(spark, *texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_unique_content_weighs_one(spark):
    df = _docs(spark, "alpha beta gamma delta", "wholly different words here")
    out = soft_dedup_weights(df, n=3).collect()
    assert all(r.soft_weight == 1.0 for r in out)


def test_exact_duplicates_weigh_inverse_copies(spark):
    # three identical docs: every gram has df=3 → weight exp(-ln 3)=1/3
    df = _docs(spark, *(["same text repeated across docs"] * 3))
    out = soft_dedup_weights(df, n=3).collect()
    assert all(r.soft_weight == pytest.approx(round(1 / 3, 6)) for r in out)


def test_partial_overlap_lands_between(spark):
    # doc0/doc1 share a 5-token prefix (3 shared grams) and differ after
    df = _docs(
        spark,
        "one two three four five six seven",
        "one two three four five nine ten",
        "unrelated content entirely apart",
    )
    out = {r.doc_id: r for r in soft_dedup_weights(df, n=3).collect()}
    # 5 grams each; 3 shared (df=2), 2 unique (df=1):
    # weight = exp(-(3*ln2 + 2*ln1)/5)
    expect = round(math.exp(-(3 * math.log(2)) / 5), 6)
    assert out[0].soft_weight == pytest.approx(expect)
    assert out[1].soft_weight == pytest.approx(expect)
    assert out[2].soft_weight == 1.0
    assert 1 / 2 < out[0].soft_weight < 1.0


def test_short_docs_weigh_one(spark):
    df = _docs(spark, "too short", "")
    out = soft_dedup_weights(df, n=3).collect()
    assert all(r.soft_weight == 1.0 and r.n_grams == 0 for r in out)


def test_weights_partition_invariant(spark):
    texts = [f"document number {i} with shared boilerplate tail" for i in range(8)]
    df1 = _docs(spark, *texts).repartition(1)
    df8 = _docs(spark, *texts).repartition(8)
    r1 = sorted((r.doc_id, r.soft_weight) for r in soft_dedup_weights(df1).collect())
    r8 = sorted((r.doc_id, r.soft_weight) for r in soft_dedup_weights(df8).collect())
    assert r1 == r8


def test_salted_two_level_form_is_bit_identical(spark):
    """r17 (r16 VERDICT #6): the hot-gram escape — df via a salted
    (gh, salt) two-level aggregate + join-back — returns bit-identical
    weights to the default window form, and its plan carries the
    salted partial aggregate instead of a window."""
    texts = [f"document number {i} with shared boilerplate tail" for i in range(10)]
    texts += ["shared boilerplate tail" for _ in range(5)]  # a hot gram
    df = _docs(spark, *texts)
    base = sorted(
        (r.doc_id, r.n_grams, r.soft_weight)
        for r in soft_dedup_weights(df, n=3).collect()
    )
    for s in (4, 16):
        salted = sorted(
            (r.doc_id, r.n_grams, r.soft_weight)
            for r in soft_dedup_weights(df, n=3, hot_gram_salts=s).collect()
        )
        assert salted == base
    plan = (
        soft_dedup_weights(df, n=3, hot_gram_salts=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan  # the skew-prone node is gone
    assert "pmod" in plan and "xxhash64" in plan  # the salt
    # salts <= 1 (or None) keep the single-pass window form
    plan_w = (
        soft_dedup_weights(df, n=3, hot_gram_salts=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan_w
