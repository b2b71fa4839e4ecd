"""Planner strategy selection + skew-helper equivalence."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from muopdb_spark.index.ivf import build_ivf
from muopdb_spark.index.pq import pq_encode, train_pq
from muopdb_spark.operators.skew import salted_count, salted_join, salted_sum
from muopdb_spark.plans.planner import plan_knn


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(300)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_planner_exact_when_no_index(vecs):
    p = plan_knn(vecs, [0.0] * 8, 5)
    assert p.strategy == "exact" and "no index" in p.rationale
    assert p.df.count() == 5


def test_planner_exact_below_threshold(vecs):
    idx = build_ivf(vecs, num_centroids=4, seed=1)
    p = plan_knn(vecs, [0.0] * 8, 5, ivf_index=idx, exact_threshold_rows=10_000)
    assert p.strategy == "exact" and "threshold" in p.rationale


def test_planner_ivf_when_large(vecs):
    idx = build_ivf(vecs, num_centroids=4, seed=1)
    p = plan_knn(vecs, [0.0] * 8, 5, ivf_index=idx,
                 exact_threshold_rows=100, approx_row_count=300)
    assert p.strategy == "ivf"
    assert p.df.count() == 5


def test_planner_ivf_fullprobe_matches_exact(vecs):
    idx = build_ivf(vecs, num_centroids=4, seed=1)
    exact = plan_knn(vecs, [0.5] * 8, 7).df.collect()
    ivf = plan_knn(vecs, [0.5] * 8, 7, ivf_index=idx, exact_threshold_rows=None,
                   approx_row_count=300, num_probes=4,
                   centroid_distance_ratio=None).df.collect()
    assert [r["id"] for r in ivf] == [r["vec_id"] for r in exact]


def test_planner_pq(vecs):
    cb = train_pq(vecs, num_subvectors=2, num_centers=8, seed=2)
    enc = pq_encode(vecs, cb)
    p = plan_knn(vecs, [0.0] * 8, 5, pq_codebook=cb, pq_encoded=enc,
                 exact_threshold_rows=100, approx_row_count=300)
    assert p.strategy == "pq"
    assert p.df.count() == 5


@pytest.fixture(scope="module")
def skewed(spark):
    # key 'hot' holds 90% of rows
    rows = [("hot" if i % 10 else f"k{i}", i, float(i)) for i in range(1000)]
    return spark.createDataFrame(rows, "key string, id long, v double").cache()


def test_salted_count_matches_plain(skewed):
    plain = {r["key"]: r["count"] for r in skewed.groupBy("key").count().collect()}
    salted = {r["key"]: r["count"] for r in salted_count(skewed, ["key"], buckets=8).collect()}
    assert salted == plain


def test_salted_sum_matches_plain(skewed):
    plain = {r["key"]: r["s"] for r in
             skewed.groupBy("key").agg(F.sum("v").alias("s")).collect()}
    salted = {r["key"]: r["sum_v"] for r in salted_sum(skewed, ["key"], "v", buckets=8).collect()}
    assert salted == pytest.approx(plain)


def test_salted_join_matches_plain(skewed, spark):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k11", "K11")], "key string, label string"
    )
    plain = sorted((r["id"], r["label"]) for r in skewed.join(dim, "key").collect())
    salted = sorted((r["id"], r["label"]) for r in salted_join(skewed, dim, "key", buckets=4).collect())
    assert salted == plain


def test_salted_join_refuses_outer_preserved_small_side(spark):
    """r16 review: replicating the small side per salt makes an
    unmatched right/full-outer row appear once per salt — refused by
    name instead of silently multiplying rows."""
    import pytest

    from muopdb_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "a")], "k long, v string")
    small = spark.createDataFrame([(2, "x")], "k long, w string")
    with pytest.raises(ValueError, match="per salt"):
        salted_join(big, small, "k", how="full_outer")
    # the equivalence-safe forms still work
    assert salted_join(big, small, "k", how="left").count() == 1
    assert salted_join(big, small, "k", how="inner").count() == 0
