"""Per-user independent IVF indexes (the MultiSpann analog): isolation,
per-user recall, cross-user merge."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from muopdb_spark.index.multi_ivf import (
    build_multi_ivf,
    multi_ivf_search,
    multi_ivf_search_users,
)
from muopdb_spark.operators.knn import knn

DIM = 6


@pytest.fixture(scope="module")
def users_df(spark):
    """User 0: clusters at 0 and 100. User 1: clusters at 50 and 150.
    Disjoint id ranges so leakage is detectable."""
    rng = np.random.default_rng(21)
    rows = []
    did = 0
    for user, centers in [(0, (0.0, 100.0)), (1, (50.0, 150.0))]:
        for c in centers:
            for p in np.full(DIM, c) + rng.normal(0, 2.0, size=(50, DIM)):
                rows.append((user, did, [float(x) for x in p]))
                did += 1
    return spark.createDataFrame(rows, "user_id long, doc_id long, vector array<float>").cache()


@pytest.fixture(scope="module")
def index(users_df):
    return build_multi_ivf(users_df, num_centroids=2, seed=9)


def test_per_user_centroids(index):
    cents = {(r["user_id"], round(r["centroid"][0], -1)) for r in index.centroids.collect()}
    assert cents == {(0, 0.0), (0, 100.0), (1, 50.0), (1, 150.0)}


def test_user_isolation(index, users_df):
    # user 0 query near user 1's cluster at 50 must return ONLY user-0 docs
    got = multi_ivf_search(index, 0, [50.0] * DIM, 5,
                           num_probes=2, centroid_distance_ratio=None).collect()
    user0_ids = {r["doc_id"] for r in users_df.filter("user_id = 0").collect()}
    assert {r["id"] for r in got} <= user0_ids


def test_per_user_recall_exact(index, users_df):
    q = [100.0] * DIM
    exact = [r["doc_id"] for r in
             knn(users_df.filter("user_id = 0"), q, 10,
                 vector_col="vector", id_col="doc_id").collect()]
    approx = [r["id"] for r in
              multi_ivf_search(index, 0, q, 10, num_probes=2,
                               centroid_distance_ratio=None).collect()]
    assert approx == exact


def test_unknown_user_empty(index):
    assert multi_ivf_search(index, 99, [0.0] * DIM, 5).isEmpty()


def test_cross_user_merge(index):
    # query at 100: user 0's cluster @100 beats user 1's clusters @50/150
    got = multi_ivf_search_users(index, [0, 1], [100.0] * DIM, 6,
                                 num_probes=2, centroid_distance_ratio=None).collect()
    assert len(got) == 6
    assert all(r["user_id"] == 0 for r in got)
    # query at 150: user 1 wins
    got = multi_ivf_search_users(index, [0, 1], [150.0] * DIM, 6,
                                 num_probes=2, centroid_distance_ratio=None).collect()
    assert all(r["user_id"] == 1 for r in got)
