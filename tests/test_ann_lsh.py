"""Random-hyperplane LSH: recall vs exact brute force on clustered and
fixture data."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from muopdb_spark.index.ann_lsh import build_rp_lsh, lsh_knn, lsh_near_dup_pairs
from muopdb_spark.operators.dedup import embedding_near_dup_pairs
from muopdb_spark.operators.knn import knn


@pytest.fixture(scope="module")
def vectors(spark):
    # directional clusters (cosine LSH buckets by direction)
    rng = np.random.default_rng(11)
    dirs = rng.standard_normal((5, 16))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rows = []
    for c in range(5):
        for j in range(40):
            v = dirs[c] + rng.normal(0, 0.05, 16)
            rows.append((c * 40 + j, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


@pytest.fixture(scope="module")
def index(vectors):
    return build_rp_lsh(vectors, num_planes=10, num_tables=6, seed=4)


def test_lsh_knn_recall(vectors, index):
    rng = np.random.default_rng(2)
    recalls = []
    for probe_id in (0, 40, 160):
        q = vectors.filter(F.col("vec_id") == probe_id).first()["embedding"]
        exact = {r["vec_id"] for r in
                 knn(vectors, q, 10, id_col="vec_id", metric="cosine").collect()}
        approx = {r["id"] for r in lsh_knn(index, q, 10).collect()}
        recalls.append(len(exact & approx) / 10)
    assert np.mean(recalls) >= 0.9


def test_lsh_near_dup_recall_vs_bruteforce(vectors, index):
    brute = {(r["id_a"], r["id_b"]) for r in
             embedding_near_dup_pairs(vectors, threshold=0.995).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in
           lsh_near_dup_pairs(index, threshold=0.995).collect()}
    assert lsh <= brute or not brute  # no false positives (exact verify)
    if brute:
        assert len(lsh & brute) / len(brute) >= 0.8  # recall
