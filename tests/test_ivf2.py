"""Two-level centroid probe (index/ivf2.py): full-meta-probe
equivalence with the single-level search, recall on seeded clusters
with a pruned meta probe, and the probe-cost reduction itself."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from muopdb_spark.index.ivf import build_ivf, ivf_search
from muopdb_spark.index.ivf2 import build_two_level, two_level_search
from muopdb_spark.operators.knn import knn

N_CLUSTERS, PER_CLUSTER, DIM = 6, 80, 8


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(42)
    rows = []
    for c in range(N_CLUSTERS):
        center = np.full(DIM, c * 100.0)
        pts = center + rng.normal(0, 5.0, size=(PER_CLUSTER, DIM))
        for j, p in enumerate(pts):
            rows.append((c * PER_CLUSTER + j, [float(x) for x in p]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


@pytest.fixture(scope="module")
def index(clustered):
    return build_ivf(clustered, num_centroids=N_CLUSTERS, seed=7)


@pytest.fixture(scope="module")
def two_level(index):
    return build_two_level(index, meta_k=3, seed=11)


def test_full_meta_probe_equals_single_level(index, two_level, clustered):
    qv = [float(x) for x in clustered.first()["embedding"]]
    a = [
        (r["id"], round(r["score"], 6))
        for r in ivf_search(
            index, qv, 10, num_probes=N_CLUSTERS, centroid_distance_ratio=None
        ).collect()
    ]
    b = [
        (r["id"], round(r["score"], 6))
        for r in two_level_search(
            two_level, qv, 10, meta_probes=None,
            num_probes=N_CLUSTERS, centroid_distance_ratio=None,
        ).collect()
    ]
    assert a == b


def test_pruned_meta_recall_at_10(two_level, clustered):
    # queries from every blob; one meta-cell probed, two centroids
    # inside it — the query's own blob is always in its nearest
    # meta-cell on well-separated clusters, so recall stays 1.0
    hits = total = 0
    for c in range(N_CLUSTERS):
        qv = [float(x) for x in
              clustered.filter(F.col("vec_id") == c * PER_CLUSTER).first()["embedding"]]
        truth = {
            r["vec_id"]
            for r in knn(clustered, qv, 10, id_col="vec_id",
                         vector_col="embedding").collect()
        }
        got = {
            r["id"]
            for r in two_level_search(
                two_level, qv, 10, meta_probes=1,
                num_probes=N_CLUSTERS, centroid_distance_ratio=None,
            ).collect()
        }
        hits += len(truth & got)
        total += len(truth)
    assert hits / total == 1.0


def test_meta_assignment_covers_all_centroids(index, two_level):
    n_cent = index.centroids.count()
    assert two_level.centroid_meta.count() == n_cent
    assert two_level.centroid_meta.select("centroid_id").distinct().count() == n_cent
    metas = {r.meta_id for r in two_level.centroid_meta.collect()}
    assert metas <= set(range(two_level.meta_k))


def test_probe_restricts_centroid_set(two_level):
    # with 1 meta-cell probed, the restricted centroid table is a
    # strict subset — the whole point of the tier
    qv = [0.0] * DIM
    cells = two_level.centroid_meta.filter(F.col("meta_id") == 0).count()
    assert 0 < cells < two_level.centroid_meta.count()


def test_distributed_assignment_matches_numpy_reference(index, two_level):
    # the broadcast-crossJoin + argmin-window assignment must equal the
    # straight numpy L2 argmin over (centroid, meta_center) — the exact
    # computation the pre-distributed build ran on the driver
    rows = index.centroids.select("centroid_id", "centroid").collect()
    X = np.array([r.centroid for r in rows], dtype=np.float64)
    C = two_level.meta_centers
    d2 = (
        (X ** 2).sum(axis=1, keepdims=True)
        - 2.0 * X @ C.T
        + (C ** 2).sum(axis=1)
    )
    want = {int(r.centroid_id): int(m) for r, m in zip(rows, d2.argmin(axis=1))}
    got = {r.centroid_id: r.meta_id for r in two_level.centroid_meta.collect()}
    assert got == want


@pytest.fixture(scope="module")
def directional(spark):
    # clusters with RANDOM unit directions (the all-ones-direction
    # fixture above is collinear — degenerate for cosine/dot)
    rng = np.random.default_rng(7)
    rows = []
    for c in range(N_CLUSTERS):
        d = rng.normal(size=DIM)
        center = 100.0 * d / np.linalg.norm(d)
        pts = center + rng.normal(0, 2.0, size=(PER_CLUSTER, DIM))
        for j, p in enumerate(pts):
            rows.append((c * PER_CLUSTER + j, [float(x) for x in p]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


@pytest.mark.slow
@pytest.mark.parametrize("metric", ["cosine", "dot"])
def test_pruned_meta_recall_non_l2(directional, metric):
    # ADVICE r5: the pruned meta probe was recall-gated only on L2 —
    # gate cosine (spherical assignment) and dot (location clustering
    # + cell-mean probe heuristic) the same way
    idx = build_ivf(directional, num_centroids=N_CLUSTERS, seed=7, metric=metric)
    tl = build_two_level(idx, meta_k=3, seed=11)
    hits = total = 0
    for c in range(N_CLUSTERS):
        qv = [float(x) for x in
              directional.filter(F.col("vec_id") == c * PER_CLUSTER).first()["embedding"]]
        truth = {
            r["vec_id"]
            for r in knn(directional, qv, 10, id_col="vec_id",
                         vector_col="embedding", metric=metric).collect()
        }
        got = {
            r["id"]
            for r in two_level_search(
                tl, qv, 10, meta_probes=2,
                num_probes=N_CLUSTERS, centroid_distance_ratio=None,
            ).collect()
        }
        hits += len(truth & got)
        total += len(truth)
    assert hits / total >= 0.9
