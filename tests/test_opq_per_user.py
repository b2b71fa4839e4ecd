"""Per-user OPQ (quantizer='opq_user'): the per-user skew mitigation
applied to the ROTATION as well as the codebook. A shared OPQ fits one
rotation to the pooled sample, so a minority tenant with a DIFFERENT
anisotropy gets a rotation optimized for the dominant tenant's
covariance on top of PQ's center-budget skew (the r5
tools/pq_recall_skew.py measurement). This suite gates that opq_user
(a) trains one orthonormal rotation per user, (b) lowers the minority
tenant's quantization MSE vs shared OPQ, (c) closes the minority
recall gap on the estimate->rerank contract, and (d) round-trips
through save/load and batch search."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from muopdb_spark.index.multi_ivf import (
    build_multi_ivf,
    multi_ivf_load,
    multi_ivf_save,
    multi_ivf_search,
    multi_ivf_search_batch,
)
from muopdb_spark.index.opq import (
    collect_opq_books,
    opq_encode_per_user,
    train_opq_per_user,
)


@pytest.fixture(scope="module")
def skewed_aniso(spark):
    """Dominant user 0: anisotropic along one mixing matrix. Minority
    user 1: anisotropic along a DIFFERENT (permuted, re-scaled) mixing
    matrix — so the pooled rotation fits user 0's covariance and
    misfits user 1's."""
    rng = np.random.default_rng(11)
    dim = 16
    A0 = rng.normal(size=(dim, dim)) * np.linspace(3.0, 0.1, dim)
    A1 = (rng.normal(size=(dim, dim)) * np.linspace(0.1, 3.0, dim))[
        :, rng.permutation(dim)
    ]
    dom = rng.normal(size=(800, dim)) @ A0
    off = rng.normal(size=(120, dim)) @ A1
    rows = [(0, i, [float(x) for x in dom[i]]) for i in range(len(dom))] + [
        (1, 1000 + i, [float(x) for x in off[i]]) for i in range(len(off))
    ]
    df = spark.createDataFrame(
        rows, "user_id long, doc_id long, vector array<double>"
    ).localCheckpoint(eager=True)
    return df, dom, off


FULL_PROBE = dict(num_probes=4, centroid_distance_ratio=None)


def _recall(idx, exact_idx, user, queries, k=10, **kw):
    hits = []
    for q in queries:
        q = [float(x) for x in q]
        truth = {r["id"] for r in
                 multi_ivf_search(exact_idx, user, q, k, **FULL_PROBE).collect()}
        got = {r["id"] for r in
               multi_ivf_search(idx, user, q, k, **FULL_PROBE, **kw).collect()}
        hits.append(len(got & truth) / k)
    return float(np.mean(hits))


def test_per_user_rotations_orthonormal_and_distinct(spark, skewed_aniso):
    df, dom, off = skewed_aniso
    books_df = train_opq_per_user(
        df, num_subvectors=4, num_centers=8, opq_iters=4
    )
    by_user = collect_opq_books(books_df)
    assert set(by_user) == {0, 1}
    for R, books in by_user.values():
        assert np.allclose(R @ R.T, np.eye(R.shape[0]), atol=1e-8)
        assert len(books) == 4
    # the two tenants' anisotropies differ, so the learned rotations do
    assert not np.allclose(by_user[0][0], by_user[1][0], atol=1e-3)


def test_per_user_opq_lowers_minority_mse(spark, skewed_aniso):
    from muopdb_spark.index.opq import OpqCodebook, quantization_mse, train_opq

    df, dom, off = skewed_aniso
    shared = train_opq(
        df, vec_col="vector", num_subvectors=4, num_centers=8, opq_iters=6
    )
    per_user = collect_opq_books(
        train_opq_per_user(df, num_subvectors=4, num_centers=8, opq_iters=6)
    )
    from muopdb_spark.index.pq import PqCodebook

    R1, books1 = per_user[1]
    mine = OpqCodebook(R1, PqCodebook(books1))
    assert quantization_mse(off, mine) < quantization_mse(off, shared)


@pytest.mark.slow
def test_per_user_opq_closes_minority_recall_gap(spark, skewed_aniso):
    df, dom, off = skewed_aniso
    kw = dict(num_centroids=4, seed=42, pq_subvectors=8, pq_centers=32)
    shared = build_multi_ivf(df, quantizer="opq", **kw)
    per_user = build_multi_ivf(df, quantizer="opq_user", **kw)
    exact = build_multi_ivf(df, num_centroids=4, seed=42)

    rng = np.random.default_rng(3)
    queries = off[rng.choice(len(off), 8, replace=False)]
    shared_rec = _recall(shared, exact, 1, queries, rerank=40)
    per_user_rec = _recall(per_user, exact, 1, queries, rerank=40)
    assert per_user_rec >= shared_rec
    assert per_user_rec >= 0.95
    # and the dominant user keeps its recall
    qd = dom[rng.choice(len(dom), 8, replace=False)]
    assert _recall(per_user, exact, 0, qd, rerank=40) >= 0.95


def test_per_user_opq_save_load_roundtrip(spark, skewed_aniso, tmp_path):
    df, dom, off = skewed_aniso
    idx = build_multi_ivf(
        df, quantizer="opq_user", num_centroids=4, seed=42,
        pq_subvectors=8, pq_centers=16,
    )
    path = str(tmp_path / "opqidx")
    multi_ivf_save(idx, path)
    idx2 = multi_ivf_load(spark, path)
    assert idx2.quantizer == "opq_user"
    q = [float(x) for x in off[0]]
    a = [(r.id, round(r.score, 6)) for r in
         multi_ivf_search(idx, 1, q, 5, rerank=20, score_decimals=6,
                          **FULL_PROBE).collect()]
    b = [(r.id, round(r.score, 6)) for r in
         multi_ivf_search(idx2, 1, q, 5, rerank=20, score_decimals=6,
                          **FULL_PROBE).collect()]
    assert a == b and len(a) == 5


def test_per_user_opq_batch_matches_single(spark, skewed_aniso):
    df, dom, off = skewed_aniso
    idx = build_multi_ivf(
        df, quantizer="opq_user", num_centroids=4, seed=42,
        pq_subvectors=8, pq_centers=16,
    )
    reqs = spark.createDataFrame(
        [(100, 0, [float(x) for x in dom[3]]),
         (200, 1, [float(x) for x in off[3]])],
        "request_id long, user_id long, query_vector array<double>",
    )
    by_req: dict = {}
    for r in multi_ivf_search_batch(
        idx, reqs, 5, rerank=20, score_decimals=6, **FULL_PROBE
    ).collect():
        by_req.setdefault(r.request_id, []).append((r.id, r.score))
    for rid, user, vec in ((100, 0, dom[3]), (200, 1, off[3])):
        single = [
            (r.id, r.score) for r in multi_ivf_search(
                idx, user, [float(x) for x in vec], 5,
                rerank=20, score_decimals=6, **FULL_PROBE,
            ).collect()
        ]
        assert sorted(by_req[rid]) == sorted(single)


def test_encode_per_user_missing_user_fails_loudly(spark, skewed_aniso):
    df, _, _ = skewed_aniso
    books = train_opq_per_user(
        df.filter(F.col("user_id") == 0), num_subvectors=4, num_centers=8,
        opq_iters=2,
    )
    with pytest.raises(ValueError, match="no OPQ codebook for user"):
        opq_encode_per_user(df, books)


def test_collection_opq_user_end_to_end(spark, tmp_path):
    """quantizer='opq_user' collections persist the per-user
    (rotation, books) table at the collection root (swap-managed, the
    sq/pq_user artifact contract), store rotated-space codes in the
    durable postings, and ann_search reranks to the exact top-k."""
    import os

    from muopdb_spark.catalog import Collection, CollectionConfig

    cfg = CollectionConfig(
        name="opq_user_col", num_features=4, quantizer="opq_user",
        pq_subvectors=2, pq_centers=4,
        attribute_schema={"title": "text"},
    )
    col = Collection.create(spark, str(tmp_path), cfg)
    rows = [
        (0, 1, [1.0, 0.0, 0.0, 0.0], "a", "news", 1),
        (0, 2, [0.0, 1.0, 0.0, 0.0], "b", "blog", 2),
        (1, 3, [0.0, 0.0, 1.0, 0.0], "c", "news", 3),
        (1, 5, [0.0, 0.0, 0.9, 0.0], "d", "news", 5),
    ]
    col.insert(spark.createDataFrame(
        rows,
        "user_id long, doc_id long, vector array<float>, "
        "title string, category string, views long",
    ))
    col.flush()
    col.build_index()
    assert os.path.isdir(os.path.join(col.root, "opq_codebook"))
    cb = spark.read.parquet(os.path.join(col.root, "opq_codebook"))
    assert {"user_id", "rotation", "books"} <= set(cb.columns)
    assert cb.count() == 2
    idx = col.load_segment_index(col.toc()["segments"][0])
    assert "pq_code" in idx.postings.columns and idx.quantizer == "opq_user"
    got = col.ann_search([0, 1], [0.0, 0.0, 1.0, 0.0], 2,
                         num_probes=cfg.num_centroids,
                         centroid_distance_ratio=None,
                         rerank=5).collect()
    assert [r["id"] for r in got] == [3, 5]  # exact after re-rank


def test_opq_user_rejects_non_l2_metric(spark, tmp_path):
    from muopdb_spark.catalog import Collection, CollectionConfig

    with pytest.raises(ValueError, match="l2"):
        Collection.create(spark, str(tmp_path), CollectionConfig(
            name="bad", num_features=4, quantizer="opq_user", metric="cosine",
        ))
