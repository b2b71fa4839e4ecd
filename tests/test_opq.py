"""OPQ (index/opq.py): rotation learning must beat plain PQ on
anisotropic data, the rotation must stay orthonormal, and the
estimate -> exact-rerank search contract must be exact end-to-end
(containment gate, same bar as RaBitQ/SQ)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from muopdb_spark.index.opq import (
    OpqCodebook,
    opq_adc_score,
    opq_encode,
    opq_search,
    quantization_mse,
    train_opq,
)
from muopdb_spark.index.pq import train_pq


def _aniso_df(spark, n=800, dim=16, seed=7):
    """Correlated, unevenly-scaled vectors — the regime OPQ exists
    for: a random mixing matrix spreads variance across the PQ
    subvector slices."""
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(dim, dim)) * np.linspace(3.0, 0.1, dim)
    X = rng.normal(size=(n, dim)) @ A
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )


@pytest.fixture(scope="module")
def aniso(spark):
    return _aniso_df(spark).localCheckpoint(eager=True)


def test_rotation_is_orthonormal(aniso):
    book = train_opq(aniso, num_subvectors=4, num_centers=8, opq_iters=4)
    R = book.rotation
    assert np.allclose(R @ R.T, np.eye(R.shape[0]), atol=1e-8)


def test_opq_beats_pq_on_anisotropic_data(aniso):
    rows = aniso.select("embedding").collect()
    X = np.array([r["embedding"] for r in rows])
    pq = train_pq(aniso, vec_col="embedding", num_subvectors=4, num_centers=8)
    opq = train_opq(
        aniso, vec_col="embedding", num_subvectors=4, num_centers=8,
        opq_iters=6,
    )
    mse_pq = quantization_mse(X, pq)
    mse_opq = quantization_mse(X, opq)
    assert mse_opq < mse_pq * 0.9, (mse_opq, mse_pq)


def test_codebook_roundtrip(aniso):
    book = train_opq(aniso, num_subvectors=4, num_centers=8, opq_iters=2)
    back = OpqCodebook.from_json(book.to_json())
    assert np.allclose(back.rotation, book.rotation)
    assert all(
        np.allclose(a, b)
        for a, b in zip(back.pq.codebooks, book.pq.codebooks)
    )


def test_search_exact_under_containment(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    book = train_opq(emb, num_subvectors=8, num_centers=16, opq_iters=4)
    coded = opq_encode(emb, book).localCheckpoint(eager=True)
    qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]

    from muopdb_spark.operators.knn import knn

    exact = {
        r["vec_id"]
        for r in knn(emb, qv, 10, vector_col="embedding",
                     id_col="vec_id", metric="l2").collect()
    }
    got = opq_search(coded, book, qv, 10, rerank=300)
    assert {r["vec_id"] for r in got.collect()} == exact

    # containment: the ADC top-300 pool must hold the true top-10
    pool = {
        r["vec_id"]
        for r in coded.select(
            "vec_id", opq_adc_score(qv, book).alias("adc"),
        ).orderBy(F.col("adc").asc(), F.col("vec_id").asc())
        .limit(300).collect()
    }
    assert exact <= pool


@pytest.mark.parametrize("sfd", ["/root/testdata/sf0.01"])
def test_containment_holds_at_larger_sf(spark, sfd):
    """Same gate as the driver query claims: ADC top-300 holds the
    true top-10 at the driver's correctness SF."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod

    coded, book = entry_mod._opq_index(spark, sfd)
    emb = spark.read.parquet(f"{sfd}/embeddings.parquet")
    qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]

    from muopdb_spark.operators.knn import knn

    exact = {
        r["vec_id"]
        for r in knn(emb, qv, 10, vector_col="embedding",
                     id_col="vec_id", metric="l2").collect()
    }
    pool = {
        r["vec_id"]
        for r in coded.select("vec_id", opq_adc_score(qv, book).alias("adc"))
        .orderBy(F.col("adc").asc(), F.col("vec_id").asc())
        .limit(300).collect()
    }
    assert exact <= pool
