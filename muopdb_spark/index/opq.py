"""OPQ — Optimized Product Quantization (Ge et al., CVPR 2013 /
TPAMI 2014): learn an orthonormal rotation R so that PQ's independent
per-subvector codebooks quantize X·R with lower error than X. Plain PQ
(index/pq.py — pq_builder.rs lineage) slices dimensions in storage
order; when variance is unevenly spread or correlated across slices,
rotating first redistributes it and ADC recall at a fixed code budget
improves. The reference ships only unrotated PQ
(rs/quantization/src/pq/pq_builder.rs) — this is the capability-
exceeding upgrade on the same estimate -> exact-rerank contract as
RaBitQ/SQ8.

Training (non-parametric OPQ, the paper's Algorithm 1): alternate
  (1) fit per-subvector k-means on the rotated sample X·R,
  (2) reconstruct Y ~= quantized(X·R), solve the orthogonal Procrustes
      problem min_R ||X·R - Y||_F via SVD of X^T·Y (R = U·V^T).
Driver-side numpy on the SAME bounded sample contract as train_pq
(training_sample rows collected once) — training is a small in-memory
problem regardless of corpus size; only encode/score touch the corpus.

Encode/score: rotation is applied INSIDE the existing Arrow batch
(one extra (B,d)x(d,d) matmul per batch — BLAS, not per-row Python);
queries rotate once on the driver. Codes, ADC tables, and the re-rank
path are plain PQ on the rotated space, so every downstream consumer
(scan scoring, durable artifacts) reuses index/pq.py unchanged.

Scale: R is dim^2 floats (64x64 -> 16 KB) riding the same closure
broadcast as the codebook; code bytes and scan I/O are identical to
PQ — the win is recall per byte, not bytes.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from muopdb_spark.index.pq import PqCodebook, pq_adc_score, pq_encode


@dataclass
class OpqCodebook:
    """Orthonormal rotation + the PQ codebook trained on rotated data."""

    rotation: np.ndarray  # (dim, dim)
    pq: PqCodebook

    def to_json(self) -> str:
        return json.dumps(
            {"rotation": self.rotation.tolist(),
             "pq": json.loads(self.pq.to_json())}
        )

    @classmethod
    def from_json(cls, s: str) -> "OpqCodebook":
        d = json.loads(s)
        return cls(
            np.asarray(d["rotation"], dtype=np.float64),
            PqCodebook.from_json(json.dumps(d["pq"])),
        )


def _fit_pq_numpy(
    X: np.ndarray, num_subvectors: int, num_centers: int, seed: int,
    max_iter: int,
) -> PqCodebook:
    from muopdb_spark.index.kmeans import lloyd

    d_sub = X.shape[1] // num_subvectors
    return PqCodebook([
        lloyd(X[:, m * d_sub:(m + 1) * d_sub], num_centers,
              seed=seed + m, max_iter=max_iter)
        for m in range(num_subvectors)
    ])


def _reconstruct(X: np.ndarray, pq: PqCodebook) -> np.ndarray:
    d_sub = pq.sub_dim
    Y = np.empty_like(X)
    for m, cb in enumerate(pq.codebooks):
        sub = X[:, m * d_sub:(m + 1) * d_sub]
        d2 = (
            (sub ** 2).sum(axis=1, keepdims=True)
            - 2.0 * sub @ cb.T
            + (cb ** 2).sum(axis=1)
        )
        Y[:, m * d_sub:(m + 1) * d_sub] = cb[np.argmin(d2, axis=1)]
    return Y


def quantization_mse(X: np.ndarray, book: "PqCodebook | OpqCodebook") -> float:
    """Mean squared reconstruction error of a (rotated-)PQ codebook on
    X — the objective OPQ minimizes; the test gate compares it across
    quantizers."""
    if isinstance(book, OpqCodebook):
        Xr = X @ book.rotation
        err = Xr - _reconstruct(Xr, book.pq)
    else:
        err = X - _reconstruct(X, book)
    return float((err ** 2).sum(axis=1).mean())


def train_opq(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    num_subvectors: int = 8,
    num_centers: int = 16,
    training_sample: int = 10_000,
    seed: int = 42,
    max_iter: int = 20,
    opq_iters: int = 8,
) -> OpqCodebook:
    """Non-parametric OPQ on the train_pq sample contract: one bounded
    collect, then `opq_iters` alternations of (PQ fit, Procrustes SVD).
    R starts at identity, so iteration 0 reproduces plain PQ and the
    objective is non-increasing from there."""
    n = df.count()
    frac = min(1.0, training_sample / max(n, 1))
    sample = df.sample(fraction=frac, seed=seed) if frac < 1.0 else df
    rows = sample.select(
        F.col(vec_col).cast("array<double>").alias("v")
    ).collect()
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    dim = X.shape[1]
    assert dim % num_subvectors == 0, (
        f"dim {dim} not divisible by m={num_subvectors}"
    )

    R = np.eye(dim)
    pq = _fit_pq_numpy(X, num_subvectors, num_centers, seed, max_iter)
    for _ in range(int(opq_iters)):
        Xr = X @ R
        pq = _fit_pq_numpy(Xr, num_subvectors, num_centers, seed, max_iter)
        Y = _reconstruct(Xr, pq)
        # orthogonal Procrustes: min_R ||X R - Y||_F -> SVD(X^T Y)
        U, _, Vt = np.linalg.svd(X.T @ Y)
        R = U @ Vt
    # final codebook must match the final rotation
    pq = _fit_pq_numpy(X @ R, num_subvectors, num_centers, seed, max_iter)
    return OpqCodebook(R, pq)


def opq_encode(
    df: DataFrame,
    book: OpqCodebook,
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """vector -> rotated-space PQ codes: one BLAS matmul per Arrow
    batch, then index/pq.pq_encode unchanged."""
    R = book.rotation.copy()
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    @pandas_udf(ArrayType(DoubleType()))
    def rotate(vecs):
        import pandas as pd

        X = np.array(vecs.tolist(), dtype=np.float64)
        return pd.Series(list(X @ R))

    rotated = df.withColumn(
        "_rot", rotate(F.col(vec_col).cast("array<double>"))
    )
    return pq_encode(rotated, book.pq, vec_col="_rot").drop("_rot")


def opq_adc_score(
    query_vector,
    book: OpqCodebook,
    code_col: str = "pq_code",
) -> Column:
    """ADC on rotated-space codes: the QUERY rotates once driver-side
    (rotation is orthonormal, so rotated-space L2 == original L2 and
    the estimate stays unbiased for the same metric), then plain
    pq_adc_score."""
    q = np.asarray(list(query_vector), dtype=np.float64) @ book.rotation
    return pq_adc_score([float(x) for x in q], book.pq, code_col=code_col)


def opq_adc_score_batch(
    book: OpqCodebook,
    *,
    qv_col: str = "qv",
    code_col: str = "pq_code",
) -> Column:
    """Batch-of-queries ADC on rotated-space codes: the per-row query
    vectors rotate INSIDE the Arrow batch (one BLAS matmul), then the
    same vectorized residual math as pq_adc_score_batch."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    R = book.rotation.copy()
    books = [cb.copy() for cb in book.pq.codebooks]
    d_sub = book.pq.sub_dim

    @pandas_udf(DoubleType())
    def adc(qvs, codes):
        import pandas as pd

        Q = np.array(qvs.tolist(), dtype=np.float64) @ R
        C = np.array(codes.tolist(), dtype=np.int64)
        d2 = np.zeros(C.shape[0], dtype=np.float64)
        for m, cb in enumerate(books):
            diff = Q[:, m * d_sub:(m + 1) * d_sub] - cb[C[:, m]]
            d2 += (diff * diff).sum(axis=1)
        return pd.Series(np.sqrt(d2))

    return adc(F.col(qv_col).cast("array<double>"), F.col(code_col))


def opq_search(
    emb: DataFrame,
    book: OpqCodebook,
    query_vector,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 300,
    score_decimals: int = 6,
) -> DataFrame:
    """Flat OPQ-ADC estimate -> exact re-rank -> top-k, the same
    contract as rabitq_search/SQ: exact end-to-end given containment
    (pytest-gated). `emb` must already carry `pq_code` (opq_encode)."""
    from muopdb_spark.functions.distance import l2_distance

    cand = (
        emb.select(id_col, vec_col, opq_adc_score(query_vector, book).alias("adc"))
        .orderBy(F.col("adc").asc_nulls_last(), F.col(id_col).asc())
        .limit(int(rerank))
    )
    exact = l2_distance(
        F.col(vec_col),
        F.lit([float(x) for x in query_vector]).cast("array<double>"),
    )
    return (
        cand.select(
            id_col, F.round(exact, score_decimals).alias("score")
        )
        .orderBy(F.col("score").asc(), F.col(id_col).asc())
        .limit(int(k))
    )
