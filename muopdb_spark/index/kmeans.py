"""Seeded numpy k-means (Lloyd's with k-means++ init) for index builds.

The reference trains centroids on a BOUNDED sample (20k rows by default,
rs/config/src/collection.rs:91-99; kmeans_builder.rs fits the sample
in-process with rayon). We mirror that: the sample is collected to the
driver (bounded: training_sample x dim floats, ~5 MB at 20k x 64) and
fit with vectorized numpy — faster and more deterministic than spinning
up a pyspark.ml job for a small in-memory problem, and the SAME solver
runs inside grouped applyInPandas for per-user indexes (multi_ivf).

Only the TRAINING is local; assignment of the full corpus stays a
distributed join (index/ivf.py assign_postings).
"""

from __future__ import annotations

import numpy as np


def kmeans_pp_init(X: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """k-means++ seeding (Arthur & Vassilvitskii 2007)."""
    n = len(X)
    centers = np.empty((k, X.shape[1]), dtype=np.float64)
    centers[0] = X[rng.integers(n)]
    d2 = ((X - centers[0]) ** 2).sum(axis=1)
    for j in range(1, k):
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        centers[j] = X[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, ((X - centers[j]) ** 2).sum(axis=1))
    return centers


def lloyd(
    X: np.ndarray, k: int, *, seed: int = 42, max_iter: int = 20,
) -> np.ndarray:
    """Seeded Lloyd's iterations; returns (k', dim) centers, k' <= k
    (empty clusters keep their previous center; k' < k only if n < k)."""
    X = np.asarray(X, dtype=np.float64)
    rng = np.random.default_rng(seed)
    k = min(k, len(X))
    centers = kmeans_pp_init(X, k, rng)
    for _ in range(max_iter):
        # ||x-c||^2 via the expanded form: one matmul, no (n,k,d) blowup
        d2 = (
            (X ** 2).sum(axis=1, keepdims=True)
            - 2.0 * X @ centers.T
            + (centers ** 2).sum(axis=1)
        )
        assign = d2.argmin(axis=1)
        new = centers.copy()
        for j in range(k):
            members = assign == j
            if members.any():
                new[j] = X[members].mean(axis=0)
        if np.allclose(new, centers, atol=1e-9):
            break
        centers = new
    return centers
