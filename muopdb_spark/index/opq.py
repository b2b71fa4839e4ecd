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


def _opq_fit_numpy(
    X: np.ndarray,
    num_subvectors: int,
    num_centers: int,
    seed: int,
    max_iter: int,
    opq_iters: int,
) -> OpqCodebook:
    """The paper's Algorithm 1 alternation on an in-memory sample —
    shared by the collection-wide trainer (driver-side) and the
    per-user grouped fit (inside applyInPandas)."""
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
    return _opq_fit_numpy(X, num_subvectors, num_centers, seed, max_iter,
                          opq_iters)


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


# PER-USER OPQ (quantizer="opq_user") — the same tenant-skew argument
# as train_pq_per_user/train_sq_per_user (index/pq.py:239, index/sq.py:
# 167), one level stronger: a shared OPQ learns ONE rotation from the
# pooled sample, so a minority tenant whose anisotropy differs from the
# dominant tenant's gets a rotation optimized for someone else's
# covariance ON TOP of the center-budget skew PQ already suffers
# (measured: tools/pq_recall_skew.py). Training one (rotation,
# codebook) pair per user restores both. Shapes mirror the pq_user
# path exactly: bounded per-user pre-sample -> grouped fit (one
# shuffle on user_id); salted-cogroup encode (no codebook rides on a
# row); request-bounded driver collect for scoring. Cost: dim^2 +
# m*k*d_sub doubles per user — 16x16 + 4x8x4 ~= 3 KB/user at test
# scale, ~48 KB/user at dim=64/m=8/k=256.


def train_opq_per_user(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    vec_col: str = "vector",
    num_subvectors: int = 8,
    num_centers: int = 16,
    training_sample: int = 10_000,
    seed: int = 42,
    max_iter: int = 20,
    opq_iters: int = 8,
) -> DataFrame:
    """Per-user OPQ as a (user_id, rotation, books) table: the
    train_pq_per_user contract (seeded xxhash64 rank-window pre-sample
    bounds every fit group, so a whale user never materializes its
    full vector set in one Arrow batch) with _opq_fit_numpy as the
    per-group fit."""
    import pandas as pd
    from pyspark.sql.window import Window

    base = df.select(
        F.col(user_col).alias("user_id"),
        F.col(vec_col).cast("array<double>").alias("vector"),
        F.xxhash64(F.col(vec_col).cast("array<double>"), F.lit(seed)).alias("_h"),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("_h").asc())
    train = (
        base.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= training_sample)
        .drop("_rn", "_h")
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > training_sample:  # regression tripwire
            raise AssertionError(
                f"opq fit group for user {pdf['user_id'].iat[0]} has "
                f"{len(pdf)} rows > training_sample={training_sample}"
            )
        user = int(pdf["user_id"].iat[0])
        X = np.array(pdf["vector"].tolist(), dtype=np.float64)
        book = _opq_fit_numpy(
            X, num_subvectors, num_centers, seed + 31 * user, max_iter,
            opq_iters,
        )
        return pd.DataFrame({
            "user_id": [user],
            "rotation": [book.rotation.tolist()],
            "books": [[cb.tolist() for cb in book.pq.codebooks]],
        })

    return train.groupBy("user_id").applyInPandas(
        fit,
        schema=(
            "user_id long, rotation array<array<double>>, "
            "books array<array<array<double>>>"
        ),
    )


def opq_encode_per_user(
    df: DataFrame,
    books_df: DataFrame,
    *,
    user_col: str = "user_id",
    vec_col: str = "vector",
    salt_buckets: int = 16,
) -> DataFrame:
    """Encode each row with ITS USER'S (rotation, codebook): the
    pq_encode_per_user salted cogroup (index/pq.py:300 — salt bounds
    each Arrow group, the artifact side replicates once per salt, and
    coverage is validated up front so a missing user fails with its id
    named instead of an opaque Arrow worker death), plus one extra
    per-group BLAS matmul to rotate before coding. Output: df's
    columns + pq_code array<int>."""
    import pandas as pd

    from muopdb_spark.index.pq import _stack_book

    missing = (
        df.select(F.col(user_col).alias("user_id")).distinct()
        .join(
            books_df.select(F.col(user_col).alias("user_id")).distinct(),
            "user_id", "left_anti",
        )
        .limit(5)
        .collect()
    )
    if missing:
        raise ValueError(
            "no OPQ codebook for user(s) "
            f"{sorted(r['user_id'] for r in missing)}; train_opq_per_user "
            "must cover every encoded user"
        )
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", pq_code array<int>"
    cols = [f.name for f in df.schema.fields]
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col(vec_col).cast("array<double>")),
               F.lit(salt_buckets)).cast("int"),
    )
    salts = salted.sparkSession.range(salt_buckets).select(
        F.col("id").cast("int").alias("_salt"))
    books_salted = books_df.withColumnRenamed(user_col, "user_id").crossJoin(
        F.broadcast(salts))

    def encode(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            out = left[cols].copy()
            out["pq_code"] = pd.Series([], dtype=object)
            return out
        if right.empty:  # unreachable: coverage validated up front
            raise AssertionError(
                f"no OPQ codebook for user {left[user_col].iat[0]}"
            )
        # rotation rows arrive from Arrow as an array of arrays —
        # stack row-wise (the _stack_book treatment)
        R = np.stack([
            np.asarray(row, dtype=np.float64)
            for row in right["rotation"].iat[0]
        ])
        books = [_stack_book(b) for b in right["books"].iat[0]]
        d_sub = books[0].shape[1]
        X = np.array(left[vec_col].tolist(), dtype=np.float64) @ R
        codes = np.empty((X.shape[0], len(books)), dtype=np.int32)
        for m, cb in enumerate(books):
            sub = X[:, m * d_sub:(m + 1) * d_sub]
            d2 = (
                (sub ** 2).sum(axis=1, keepdims=True)
                - 2.0 * sub @ cb.T
                + (cb ** 2).sum(axis=1)
            )
            codes[:, m] = np.argmin(d2, axis=1)
        out = left[cols].copy()
        out["pq_code"] = list(codes)
        return out

    return (
        salted.groupBy(F.col(user_col), F.col("_salt"))
        .cogroup(books_salted.groupBy("user_id", "_salt"))
        .applyInPandas(encode, schema=out_schema)
    )


def collect_opq_books(
    books_df: DataFrame, user_ids=None, *, user_col: str = "user_id"
) -> dict[int, "tuple[np.ndarray, list[np.ndarray]]"]:
    """Materialize (rotation, books) for a REQUEST's users only — the
    collect_pq_books contract (driver cost bounded by the request's
    user list, never the tenant population)."""
    from muopdb_spark.index.pq import _stack_book

    sel = books_df
    if user_ids is not None:
        sel = sel.filter(F.col(user_col).isin([int(u) for u in user_ids]))
    return {
        int(r[user_col]): (
            np.asarray(r["rotation"], dtype=np.float64),
            [_stack_book(b) for b in r["books"]],
        )
        for r in sel.collect()
    }


def opq_adc_score_per_user(
    query_vector,
    books_by_user: "dict[int, tuple[np.ndarray, list[np.ndarray]]]",
    *,
    user_col: str = "user_id",
    code_col: str = "pq_code",
) -> Column:
    """ADC with per-user (rotation, codebook): the QUERY rotates once
    per requested user driver-side (each user's rotation is
    orthonormal, so each user's rotated-space L2 == original L2 and
    cross-user scores stay comparable), then the pq_adc_score_per_user
    table gather. Rows of users absent from the dict score null."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    q0 = np.asarray(list(query_vector), dtype=np.float64)
    tables = {}
    for user, (R, books) in books_by_user.items():
        q = q0 @ R
        d_sub = books[0].shape[1]
        tables[user] = [
            ((cb - q[m * d_sub:(m + 1) * d_sub]) ** 2).sum(axis=1)
            for m, cb in enumerate(books)
        ]

    @pandas_udf(DoubleType())
    def adc(users, codes):
        import pandas as pd

        U = users.to_numpy()
        C = np.array(codes.tolist(), dtype=np.int64)
        out = np.full(len(U), np.nan, dtype=np.float64)
        for user, table in tables.items():
            mask = U == user
            if not mask.any():
                continue
            d2 = np.zeros(int(mask.sum()), dtype=np.float64)
            Cm = C[mask]
            for m, row in enumerate(table):
                d2 += row[Cm[:, m]]
            out[mask] = np.sqrt(d2)
        return pd.Series(out)

    return adc(F.col(user_col), F.col(code_col))


def opq_adc_score_batch_per_user(
    books_by_user: "dict[int, tuple[np.ndarray, list[np.ndarray]]]",
    *,
    user_col: str = "user_id",
    qv_col: str = "qv",
    code_col: str = "pq_code",
) -> Column:
    """Batch-of-queries ADC with per-user (rotation, codebook): per
    user inside each Arrow batch, rotate that user's query vectors
    (one BLAS matmul) and score residuals against its gathered
    centers — pq_adc_score_batch_per_user plus the rotation."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    books_by_user = {
        int(u): (np.asarray(R, dtype=np.float64),
                 [np.asarray(cb, dtype=np.float64) for cb in books])
        for u, (R, books) in books_by_user.items()
    }

    @pandas_udf(DoubleType())
    def adc(users, qvs, codes):
        import pandas as pd

        U = users.to_numpy()
        Q = np.array(qvs.tolist(), dtype=np.float64)
        C = np.array(codes.tolist(), dtype=np.int64)
        out = np.full(len(U), np.nan, dtype=np.float64)
        for user, (R, books) in books_by_user.items():
            mask = U == user
            if not mask.any():
                continue
            d_sub = books[0].shape[1]
            Qm, Cm = Q[mask] @ R, C[mask]
            d2 = np.zeros(Qm.shape[0], dtype=np.float64)
            for m, cb in enumerate(books):
                diff = Qm[:, m * d_sub:(m + 1) * d_sub] - cb[Cm[:, m]]
                d2 += (diff * diff).sum(axis=1)
            out[mask] = np.sqrt(d2)
        return pd.Series(out)

    return adc(F.col(user_col), F.col(qv_col).cast("array<double>"),
               F.col(code_col))
