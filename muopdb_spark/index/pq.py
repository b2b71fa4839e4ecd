"""Product quantization: codebook training (V9), encoding (V10), and
asymmetric-distance (ADC) scoring (V11).

Reference: rs/quantization/src/pq/pq_builder.rs (per-subvector k-means
codebooks over a sampled training set), pq/mod.rs:152-178 (quantize:
nearest codebook centroid per subvector -> u8 code), pq/mod.rs:203-260
(SIMD distance on codes). Config knobs mirror collection.rs:43-63
(subvector_dimension, num_bits, num_training_rows).

Spark-first: training loops over subvectors on sampled data
(pyspark.ml KMeans per slice — a handful of small jobs); encoding and
scoring are Arrow-batched pandas UDFs with the (tiny) codebook shipped
as a closure broadcast — numpy does the distance table lookups, which
is exactly the reference's SIMD inner loop re-expressed as vectorized
batch math. No Python object churn per row; no shuffle added.

Scale note: codebook size = m * k * d_sub floats (e.g. 8 * 256 * 8 * 4B
= 64 KB) — broadcast-trivial. Encoded corpus is m bytes/vector vs
4*d bytes raw (32x compression at d=64, m=8), which is the point: at
100 TB of raw vectors the PQ-coded scan reads ~3 TB.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, IntegerType


@dataclass
class PqCodebook:
    """codebooks[m] = (k, d_sub) centers for subvector m."""

    codebooks: list[np.ndarray]

    @property
    def num_subvectors(self) -> int:
        return len(self.codebooks)

    @property
    def sub_dim(self) -> int:
        return self.codebooks[0].shape[1]

    def as_lists(self) -> list[list[list[float]]]:
        return [cb.tolist() for cb in self.codebooks]

    def to_json(self) -> str:
        """Durable form — the codebook is the index artifact the
        reference persists inside the segment files
        (posting_list/combined_file.rs header + codebook region)."""
        import json

        return json.dumps({"codebooks": self.as_lists()})

    @classmethod
    def from_json(cls, s: str) -> "PqCodebook":
        import json

        return cls([np.asarray(cb, dtype=np.float64) for cb in json.loads(s)["codebooks"]])


def train_pq(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    num_subvectors: int = 8,
    num_centers: int = 16,
    training_sample: int = 10_000,
    seed: int = 42,
    max_iter: int = 20,
) -> PqCodebook:
    """V9: per-subvector k-means codebooks over a sampled training set.

    One bounded sample collect (training_sample x dim, same cap as the
    reference's num_training_rows) then m seeded numpy fits — training
    is a small in-memory problem; only encoding/scoring touch the corpus.
    """
    from muopdb_spark.index.kmeans import lloyd

    n = df.count()
    frac = min(1.0, training_sample / max(n, 1))
    sample = df.sample(fraction=frac, seed=seed) if frac < 1.0 else df
    rows = sample.select(F.col(vec_col).cast("array<double>").alias("v")).collect()
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    dim = X.shape[1]
    assert dim % num_subvectors == 0, f"dim {dim} not divisible by m={num_subvectors}"
    d_sub = dim // num_subvectors

    books = [
        lloyd(X[:, m * d_sub:(m + 1) * d_sub], num_centers,
              seed=seed + m, max_iter=max_iter)
        for m in range(num_subvectors)
    ]
    return PqCodebook(books)


def pq_encode(
    df: DataFrame,
    codebook: PqCodebook,
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """V10: vector -> array<int> of per-subvector nearest-center codes.
    Arrow-batched numpy argmin; the codebook travels in the UDF closure
    (broadcast once per executor)."""
    books = [cb.copy() for cb in codebook.codebooks]
    d_sub = codebook.sub_dim

    @pandas_udf(ArrayType(IntegerType()))
    def encode(vecs):
        import pandas as pd

        X = np.array(vecs.tolist(), dtype=np.float64)
        codes = np.empty((X.shape[0], len(books)), dtype=np.int32)
        for m, cb in enumerate(books):
            sub = X[:, m * d_sub:(m + 1) * d_sub]
            # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin over centers
            d2 = (
                (sub ** 2).sum(axis=1, keepdims=True)
                - 2.0 * sub @ cb.T
                + (cb ** 2).sum(axis=1)
            )
            codes[:, m] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return df.withColumn("pq_code", encode(F.col(vec_col).cast("array<double>")))


def pq_adc_score(
    query_vector,
    codebook: PqCodebook,
    code_col: str = "pq_code",
) -> Column:
    """V11: asymmetric distance — precompute the query's m x k table of
    squared subvector distances once, then score(code) =
    sqrt(sum_m table[m, code[m]]) by table lookup (the reference's SDC
    SIMD loop as a numpy gather)."""
    q = np.asarray(query_vector, dtype=np.float64)
    d_sub = codebook.sub_dim
    # per-subvector lookup rows; kept as a list because k can differ per
    # subvector (KMeans may return < k centers on tiny training sets)
    table = [
        ((cb - q[m * d_sub:(m + 1) * d_sub]) ** 2).sum(axis=1)
        for m, cb in enumerate(codebook.codebooks)
    ]

    @pandas_udf(DoubleType())
    def adc(codes):
        import pandas as pd

        C = np.array(codes.tolist(), dtype=np.int64)  # (n, m)
        d2 = np.zeros(C.shape[0], dtype=np.float64)
        for m, row in enumerate(table):
            d2 += row[C[:, m]]
        return pd.Series(np.sqrt(d2))

    return adc(F.col(code_col))


def pq_adc_score_batch(
    codebook: PqCodebook,
    *,
    qv_col: str = "qv",
    code_col: str = "pq_code",
) -> Column:
    """Batch-of-queries ADC (V11 for N queries in ONE plan): one Arrow
    pandas UDF over (query_vector, code) pairs with the codebook shipped
    in the closure — the batch analog of pq_adc_score, which bakes a
    single query's m x k lookup table into the UDF and therefore can't
    serve a query DataFrame (the limitation this lifts; the reference
    serves every search through its per-collection quantizer,
    rs/index/src/collection/mod.rs:145-149).

    Per batch the distance is computed as vectorized residuals against
    the gathered code centers: d2 = sum_m ||q_sub - cb[m][code_m]||^2 —
    bit-identical to the single-query table lookup (same float ops in
    the same order per subvector). The scan-side win is unchanged:
    candidates carry m int codes, not the 4*d-byte raw vector, so the
    posting scan stays code-only and the raw vectors are read only for
    the re-rank pool."""
    books = [cb.copy() for cb in codebook.codebooks]
    d_sub = codebook.sub_dim

    @pandas_udf(DoubleType())
    def adc(qvs, codes):
        import pandas as pd

        Q = np.array(qvs.tolist(), dtype=np.float64)      # (n, d)
        C = np.array(codes.tolist(), dtype=np.int64)      # (n, m)
        d2 = np.zeros(C.shape[0], dtype=np.float64)
        for m, cb in enumerate(books):
            diff = Q[:, m * d_sub:(m + 1) * d_sub] - cb[C[:, m]]
            d2 += (diff * diff).sum(axis=1)
        return pd.Series(np.sqrt(d2))

    return adc(F.col(qv_col).cast("array<double>"), F.col(code_col))


def pq_search(
    encoded: DataFrame,
    query_vector,
    codebook: PqCodebook,
    k: int,
    *,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by ADC distance over PQ codes (ordering contract as V16)."""
    return (
        encoded.select(id_col, pq_adc_score(query_vector, codebook).alias("score"))
        .orderBy(F.col("score").asc_nulls_last(), F.col(id_col).asc())
        .limit(k)
    )


# --------------------------------------------------------------------------
def _stack_book(b) -> np.ndarray:
    """One subvector's (k, d_sub) center matrix from whatever nesting
    the source hands us — Arrow deserializes array<array<double>> as an
    OBJECT ndarray of ndarrays, which np.asarray(dtype=float64) refuses
    to stack."""
    return np.stack([np.asarray(row, dtype=np.float64) for row in b])


# PER-USER PQ codebooks (beyond the reference's per-collection binding,
# rs/index/src/collection/mod.rs:145-149 — same motivation as
# index/sq.train_sq_per_user): k-means center allocation follows
# training mass, so a SHARED codebook quantizes an off-distribution
# minority tenant coarsely (measured: tools/pq_recall_skew.py —
# minority-user rerank40 recall@10 0.883 vs 0.975). Training one
# codebook PER USER restores each tenant's full center budget at the
# cost of m*k*d_sub floats per user.


def train_pq_per_user(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    vec_col: str = "vector",
    num_subvectors: int = 8,
    num_centers: int = 16,
    training_sample: int = 10_000,
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """Per-user PQ codebooks as a (user_id, books) table, where books =
    array[m][k][d_sub] of doubles.

    Scale shape (mirrors build_multi_ivf's per-user centroid training):
    a DISTRIBUTED per-user pre-sample (seeded xxhash64 rank window,
    bounded at training_sample rows per user) runs before the grouped
    fit, so a whale user can never materialize its full vector set in
    one Arrow batch; the fit itself is m seeded numpy Lloyd's runs per
    user inside applyInPandas — one shuffle on user_id, driver memory
    independent of user count."""
    from pyspark.sql.window import Window

    from muopdb_spark.index.kmeans import lloyd

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
        if len(pdf) > training_sample:  # regression tripwire (see above)
            raise AssertionError(
                f"pq fit group for user {pdf['user_id'].iat[0]} has "
                f"{len(pdf)} rows > training_sample={training_sample}"
            )
        user = int(pdf["user_id"].iat[0])
        X = np.array(pdf["vector"].tolist(), dtype=np.float64)
        dim = X.shape[1]
        assert dim % num_subvectors == 0, (
            f"dim {dim} not divisible by m={num_subvectors}")
        d_sub = dim // num_subvectors
        books = [
            lloyd(X[:, m * d_sub:(m + 1) * d_sub], num_centers,
                  seed=seed + 31 * user + m, max_iter=max_iter).tolist()
            for m in range(num_subvectors)
        ]
        return pd.DataFrame({"user_id": [user], "books": [books]})

    return train.groupBy("user_id").applyInPandas(
        fit, schema="user_id long, books array<array<array<double>>>"
    )


def pq_encode_per_user(
    df: DataFrame,
    books_df: DataFrame,
    *,
    user_col: str = "user_id",
    vec_col: str = "vector",
    salt_buckets: int = 16,
) -> DataFrame:
    """Encode each row with ITS USER'S codebook: cogrouped
    applyInPandas on (user_id, salt). The salt (hash of the vector,
    `salt_buckets` buckets) bounds every Arrow group to ~1/salt_buckets
    of the user's rows — the whale-user OOM guard the fit gets from
    pre-sampling, applied to the full encode; the books side is
    replicated once per salt (a tiny table). Joining books onto rows
    instead would ship m*k*d_sub doubles PER ROW through Arrow —
    typically 10-100x the vector itself — which is why this is a
    cogroup, not a join. Output: df's columns + pq_code array<int>.

    Coverage is validated UP FRONT (one small distinct-users anti-join)
    because an exception raised mid-stream inside a cogrouped UDF — by
    a group encountered after earlier groups already emitted batches —
    kills the Arrow worker with an opaque 'connection reset' instead of
    propagating; a build step should fail with the user id named."""
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
            "no PQ codebook for user(s) "
            f"{sorted(r['user_id'] for r in missing)}; train_pq_per_user "
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
            # keep the Arrow-typed empty frame (an untyped object-dtype
            # empty crashes the worker's Arrow serializer)
            out = left[cols].copy()
            out["pq_code"] = pd.Series([], dtype=object)
            return out
        if right.empty:  # unreachable: coverage validated up front
            raise AssertionError(
                f"no PQ codebook for user {left[user_col].iat[0]}"
            )
        books = [_stack_book(b) for b in right["books"].iat[0]]
        d_sub = books[0].shape[1]
        X = np.array(left[vec_col].tolist(), dtype=np.float64)
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


def collect_pq_books(
    books_df: DataFrame, user_ids=None, *, user_col: str = "user_id"
) -> dict[int, list[np.ndarray]]:
    """Materialize the per-user books for a REQUEST's users only (the
    driver-side analog of the reference's per-user query loop — cost
    bounded by the request's user list, never the tenant population)."""
    sel = books_df
    if user_ids is not None:
        sel = sel.filter(F.col(user_col).isin([int(u) for u in user_ids]))
    return {
        int(r[user_col]): [_stack_book(b) for b in r["books"]]
        for r in sel.collect()
    }


def pq_adc_score_per_user(
    query_vector,
    books_by_user: dict[int, list[np.ndarray]],
    *,
    user_col: str = "user_id",
    code_col: str = "pq_code",
) -> Column:
    """ADC with per-user codebooks: one m x k lookup table per
    REQUESTED user precomputed driver-side (the closure ships only the
    requested users' tables), scored by table gather per row keyed on
    user_id. Rows of users absent from the dict score null (they
    cannot win a top-k anyway and asc_nulls_last sorts them out)."""
    q = np.asarray(query_vector, dtype=np.float64)
    tables = {}
    for user, books in books_by_user.items():
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


def pq_adc_score_batch_per_user(
    books_by_user: dict[int, list[np.ndarray]],
    *,
    user_col: str = "user_id",
    qv_col: str = "qv",
    code_col: str = "pq_code",
) -> Column:
    """Batch-of-queries ADC with per-user codebooks: vectorized
    residuals against the row's user's gathered centers, grouped by
    user inside each Arrow batch."""
    books_by_user = {
        int(u): [_stack_book(b) for b in books]
        for u, books in books_by_user.items()
    }

    @pandas_udf(DoubleType())
    def adc(users, qvs, codes):
        import pandas as pd

        U = users.to_numpy()
        Q = np.array(qvs.tolist(), dtype=np.float64)
        C = np.array(codes.tolist(), dtype=np.int64)
        out = np.full(len(U), np.nan, dtype=np.float64)
        for user, books in books_by_user.items():
            mask = U == user
            if not mask.any():
                continue
            d_sub = books[0].shape[1]
            Qm, Cm = Q[mask], C[mask]
            d2 = np.zeros(Qm.shape[0], dtype=np.float64)
            for m, cb in enumerate(books):
                diff = Qm[:, m * d_sub:(m + 1) * d_sub] - cb[Cm[:, m]]
                d2 += (diff * diff).sum(axis=1)
            out[mask] = np.sqrt(d2)
        return pd.Series(out)

    return adc(F.col(user_col), F.col(qv_col).cast("array<double>"),
               F.col(code_col))
