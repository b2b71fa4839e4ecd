"""RaBitQ binary quantization: 1 bit per dimension with an unbiased
distance estimator (Gao & Long, SIGMOD 2024 — public algorithm).

Reference parity: rs/quantization/src/rabitq/mod.rs stores exactly
  centroid c, orthogonal matrix P (and its inverse), per-vector bit
  codes sign(P·o), dist-from-centroid ||x - c||, and the dot products
  <o-bar, o>;
rabitq_builder.rs builds them (centroid = dataset mean, orthogonal
matrix from QR of a random gaussian). The reference never wires RaBitQ
into its collection search path — this module is therefore
capability-exceeding: the same artifact plus a full estimate -> rerank
search pipeline.

Spark-first mapping:
  - train: centroid via a distributed mean (posexplode + avg — no
    driver-side dataset), rotation from a SEEDED QR on the driver
    (D x D floats, data-independent);
  - encode: one Arrow-batched pandas UDF emitting a struct of
    (rq_code array<boolean>, rq_norm, rq_ip) — parquet bit-packs
    boolean arrays, so the stored code is ~D bits/vector vs 32·D raw
    (a ~32x scan reduction at 100 TB, the entire point of RaBitQ);
  - score: the estimator is a query-constant numpy expression over the
    bit codes (Arrow-batched), mirroring the paper's
      <o, q-hat> ~= <o-bar, q-rot> / <o-bar, o-rot>
    with est_dist^2 = ||x-c||^2 + ||q-c||^2 - 2·||x-c||·||q-c||·est_ip;
  - search: estimated top-N (TakeOrderedAndProject) -> exact re-rank
    of N candidates -> top-k, so the end-to-end result is EXACT given
    candidate containment (pytest recall-gated), which keeps the
    driver-contract query DuckDB-oracle-able.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    StructField,
    StructType,
)

_ENC_SCHEMA = StructType(
    [
        StructField("rq_code", ArrayType(BooleanType())),
        StructField("rq_norm", DoubleType()),
        StructField("rq_ip", DoubleType()),
    ]
)


@dataclass
class RabitQCodebook:
    """centroid (D,) + orthogonal rotation P (D, D). P is orthogonal so
    P^-1 = P.T — the reference stores the inverse explicitly
    (rabitq/mod.rs orthogonal_matrix_inv); we derive it."""

    centroid: np.ndarray
    rotation: np.ndarray

    @property
    def dim(self) -> int:
        return int(self.centroid.shape[0])

    def to_json(self) -> str:
        import json

        return json.dumps(
            {"centroid": self.centroid.tolist(), "rotation": self.rotation.tolist()}
        )

    @classmethod
    def from_json(cls, s: str) -> "RabitQCodebook":
        import json

        d = json.loads(s)
        return cls(
            np.asarray(d["centroid"], dtype=np.float64),
            np.asarray(d["rotation"], dtype=np.float64),
        )


def train_rabitq(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    seed: int = 42,
) -> RabitQCodebook:
    """Centroid = exact distributed mean per dimension (one shuffle on
    `pos`, D rows collected — never the dataset); rotation = QR of a
    seeded gaussian (rabitq_builder.rs generate_orthogonal_matrix), data-
    independent so it needs no sample at all."""
    mean_rows = (
        df.select(F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.avg("x").alias("mu"))
        .collect()
    )
    centroid = np.zeros(len(mean_rows), dtype=np.float64)
    for r in mean_rows:
        centroid[r["pos"]] = r["mu"]
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((len(centroid), len(centroid))))
    return RabitQCodebook(centroid=centroid, rotation=q)


def rabitq_encode(
    df: DataFrame,
    code: RabitQCodebook,
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per vector x: residual r = x - c, unit o = r/||r||, rotated
    o_rot = P·o; emit
      rq_code = sign bits of o_rot  (the BitVec of rabitq/mod.rs),
      rq_norm = ||r||               (dist_from_centroid),
      rq_ip   = <o-bar, o_rot> = sum|o_rot| / sqrt(D)
                                    (quantized_vector_dot_products).
    One Arrow batch pass; the codebook rides the closure (D x D floats,
    broadcast-trivial)."""
    c = code.centroid.copy()
    P = code.rotation.copy()
    sqrt_d = float(np.sqrt(code.dim))

    @pandas_udf(_ENC_SCHEMA)
    def encode(vecs):
        import pandas as pd

        X = np.array(vecs.tolist(), dtype=np.float64)
        R = X - c
        norms = np.linalg.norm(R, axis=1)
        safe = np.where(norms == 0.0, 1.0, norms)
        O = (R / safe[:, None]) @ P.T
        signs = O >= 0.0
        ip = np.abs(O).sum(axis=1) / sqrt_d
        return pd.DataFrame(
            {"rq_code": list(signs), "rq_norm": norms, "rq_ip": ip}
        )

    enc = df.withColumn("_rq", encode(F.col(vec_col).cast("array<double>")))
    return (
        enc.withColumn("rq_code", F.col("_rq.rq_code"))
        .withColumn("rq_norm", F.col("_rq.rq_norm"))
        .withColumn("rq_ip", F.col("_rq.rq_ip"))
        .drop("_rq")
    )


def rabitq_est_score(
    query_vector,
    code: RabitQCodebook,
    *,
    code_col: str = "rq_code",
    norm_col: str = "rq_norm",
    ip_col: str = "rq_ip",
) -> Column:
    """Estimated L2 distance to the query. Query-side constants (q' =
    q - c, ||q'||, q_rot = P·q'/||q'||) are computed ONCE on the driver;
    per row the estimator is a single masked sum over the bit code:
      <o-bar, q_rot> = sum(+-q_rot) / sqrt(D)
      est_ip         = <o-bar, q_rot> / rq_ip
      est_d^2        = rq_norm^2 + ||q'||^2 - 2·rq_norm·||q'||·est_ip
    (clamped at 0; rq_norm = 0 rows fall back to ||q'|| exactly)."""
    q = np.asarray(query_vector, dtype=np.float64) - code.centroid
    q_norm = float(np.linalg.norm(q))
    q_rot = (code.rotation @ (q / q_norm)) if q_norm > 0 else np.zeros(code.dim)
    sqrt_d = float(np.sqrt(code.dim))

    @pandas_udf(DoubleType())
    def est(codes, norms, ips):
        import pandas as pd

        S = np.array(codes.tolist(), dtype=bool)  # (n, D)
        # sum of +-q_rot per the sign bits: total = sum(q_rot[s]) - sum(q_rot[~s])
        pos = S @ q_rot
        obar_qrot = (2.0 * pos - q_rot.sum()) / sqrt_d
        n = norms.to_numpy(dtype=np.float64)
        ip = ips.to_numpy(dtype=np.float64)
        est_ip = np.divide(
            obar_qrot, ip, out=np.zeros_like(obar_qrot), where=ip != 0.0
        )
        d2 = n * n + q_norm * q_norm - 2.0 * n * q_norm * est_ip
        return pd.Series(np.sqrt(np.maximum(d2, 0.0)))

    return est(F.col(code_col), F.col(norm_col), F.col(ip_col))


def rabitq_est_score_batch(
    code: RabitQCodebook,
    *,
    qv_col: str = "qv",
    code_col: str = "rq_code",
    norm_col: str = "rq_norm",
    ip_col: str = "rq_ip",
) -> Column:
    """Batch-of-queries estimator (the batch analog of rabitq_est_score,
    whose query-side constants are baked into the closure and therefore
    can't serve a query DataFrame). Per Arrow batch the query residuals
    are rotated as one matmul ((n,D) @ P.T) and the masked sign-sum runs
    as one elementwise product — identical arithmetic to the
    single-query path for equal query vectors (rows with a zero query
    residual fall back to est = rq_norm, same as the single-query
    q_norm == 0 branch)."""
    c = code.centroid.copy()
    P = code.rotation.copy()
    sqrt_d = float(np.sqrt(code.dim))

    @pandas_udf(DoubleType())
    def est(qvs, codes, norms, ips):
        import pandas as pd

        Q = np.array(qvs.tolist(), dtype=np.float64) - c   # (n, D) residuals
        qn = np.linalg.norm(Q, axis=1)
        safe = np.where(qn == 0.0, 1.0, qn)
        Qr = (Q / safe[:, None]) @ P.T                     # rotated unit queries
        S = np.array(codes.tolist(), dtype=bool)           # (n, D)
        pos = (S * Qr).sum(axis=1)
        obar_qrot = (2.0 * pos - Qr.sum(axis=1)) / sqrt_d
        n = norms.to_numpy(dtype=np.float64)
        ip = ips.to_numpy(dtype=np.float64)
        est_ip = np.divide(
            obar_qrot, ip, out=np.zeros_like(obar_qrot), where=ip != 0.0
        )
        d2 = n * n + qn * qn - 2.0 * n * qn * est_ip
        return pd.Series(np.sqrt(np.maximum(d2, 0.0)))

    return est(
        F.col(qv_col).cast("array<double>"),
        F.col(code_col), F.col(norm_col), F.col(ip_col),
    )


def rabitq_search(
    encoded: DataFrame,
    query_vector,
    code: RabitQCodebook,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 300,
    score_decimals: int | None = None,
) -> DataFrame:
    """Estimated top-`rerank` candidates (TakeOrderedAndProject — no full
    sort), then EXACT re-rank of those candidates -> top-k. Exact given
    containment; the re-rank pool bounds exact work to a constant per
    query regardless of corpus size."""
    from muopdb_spark.functions.distance import score_expr

    cand = (
        encoded.withColumn("_est", rabitq_est_score(query_vector, code))
        .select(id_col, vec_col, "_est")
        .orderBy(F.col("_est").asc_nulls_last(), F.col(id_col).asc())
        .limit(rerank)
    )
    q = F.lit([float(x) for x in query_vector]).cast("array<double>")
    exact = cand.select(
        id_col, score_expr("l2", F.col(vec_col), q).alias("score")
    )
    if score_decimals is not None:
        exact = exact.select(id_col, F.round("score", score_decimals).alias("score"))
    return exact.orderBy(F.col("score").asc_nulls_last(), F.col(id_col).asc()).limit(k)
