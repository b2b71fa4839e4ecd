"""Scalar quantization (SQ8): per-dimension affine uint8 codes.

The classic 8-bit scalar quantizer (Faiss ScalarQuantizer QT_8bit
lineage): per-dim (min, max) over the corpus, code_i =
round(255 * (x_i - min_i) / (max_i - min_i)) clamped to [0, 255];
decode_i = min_i + code_i * scale_i.  Approximate L2 on decoded
values estimates the true distance within half a quantization step
per dim; estimated top-R -> exact re-rank -> top-k, exact given
containment (the v11/v13 contract shape).

Vs PQ: SQ8 keeps full per-dimension resolution at 4x compression
(1 byte/dim vs 4-byte float) and needs NO codebook training — the
"artifact" is 2*dim floats.  Vs RaBitQ: 8 bits/dim instead of 1, far
tighter estimates, proportionally larger codes.  Beyond-reference:
the reference's quantizer framework (rs/quantization/src/quantizer.rs
trait surface) ships NoQuantizer + PQ (+ RaBitQ unwired); SQ8 rounds
out the classic quantizer family on the same search contract.

Scale (100 TB):
  - train = ONE aggregate job (per-dim min/max via posexplode +
    groupBy(dim) with map-side partial combine); the codebook is
    2*dim floats — ships in the closure as literals.
  - encode and the estimate pass are pure JVM array expressions over
    the scan: no Python, no shuffle; codes are array<int> in-plan (the
    columnar-friendly form) and PACKED TO BINARY on disk via
    sq_pack_expr/sq_save — 1 byte/dim persisted, the 4x storage win
    vs float32 when persisting 100 TB of codes.
  - the exact pass touches only the constant `rerank` candidates.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


@dataclass
class SqCodebook:
    mins: list[float]
    scales: list[float]  # (max - min) / 255, floored at tiny eps

    @property
    def dim(self) -> int:
        return len(self.mins)

    def to_json(self) -> str:
        return json.dumps({"mins": self.mins, "scales": self.scales})

    @classmethod
    def from_json(cls, s: str) -> "SqCodebook":
        d = json.loads(s)
        return cls(mins=d["mins"], scales=d["scales"])


def train_sq(df: DataFrame, *, vec_col: str = "embedding") -> SqCodebook:
    """Per-dim min/max in ONE aggregate job; collects 2*dim floats."""
    stats = (
        df.select(F.posexplode(F.col(vec_col).cast("array<double>")).alias("d", "x"))
        .groupBy("d")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .orderBy("d")
        .collect()
    )
    mins = [float(r.lo) for r in stats]
    scales = [max((float(r.hi) - float(r.lo)) / 255.0, 1e-12) for r in stats]
    return SqCodebook(mins=mins, scales=scales)


def sq_encode_expr(vec: Column, cb: SqCodebook) -> Column:
    """array<int> uint8 codes — a pure JVM transform over the vector.

    The [0, 255] clamp happens in DOUBLE space, before the int cast:
    a dimension that was constant at train time has its scale floored
    at 1e-12, so encoding a NEW vector that deviates there puts
    (x - min)/scale far past 2^31 — an int cast first would abort the
    whole job with CAST_OVERFLOW under ANSI mode (Spark 4 default) and
    only survived non-ANSI by the accident of least() ignoring the
    overflow artifact (r16 review find, regression-pinned)."""
    mins = F.lit(cb.mins).cast("array<double>")
    scales = F.lit(cb.scales).cast("array<double>")
    idx = F.sequence(F.lit(1), F.lit(cb.dim))
    return F.transform(
        idx,
        lambda i: F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(255.0),
                F.round(
                    (F.element_at(vec, i) - F.element_at(mins, i))
                    / F.element_at(scales, i)
                ),
            ),
        ).cast("int"),
    )


def sq_encode(
    df: DataFrame, cb: SqCodebook, *, vec_col: str = "embedding"
) -> DataFrame:
    return df.withColumn(
        "sq_code", sq_encode_expr(F.col(vec_col).cast("array<double>"), cb)
    )


def sq_pack_expr(codes: Column) -> Column:
    """array<int> uint8 codes -> binary, exactly 1 byte per code — the
    persisted form (4x smaller than float32 vectors, ~4x smaller than
    parquet array<int>).  Pure JVM: per-code zero-padded hex, joined,
    unhex'd.  No Python, no shuffle."""
    return F.unhex(
        F.array_join(F.transform(codes, lambda c: F.lpad(F.hex(c), 2, "0")), "")
    )


def sq_unpack_expr(packed: Column, dim: int) -> Column:
    """binary (1 byte/code) -> array<int>, the in-plan scoring form.
    Map-side JVM expression over the scan (hex + fixed-width substring
    + base-16 conv), so serving from the packed artifact costs one
    projection, not a Python pass."""
    hx = F.hex(packed)
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    return F.transform(
        idx,
        lambda i: F.conv(F.substring(hx, i * 2 + 1, F.lit(2)), 16, 10).cast("int"),
    )


def sq_save(
    encoded: DataFrame,
    cb: SqCodebook,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the durable SQ index: codebook JSON (2*dim floats) +
    the encoded table with codes packed to binary.  Raw vectors ride
    along for the exact re-rank pass (the reference likewise keeps raw
    vectors beside quantized codes for reranking).  Mirrors the
    reference's train-at-flush contract (rs/index/src/collection/
    core.rs:867-976: quantizers are trained when a segment is built,
    never at search time)."""
    os.makedirs(path, exist_ok=True)
    (
        encoded.select(
            id_col, vec_col, sq_pack_expr(F.col("sq_code")).alias("sq_packed")
        )
        .write.mode("overwrite")
        .parquet(os.path.join(path, "codes"))
    )
    with open(os.path.join(path, "codebook.json"), "w") as f:
        f.write(cb.to_json())


def sq_load(
    spark: SparkSession,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, SqCodebook]:
    """Reopen the durable artifact: (encoded DataFrame with in-plan
    array<int> codes unpacked lazily from the binary column, codebook)."""
    with open(os.path.join(path, "codebook.json")) as f:
        cb = SqCodebook.from_json(f.read())
    df = spark.read.parquet(os.path.join(path, "codes")).select(
        id_col, vec_col, sq_unpack_expr(F.col("sq_packed"), cb.dim).alias("sq_code")
    )
    return df, cb


def train_sq_per_user(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    vec_col: str = "vector",
) -> DataFrame:
    """PER-USER SQ codebooks: (user_col, mins array<double>, scales
    array<double>) — one distributed aggregate, no driver collect.

    Motivation (measured, tools/pq_recall_skew.py): a SHARED codebook
    trained on the pooled corpus is dominated by the majority user's
    distribution; an off-distribution minority user's vectors land in a
    sliver of the quantization range and lose resolution (recall@10
    0.883 vs 0.975 rerank40 in the r5 measurement). Per-user min/max
    restores each user's full 256-step range at the cost of 2*dim
    floats per user — the multi-tenant analog of the reference's
    per-collection quantizer binding."""
    stats = (
        df.select(
            F.col(user_col),
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("d", "x"),
        )
        .groupBy(user_col, "d")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    )
    per_dim = F.array_sort(
        F.collect_list(F.struct(F.col("d"), F.col("lo"), F.col("hi")))
    )
    return stats.groupBy(user_col).agg(
        F.transform(per_dim, lambda s: s["lo"]).alias("mins"),
        F.transform(
            per_dim,
            lambda s: F.greatest((s["hi"] - s["lo"]) / 255.0, F.lit(1e-12)),
        ).alias("scales"),
    )


def sq_encode_cols(vec: Column, mins: Column, scales: Column, dim: int) -> Column:
    """array<int> codes with PER-ROW codebook columns (the per-user
    path): same affine quantizer as sq_encode_expr, mins/scales read
    from columns instead of literals. Clamps in double space before
    the int cast for the same ANSI CAST_OVERFLOW reason (a user whose
    training slice was constant in a dimension has that scale floored
    at 1e-12 — any later off-value vector would abort the job)."""
    idx = F.sequence(F.lit(1), F.lit(dim))
    return F.transform(
        idx,
        lambda i: F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(255.0),
                F.round(
                    (F.element_at(vec, i) - F.element_at(mins, i))
                    / F.element_at(scales, i)
                ),
            ),
        ).cast("int"),
    )


def sq_est_score_cols(query_vector, mins: Column, scales: Column) -> Column:
    """Estimated L2 with per-row codebook columns: one JVM fold over
    (q_i - (min_i + code_i*scale_i))^2.  zip_with-shaped for the same
    single-evaluation reason as sq_est_score.  `query_vector` may be a
    Python sequence (single query) or a Column (batch path: one query
    vector per row)."""
    q = (
        query_vector
        if isinstance(query_vector, Column)
        else F.lit([float(x) for x in query_vector]).cast("array<double>")
    )
    decoded = F.zip_with(
        mins,
        F.zip_with(F.col("sq_code"), scales, lambda c, s: c * s),
        lambda m, x: m + x,
    )
    sq_terms = F.zip_with(q, decoded, lambda a, b: (a - b) * (a - b))
    return F.sqrt(F.aggregate(sq_terms, F.lit(0.0), lambda acc, x: acc + x))


def sq_est_score(query_vector, cb: SqCodebook) -> Column:
    """Estimated L2 distance query-vs-decoded-code, JVM-side: the
    query-minus-min residual is precomputed driver-side so the hot
    expression is one fold over (residual_i - code_i*scale_i)^2.

    Built from zip_with (NOT per-index element_at): zip_with evaluates
    its input arrays ONCE per row, so when `sq_code` is itself a lazy
    expression (the packed-binary unpack of sq_load) the cost stays
    O(dim) — an element_at-per-term shape inlines the whole unpack
    into every term and goes O(dim^2) (measured 1.9 s vs 1.0 s on the
    sf0.1 artifact)."""
    resid = [float(q) - m for q, m in zip(query_vector, cb.mins)]
    rlit = F.lit(resid).cast("array<double>")
    slit = F.lit(cb.scales).cast("array<double>")
    scaled = F.zip_with(F.col("sq_code"), slit, lambda c, s: c * s)
    sq_terms = F.zip_with(rlit, scaled, lambda r, x: (r - x) * (r - x))
    return F.sqrt(F.aggregate(sq_terms, F.lit(0.0), lambda acc, x: acc + x))


def sq_est_score_batch(cb: SqCodebook, qv: Column | None = None) -> Column:
    """Estimated L2 for the BATCH paths (one query vector per row in
    `qv`): decode = min + code*scale from codebook literals, then one
    zip_with fold against the row's query vector.  Unlike the PQ /
    RaBitQ batch estimators (Arrow pandas UDFs), this stays a pure JVM
    expression — SQ codes decode positionally with no table lookup."""
    q = qv if qv is not None else F.col("qv")
    mins = F.lit(cb.mins).cast("array<double>")
    slit = F.lit(cb.scales).cast("array<double>")
    decoded = F.zip_with(
        mins,
        F.zip_with(F.col("sq_code"), slit, lambda c, s: c * s),
        lambda m, x: m + x,
    )
    sq_terms = F.zip_with(q, decoded, lambda a, b: (a - b) * (a - b))
    return F.sqrt(F.aggregate(sq_terms, F.lit(0.0), lambda acc, x: acc + x))


def sq_search(
    encoded: DataFrame,
    query_vector,
    cb: SqCodebook,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 300,
    score_decimals: int | None = None,
) -> DataFrame:
    """Estimated top-`rerank` (TakeOrderedAndProject, no full sort) ->
    exact re-rank -> top-k; exact given containment (pytest-gated)."""
    from muopdb_spark.functions.distance import score_expr

    cand = (
        encoded.withColumn("_est", sq_est_score(query_vector, cb))
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
    return exact.orderBy(
        F.col("score").asc_nulls_last(), F.col(id_col).asc()
    ).limit(k)
