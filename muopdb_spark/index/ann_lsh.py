"""Random-hyperplane LSH: the sub-quadratic scale path for cosine
similarity search and embedding near-dup detection.

Complements the IVF index (muopdb_spark.index.ivf): where IVF partitions
by learned centroids (needs a training pass), LSH needs no training —
`num_tables` independent signatures of `num_planes` sign bits each.
Points colliding in any table's bucket are candidates; exact cosine
re-ranks them. Recall grows with num_tables, cost with bucket sizes.

At 100 TB: signatures are one Arrow-batched matmul per partition
(map-side, no shuffle); the candidate join shuffles only
(table_idx, bucket, id) triples; exact re-rank touches candidate rows
only. The brute-force twin (operators.dedup.embedding_near_dup_pairs)
is the recall oracle.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from muopdb_spark.functions.distance import cosine_similarity


@dataclass
class RpLshIndex:
    """buckets: (table_idx int, bucket long, id long) — ids only, so the
    candidate self-join never shuffles vector payloads; vectors:
    (id long, vector array<double>) joined back for exact re-rank."""

    buckets: DataFrame
    vectors: DataFrame
    planes: np.ndarray  # (num_tables, num_planes, dim)


def _signatures(X: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, num_tables) packed sign-bit buckets."""
    n_tables, n_planes, _ = planes.shape
    out = np.zeros((X.shape[0], n_tables), dtype=np.int64)
    weights = 1 << np.arange(n_planes, dtype=np.int64)
    for t in range(n_tables):
        bits = (X @ planes[t].T) > 0
        out[:, t] = bits @ weights
    return out


def build_rp_lsh(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    num_planes: int = 12,
    num_tables: int = 4,
    seed: int = 42,
) -> RpLshIndex:
    """Signature computation is one numpy matmul per Arrow batch."""
    if not 1 <= num_planes <= 62:
        # sign bits pack into ONE int64 bucket: 63+ planes would shift
        # past the sign bit and silently fold buckets together
        raise ValueError(
            f"num_planes={num_planes} out of range 1..62 (bucket is one "
            "int64 of packed sign bits; widen num_tables instead)"
        )
    if num_tables < 1:
        raise ValueError(f"num_tables={num_tables} must be >= 1")
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, num_planes, dim))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            X = np.array(pdf["vector"].tolist(), dtype=np.float64)
            sigs = _signatures(X, planes)
            n = len(pdf)
            yield pd.DataFrame({
                "table_idx": np.repeat(np.arange(planes.shape[0]), n),
                "bucket": sigs.T.ravel(),
                "id": np.tile(pdf["id"].to_numpy(), planes.shape[0]),
            })

    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vector")
    ).persist()
    # slim triples only: the bucket table (and everything shuffled through
    # the candidate self-join) never carries the vector payload
    buckets = base.mapInPandas(
        gen, schema="table_idx int, bucket long, id long"
    ).repartition(F.col("table_idx"), F.col("bucket"))
    return RpLshIndex(buckets=buckets.persist(), vectors=base, planes=planes)


def lsh_knn(
    index: RpLshIndex,
    query_vector: Sequence[float],
    k: int,
) -> DataFrame:
    """Approximate top-k by cosine: candidates = union of the query's
    bucket in every table, deduped, exact cosine re-rank (higher = closer
    here; returned as cosine_distance to honor lower-is-closer)."""
    q = np.asarray(query_vector, dtype=np.float64)
    sigs = _signatures(q[None, :], index.planes)[0]
    cond = None
    for t, b in enumerate(sigs):
        c = (F.col("table_idx") == t) & (F.col("bucket") == int(b))
        cond = c if cond is None else (cond | c)
    qlit = F.lit([float(x) for x in q]).cast("array<double>")
    return (
        index.buckets.filter(cond)
        .select("id").dropDuplicates(["id"])
        .join(index.vectors, "id")
        .withColumn("score", F.lit(1.0) - cosine_similarity(F.col("vector"), qlit))
        .select("id", "score")
        .orderBy(F.col("score").asc_nulls_last(), F.col("id").asc())
        .limit(k)
    )


def lsh_near_dup_pairs(
    index: RpLshIndex,
    *,
    threshold: float = 0.9,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Sub-quadratic near-dup pairs: bucket-collision candidates (any
    table) -> exact cosine verification >= threshold. Same output
    contract as the brute-force operators.dedup.embedding_near_dup_pairs
    minus LSH misses (recall < 1 by design; measured in tests).

    Verification runs PER BUCKET as one BLAS block matmul
    (applyInPandas over (table_idx, bucket) groups — the same block
    trick as embedding_near_dup_pairs), replacing the old shape that
    exploded candidate PAIRS through a self-join, deduped millions of
    (id_a, id_b) rows, and joined vectors back twice: with b docs in a
    bucket that shape shuffles O(b^2) pair rows per bucket, while this
    one shuffles the b (id, vector) rows once and dedups only VERIFIED
    pairs (measured r5 at sf0.1 / 16 buckets-per-table: 7.8 s -> 1.3 s
    on the same box). Skew: a viral bucket still costs b^2 inside one
    task — bucket width is the num_planes knob, and `max_bucket_size`
    DROPS buckets over the bound (their members are mutual near-dup
    candidates of each other by construction; route them to clustering
    directly rather than pairwise verification — the d3 band-bucket
    story, docs/SCALE.md), so no task exceeds cap^2 BLAS work."""
    buckets = index.buckets
    if max_bucket_size is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("table_idx", "bucket")
        buckets = (
            buckets.withColumn("_bn", F.count("*").over(w))
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    bv = buckets.join(index.vectors, "id")

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        X = np.array(pdf["vector"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(X, axis=1)
        sims = (X @ X.T) / np.outer(norms, norms)
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= threshold
        a, b = ids[iu[keep]], ids[ju[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({
            "id_a": lo, "id_b": hi,
            "cosine": np.round(sims[iu[keep], ju[keep]], 6),
        })

    return (
        bv.groupBy("table_idx", "bucket")
        .applyInPandas(bucket_pairs, "id_a long, id_b long, cosine double")
        .dropDuplicates(["id_a", "id_b"])
    )


def lsh_save(index: RpLshIndex, path: str) -> None:
    """Persist the index as on-disk tables — buckets and vectors as
    parquet, hyperplanes as JSON — the flushed-segment analog for the
    no-training path, so serving reloads instead of re-hashing the
    corpus (same contract as ivf_save/ivf_load)."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    index.buckets.write.mode("overwrite").parquet(os.path.join(path, "buckets"))
    index.vectors.write.mode("overwrite").parquet(os.path.join(path, "vectors"))
    with open(os.path.join(path, "planes.json"), "w") as f:
        json.dump(
            {"shape": list(index.planes.shape),
             "data": index.planes.ravel().tolist()},
            f,
        )


def lsh_load(spark, path: str) -> RpLshIndex:
    """Reload a saved index. Buckets re-partition on (table_idx, bucket)
    so the candidate self-join stays co-located."""
    import json
    import os

    with open(os.path.join(path, "planes.json")) as f:
        d = json.load(f)
    planes = np.asarray(d["data"], dtype=np.float64).reshape(d["shape"])
    buckets = (
        spark.read.parquet(os.path.join(path, "buckets"))
        .repartition(F.col("table_idx"), F.col("bucket"))
    )
    vectors = spark.read.parquet(os.path.join(path, "vectors"))
    return RpLshIndex(buckets=buckets, vectors=vectors, planes=planes)
