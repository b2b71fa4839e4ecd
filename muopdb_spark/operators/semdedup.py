"""SemDeDup: semantic deduplication via embedding clustering.

Published method (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540): k-means
cluster the (normalized) embeddings, then look for near-duplicate
pairs ONLY within each cluster — cosine above a threshold marks a
semantic duplicate, and one representative per duplicate group is
kept.  Clustering bounds the pair search to per-cluster blocks, which
is what makes semantic dedup tractable at corpus scale; the
cross-cluster pairs it can miss are the method's documented
approximation (the exact quadratic twin is operators/dedup.py's
embedding_cosine path, kept for oracles at small SF).

Spark-first design:
  - Centroid TRAINING is the bounded driver-sample + seeded numpy
    Lloyd's shared with the IVF index build (index/kmeans.py — the
    same 20k-sample contract as the reference's kmeans_builder.rs).
  - ASSIGNMENT is a broadcast crossJoin over the centroid table plus
    an argmax window — the assign_postings shape (index/ivf.py:93),
    JVM-side cosine via zip_with/aggregate, corpus shuffles once on
    cluster_id (exactly the partitioning the pair stage needs).
  - PAIRS are an equi self-join on cluster_id with id_a < id_b and a
    JVM cosine filter: per-cluster quadratic, the published shape —
    pick k so clusters stay bounded (paper uses k ~ n/10k; skewed
    clusters split by AQE skew-join).
  - Removal rule is deterministic: a vector is removed iff a
    LOWER-id vector in its cluster matches at >= threshold (min-id
    survivor, same convention as the text dedup family); the witness
    id is reported for auditability.

Scale note (100 TB): with k in the 10^5 range the n x k assignment
crossJoin dominates; pass ``meta_k`` to switch the assignment stage to
cluster_assignments_two_level (the centroid-of-centroids tier, n x
~sqrt(k) work; meta_probes=None is pinned bit-identical to the flat
stage, bounded probes are the approximation knob) — the pair stage is
unchanged. The blocked-matmul pandas path (index/multi_ivf.py) remains
the alternative when vector width, not k, dominates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from muopdb_spark.functions.distance import cosine_similarity
from muopdb_spark.index.kmeans import lloyd


def train_centroids(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    k: int = 8,
    seed: int = 42,
    training_sample: int = 20_000,
) -> DataFrame:
    """(cluster_id, centroid): seeded k-means over a BOUNDED driver
    sample (collect is capped at training_sample rows by construction)."""
    n = emb.count()
    frac = min(1.0, training_sample / max(n, 1))
    train = emb.sample(fraction=frac, seed=seed) if frac < 1.0 else emb
    X = np.array(
        [r[0] for r in train.select(vec_col).collect()], dtype=np.float64
    )
    centers = lloyd(X, k, seed=seed)
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cluster_id int, centroid array<double>",
    )


def cluster_assignments(
    emb: DataFrame,
    centroids: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cluster_id, cent_cos, vector): nearest centroid by cosine —
    broadcast crossJoin + argmax window (assign_postings shape)."""
    scored = (
        emb.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("vector"),
        )
        .crossJoin(F.broadcast(centroids))
        .withColumn("cos", cosine_similarity(F.col("vector"), F.col("centroid")))
    )
    w = Window.partitionBy("id").orderBy(F.desc("cos"), F.asc("cluster_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("id", "cluster_id", F.col("cos").alias("cent_cos"), "vector")
    )


def cluster_assignments_two_level(
    emb: DataFrame,
    centroids: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    meta_k: int = 4,
    meta_probes: int | None = None,
    seed: int = 42,
    training_sample: int = 20_000,
) -> DataFrame:
    """(id, cluster_id, cent_cos, vector): the 100 TB face of
    cluster_assignments — the module docstring's scale note made real.

    With k centroids in the 10^5 range (SemDeDup's published k ~ n/1e4
    at corpus scale) the flat n x k assignment crossJoin dominates.
    Two-level shape (the index/ivf2.py tier applied to cosine argmax):

      1. meta-centroids over a seeded xxhash64 sample of the CENTROID
         table capped at ``training_sample`` (at k ~ 10^5 x d=768 the
         full table is ~600 MB — the same driver-OOM class as the V7
         split collect, bounded the same way; the k -> meta-cell MAP in
         step 2 still covers every centroid, distributedly)
      2. centroid -> meta-cell map: k x meta_k, broadcast both sides
      3. each vector probes the meta cells (n x meta_k, ~n x sqrt(k)
         when meta_k ~ sqrt(k)) and keeps the top ``meta_probes``
      4. argmax cosine only over centroids in probed cells: expected
         n x (meta_probes * k / meta_k) instead of n x k

    ``meta_probes=None`` probes EVERY cell, which is mathematically the
    flat assignment (the candidate set is all k centroids, same argmax,
    same (cos DESC, cluster_id ASC) tie-break) — pinned bit-identical
    by tests/test_semdedup.py. Bounded probes are the documented
    SemDeDup approximation knob: a vector whose true centroid lives in
    an unprobed cell lands in its best probed cluster, which only
    LOCALIZES the pair search differently — the same class of miss as
    the method's own cross-cluster blindness."""
    spark = emb.sparkSession
    # meta-fit trains on a bounded seeded sample (TakeOrderedAndProject
    # — only <= training_sample centroid rows ever reach the driver);
    # cent_cells below maps ALL k centroids to cells distributedly
    cents = (
        centroids.select("cluster_id", "centroid")
        .orderBy(
            F.xxhash64(F.col("cluster_id"), F.lit(seed)).asc(),
            F.col("cluster_id").asc(),
        )
        .limit(int(training_sample))
        .collect()
    )
    X = np.array([r["centroid"] for r in cents], dtype=np.float64)
    meta_k = min(int(meta_k), len(cents)) or 1
    meta = lloyd(X, meta_k, seed=seed)
    meta_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(meta)],
        "meta_id int, meta_centroid array<double>",
    )
    # 2: centroid -> nearest meta cell (k x meta_k, all broadcast-sized)
    cw = Window.partitionBy("cluster_id").orderBy(
        F.desc("mcos"), F.asc("meta_id")
    )
    cent_cells = (
        centroids.crossJoin(F.broadcast(meta_df))
        .withColumn(
            "mcos", cosine_similarity(F.col("centroid"), F.col("meta_centroid"))
        )
        .withColumn("rnk", F.row_number().over(cw))
        .filter(F.col("rnk") == 1)
        .select("meta_id", "cluster_id", "centroid")
    )
    # 3: vector -> probed meta cells (n x meta_k, ONE map-side pass)
    base = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vector"),
    )
    vw = Window.partitionBy("id").orderBy(F.desc("mcos"), F.asc("meta_id"))
    probed = (
        base.crossJoin(F.broadcast(meta_df))
        .withColumn(
            "mcos", cosine_similarity(F.col("vector"), F.col("meta_centroid"))
        )
        .withColumn("rnk", F.row_number().over(vw))
        .filter(
            F.lit(True) if meta_probes is None
            else F.col("rnk") <= int(meta_probes)
        )
        .select("id", "vector", "meta_id")
    )
    # 4: candidates = centroids of probed cells only; final argmax.
    # cent_cells is k rows — broadcast, so the only shuffle is the
    # argmax window on id (the same exchange the flat path pays).
    w = Window.partitionBy("id").orderBy(F.desc("cos"), F.asc("cluster_id"))
    return (
        probed.join(F.broadcast(cent_cells), "meta_id")
        .withColumn("cos", cosine_similarity(F.col("vector"), F.col("centroid")))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("id", "cluster_id", F.col("cos").alias("cent_cos"), "vector")
    )


def semdedup(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    threshold: float = 0.9,
    seed: int = 42,
    training_sample: int = 20_000,
    centroids: DataFrame | None = None,
    meta_k: int | None = None,
    meta_probes: int | None = None,
) -> DataFrame:
    """Per-vector SemDeDup verdicts:
    (id_col, cluster_id, n_cluster, cent_cos, removed, witness_id).

    removed = a lower-id vector in the same cluster matches at
    >= threshold; witness_id = the smallest such id (null when kept).
    Pass precomputed ``centroids`` to reuse a durable clustering.
    ``meta_k`` switches the assignment stage to the two-level probe
    (cluster_assignments_two_level — the 100 TB path for k >> 10^3);
    with ``meta_probes=None`` it is bit-identical to the flat stage.
    """
    if centroids is None:
        centroids = train_centroids(
            emb, vec_col=vec_col, k=k, seed=seed, training_sample=training_sample
        )
    if meta_k is not None:
        asg = cluster_assignments_two_level(
            emb, centroids, vec_col=vec_col, id_col=id_col,
            meta_k=meta_k, meta_probes=meta_probes, seed=seed,
        )
    else:
        asg = cluster_assignments(
            emb, centroids, vec_col=vec_col, id_col=id_col
        )
    asg = asg.localCheckpoint(eager=True)  # feeds 3 branches; pin like dedup.py
    # Within-cluster pairs as ONE BLAS block matmul per cluster
    # (applyInPandas — the ann_lsh.lsh_near_dup_pairs bucket shape):
    # the naive self-join + per-pair JVM zip_with cosine shuffles
    # O(sum n_c^2) pair rows and evaluates an interpreted array fold
    # per pair (measured 3.1 s at sf0.1 vs 0.4 s here); this shuffles
    # the n (id, vector) rows once, grouped by cluster.  A whale
    # cluster still costs n_c^2 inside one task — k is the knob, and
    # SemDeDup's published recipe keeps clusters ~10^4, so cap^2 BLAS
    # stays in-memory.
    thr = float(threshold)

    def cluster_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        X = np.array(pdf["vector"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0] = 1.0
        sims = (X @ X.T) / np.outer(norms, norms)
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= thr
        a, b = ids[iu[keep]], ids[ju[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi})

    pairs = asg.groupBy("cluster_id").applyInPandas(
        cluster_pairs, "id_a long, id_b long"
    )
    verdict = pairs.groupBy("id_b").agg(F.min("id_a").alias("witness_id"))
    sizes = asg.groupBy("cluster_id").agg(F.count("*").alias("n_cluster"))
    # verdict is bounded by the duplicate count and sizes by k — both
    # broadcast so the assignment table never shuffles again
    return (
        asg.join(F.broadcast(verdict), asg["id"] == verdict["id_b"], "left")
        .join(F.broadcast(sizes), "cluster_id")
        .select(
            F.col("id").alias(id_col),
            "cluster_id",
            "n_cluster",
            F.round("cent_cos", 6).alias("cent_cos"),
            F.col("witness_id").isNotNull().alias("removed"),
            "witness_id",
        )
    )
