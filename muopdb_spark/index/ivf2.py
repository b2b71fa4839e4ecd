"""Two-level centroid probe: meta-centroids over the centroid table.

The reference walks an HNSW graph over its centroids so phase 1 never
scans all of them (rs/index/src/spann/index.rs: centroid search via
the HNSW tier; SURVEY V2).  The single-level Spark analog scores EVERY
centroid per query — the right call while the centroid table is tiny,
but at 100 TB scale with k ~ 10^5 centroids the linear probe becomes
the per-query bottleneck.  This module adds the same remedy in
Spark-native form: cluster the centroids themselves (meta_k ~ sqrt(k)
meta-cells, seeded Lloyd's), probe the meta table first (O(meta_k)),
then score only the centroids inside the best meta-cells
(O(meta_probes * k / meta_k)) — per-query probe cost drops from O(k)
to O(sqrt(k)) at equal recall-knob expressiveness.

Approximation contract mirrors V19: probing every meta-cell is
EXACTLY the single-level probe (pinned by equivalence test and the
driver oracle via the full-probe config); pruned meta_probes trades
recall for probe cost, recall pytest-gated on seeded clusters
(tests/test_ivf2.py) for l2, cosine, AND dot.

Metric consistency (assignment == probe measure, so the pruned meta
probe ranks cells by the same yardstick that grouped them):
  - l2 / l2_squared: Lloyd's + L2-argmin assignment, L2 meta probe.
  - cosine: spherical — centroids are L2-NORMALIZED before Lloyd's
    and assignment is max-cosine; the meta probe scores 1 - cos.
  - dot: dot has no geometry to cluster in (scores unbounded in the
    vector norm), so cells group by L2 LOCATION and the meta probe
    ranks cells by dot(q, meta_center) — the cell-mean heuristic:
    a cell's center approximates its members' average dot score.
    Documented heuristic, recall-gated in pytest like cosine.

Scale notes:
  - build trains Lloyd's on a BOUNDED, deterministic sample of the
    centroid table (default 20k rows — same contract as the k-means
    trainer), so driver memory no longer scales with k x dim; the
    full-table assignment runs DISTRIBUTED as a broadcast crossJoin +
    argmin window (the semdedup.cluster_assignments shape) — only
    meta_k x dim doubles ever ship to executors.
  - the per-query meta probe is driver-side numpy over meta_k rows;
    centroid filtering is a broadcast semi join; everything downstream
    is the unchanged ivf_search plan (partition-pruned posting scan).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from muopdb_spark.functions.distance import score_expr
from muopdb_spark.index.ivf import IvfIndex, ivf_search
from muopdb_spark.index.kmeans import lloyd


@dataclass
class TwoLevelIvf:
    base: IvfIndex
    meta_centers: np.ndarray  # (meta_k, dim)
    centroid_meta: DataFrame  # (centroid_id int, meta_id int)

    @property
    def meta_k(self) -> int:
        return len(self.meta_centers)


def build_two_level(
    index: IvfIndex,
    *,
    meta_k: int | None = None,
    seed: int = 42,
    training_sample: int = 20_000,
) -> TwoLevelIvf:
    """Cluster the centroid table into meta-cells (default sqrt(k),
    where k is the FULL centroid count — not the bounded Lloyd's
    training sample, so a 10^6-centroid table still gets ~10^3
    meta-cells even though Lloyd's trains on 20k of them; the count is
    read from the one-row sample-collection job's side, costing one
    extra count() action at build time only).

    Lloyd's trains on a bounded deterministic sample (lowest
    centroid_id first — arbitrary ids, so unbiased w.r.t. geometry);
    the full assignment is a distributed broadcast crossJoin + argmin
    window, so neither step scales driver memory with k."""
    spherical = index.metric == "cosine"
    cents = index.centroids.select("centroid_id", "centroid")
    vec = F.col("centroid").cast("array<double>")
    if spherical:
        norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))
        vec = F.transform(vec, lambda x: x / F.greatest(norm, F.lit(1e-12)))
    cents = cents.select("centroid_id", vec.alias("cvec"))

    sample = (
        cents.orderBy("centroid_id").limit(int(training_sample)).collect()
    )
    X = np.array([r.cvec for r in sample], dtype=np.float64)
    if meta_k is not None:
        mk = meta_k
    else:
        # sqrt of the FULL table; the sample length is only a floor of
        # it when the table exceeds training_sample
        total = (
            len(sample) if len(sample) < int(training_sample)
            else cents.count()
        )
        mk = max(1, int(math.sqrt(total)))
    # Lloyd's cannot produce more centers than training points
    mk = min(mk, max(1, len(sample)))
    centers = lloyd(X, mk, seed=seed)
    if spherical:
        centers = centers / np.maximum(
            np.linalg.norm(centers, axis=1, keepdims=True), 1e-12
        )

    spark = index.centroids.sparkSession
    meta_df = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centers)],
        "meta_id int, mc array<double>",
    )
    # assignment measure: L2 for l2/dot (location clustering), cosine
    # (on pre-normalized vectors == L2 argmin on the sphere) for cosine
    assign_metric = "cosine" if spherical else "l2"
    scored = cents.crossJoin(F.broadcast(meta_df)).withColumn(
        "d", score_expr(assign_metric, F.col("cvec"), F.col("mc"))
    )
    w = Window.partitionBy("centroid_id").orderBy(
        F.asc("d"), F.asc("meta_id")
    )
    assigned = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("centroid_id", "meta_id")
        .localCheckpoint(eager=True)
    )
    return TwoLevelIvf(base=index, meta_centers=centers, centroid_meta=assigned)


def _meta_probe(tl: TwoLevelIvf, query_vector, meta_probes: int) -> list[int]:
    """Top meta-cells by the index metric — numpy over meta_k rows."""
    q = np.asarray([float(x) for x in query_vector], dtype=np.float64)
    C = tl.meta_centers
    if tl.base.metric in ("l2", "l2_squared"):
        scores = ((C - q) ** 2).sum(axis=1)
    elif tl.base.metric == "dot":
        scores = -(C @ q)
    elif tl.base.metric == "cosine":
        qn = q / (np.linalg.norm(q) or 1.0)
        cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        scores = 1.0 - cn @ qn
    else:  # pragma: no cover - registry guards metrics upstream
        raise ValueError(f"unsupported metric {tl.base.metric!r}")
    order = np.lexsort((np.arange(len(C)), scores))
    return [int(i) for i in order[: max(1, meta_probes)]]


def two_level_search(
    tl: TwoLevelIvf,
    query_vector,
    k: int,
    *,
    meta_probes: int | None = None,
    **search_kwargs,
) -> DataFrame:
    """Phase 0 (meta probe) -> restrict the centroid table -> the
    unchanged ivf_search plan.  meta_probes=None (or >= meta_k) probes
    every meta-cell, which is EXACTLY the single-level search."""
    mp = tl.meta_k if meta_probes is None else min(meta_probes, tl.meta_k)
    cells = _meta_probe(tl, query_vector, mp)
    keep = F.broadcast(
        tl.centroid_meta.filter(F.col("meta_id").isin(cells)).select("centroid_id")
    )
    cents = tl.base.centroids.join(keep, "centroid_id", "left_semi")
    return ivf_search(replace(tl.base, centroids=cents), query_vector, k, **search_kwargs)
