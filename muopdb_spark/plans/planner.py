"""Vector-query planning: choose the physical strategy for a top-k
vector search the way the reference's collection wiring does
(BoxedCollection monomorphizes quantizer/index per collection,
rs/index/src/collection/mod.rs:145-149) — but as an explicit, explainable
planner instead of compile-time generics.

This is SURVEY §4.1's "needs custom work" item #3: Catalyst cannot know
that `ORDER BY l2(vec, q) LIMIT k` is answerable by a two-phase
IVF plan; choosing it is an engine-level decision:

  strategy          when                                     cost shape
  ----------------  ---------------------------------------  -----------------
  exact             no index, or corpus below threshold,     one full scan,
                    or probes would cover most centroids     partial top-k
  ivf               IVF index present                        |probed|/|cents|
                                                             of the corpus
  pq                PQ codebook present and dim large        full scan of m-byte
                                                             codes (32x smaller
                                                             I/O), ADC scoring

Exact is always the fallback AND the correctness oracle; the planner
returns the decision + rationale so callers (and tests) can inspect it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame


@dataclass
class KnnPlan:
    strategy: str          # exact | ivf | pq
    rationale: str
    df: DataFrame          # the compiled query (lazy)


def plan_knn(
    df: DataFrame,
    query_vector: Sequence[float],
    k: int,
    *,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "l2",
    ivf_index=None,
    pq_codebook=None,
    pq_encoded: DataFrame | None = None,
    num_probes: int | None = None,
    centroid_distance_ratio: float | None = 0.1,
    exact_threshold_rows: int | None = 10_000,
    approx_row_count: int | None = None,
    pre_filter=None,
) -> KnnPlan:
    """Pick and compile the top-k strategy. `approx_row_count` lets the
    caller pass a known cardinality (catalog stats) so planning itself
    never triggers a count job; if absent and a threshold is set, a
    count is taken once."""
    from muopdb_spark.operators.knn import knn

    n = approx_row_count
    if n is None and exact_threshold_rows is not None and (ivf_index or pq_codebook):
        n = df.count()

    # small corpus: scan wins — probing overhead isn't worth it
    if (ivf_index is None and pq_codebook is None) or (
        n is not None and exact_threshold_rows is not None and n <= exact_threshold_rows
    ):
        why = (
            "no index available" if ivf_index is None and pq_codebook is None
            else f"corpus {n} rows <= exact threshold {exact_threshold_rows}"
        )
        out = knn(df, query_vector, k, vector_col=vector_col, id_col=id_col,
                  metric=metric, pre_filter=pre_filter)
        return KnnPlan("exact", why, out)

    if ivf_index is not None:
        from muopdb_spark.index.ivf import ivf_search

        probes = num_probes or k
        n_cents = ivf_index.centroids.count()
        if probes >= n_cents:
            why = f"probes {probes} >= centroids {n_cents}: full-probe IVF (exact)"
        else:
            why = f"IVF index: scan ~{probes}/{n_cents} of the corpus"
        out = ivf_search(ivf_index, query_vector, k, num_probes=probes,
                         centroid_distance_ratio=centroid_distance_ratio,
                         pre_filter=pre_filter)
        return KnnPlan("ivf", why, out)

    from muopdb_spark.index.pq import pq_encode, pq_search

    enc = pq_encoded if pq_encoded is not None else pq_encode(df, pq_codebook, vec_col=vector_col)
    out = pq_search(enc, query_vector, pq_codebook, k, id_col=id_col)
    return KnnPlan("pq", "PQ codebook: ADC over compressed codes", out)
