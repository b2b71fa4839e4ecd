"""Stretch experiment (r4 verdict #8): recall skew of the SHARED
per-collection PQ codebook when one user's vectors are
off-distribution.

multi_ivf trains ONE codebook across users (matching the reference's
per-collection quantizer, rs/index/src/collection/mod.rs:145-149). A
user whose vectors live far from the codebook's training mass gets
coarser quantization cells, so PQ-ADC candidate ordering degrades for
that user only. This script measures it:

  user 0 ("in"):  2,000 vectors ~ N(0, 1)^16         (dominates training)
  user 1 ("off"): 2,000 vectors ~ N(4, 0.25)^16      (shifted cluster)

Per user, 20 queries drawn from that user's own distribution; recall@10
of PQ-ADC (full probe, no rerank) and of ADC + exact rerank of top-40,
both against exact search over the same index. Full probe isolates
quantization error from probe selection.

Writes one JSON line; the measured numbers are recorded in
docs/SCALE.md (multi-user section).
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from muopdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    from muopdb_spark.index.multi_ivf import (
        build_multi_ivf,
        multi_ivf_search,
    )

    spark = get_spark("pq-recall-skew")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(7)
    dim, n_per_user, k, n_queries = 16, 2000, 10, 20

    in_vecs = rng.normal(0.0, 1.0, (n_per_user, dim))
    off_vecs = rng.normal(4.0, 0.5, (n_per_user, dim))
    rows = [
        (0, i, [float(x) for x in in_vecs[i]]) for i in range(n_per_user)
    ] + [
        (1, n_per_user + i, [float(x) for x in off_vecs[i]])
        for i in range(n_per_user)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, doc_id long, vector array<double>"
    )
    num_centroids = 8
    idx = build_multi_ivf(
        df, num_centroids=num_centroids, quantizer="pq",
        pq_subvectors=4, pq_centers=16, seed=42,
    )
    exact_idx = build_multi_ivf(df, num_centroids=num_centroids, seed=42)

    full_probe = dict(num_probes=num_centroids, centroid_distance_ratio=None)
    out: dict = {"metric": "pq_recall_skew", "users": {}}
    for user, vecs in ((0, in_vecs), (1, off_vecs)):
        qidx = rng.choice(n_per_user, n_queries, replace=False)
        recalls, rerank_recalls = [], []
        for qi in qidx:
            q = [float(x) for x in vecs[qi]]
            truth = {
                r["id"] for r in
                multi_ivf_search(exact_idx, user, q, k, **full_probe).collect()
            }
            adc = {
                r["id"] for r in
                multi_ivf_search(idx, user, q, k, **full_probe).collect()
            }
            rr = {
                r["id"] for r in
                multi_ivf_search(
                    idx, user, q, k, rerank=4 * k, **full_probe
                ).collect()
            }
            recalls.append(len(adc & truth) / k)
            rerank_recalls.append(len(rr & truth) / k)
        out["users"][user] = {
            "adc_recall_at_10": round(float(np.mean(recalls)), 3),
            "adc_rerank40_recall_at_10": round(
                float(np.mean(rerank_recalls)), 3
            ),
        }
    out["skew_adc"] = round(
        out["users"][0]["adc_recall_at_10"]
        - out["users"][1]["adc_recall_at_10"], 3
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
