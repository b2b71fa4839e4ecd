"""Stretch experiment (r4 verdict #8): recall skew of the SHARED
per-collection PQ codebook when a minority user's vectors are
off-distribution.

multi_ivf trains ONE codebook across users (matching the reference's
per-collection quantizer, rs/index/src/collection/mod.rs:145-149).
K-means center allocation follows training mass, so a minority user
whose vectors live away from the dominant mass gets coarser
quantization cells, degrading PQ-ADC candidate ordering for that user
only:

  user 0 (dominant, in-dist): 4,000 vectors ~ N(0, 1)^16
  user 1 (minority, off-dist):  250 vectors ~ N(4, 0.25)^16

Per user, 12 queries from that user's own distribution; recall@10 of
PQ-ADC (full probe, no rerank) and of ADC + exact rerank of top-40,
both against exact search over the same index. Full probe isolates
quantization error from probe selection.

Measured (seed 7, pq_subvectors=8, pq_centers=32, 8 centroids):
  user 0: adc 0.658, rerank40 0.975
  user 1: adc 0.475, rerank40 0.883
The finding and its mitigations are documented in docs/SCALE.md
(multi-user section).
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
    dim, k, n_queries = 16, 10, 12
    n_dom, n_min = 4000, 250

    dom = rng.normal(0.0, 1.0, (n_dom, dim))
    off = rng.normal(4.0, 0.5, (n_min, dim))
    rows = [
        (0, i, [float(x) for x in dom[i]]) for i in range(n_dom)
    ] + [
        (1, n_dom + i, [float(x) for x in off[i]]) for i in range(n_min)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, doc_id long, vector array<double>"
    )
    num_centroids = 8
    idx = build_multi_ivf(
        df, num_centroids=num_centroids, quantizer="pq",
        pq_subvectors=8, pq_centers=32, seed=42,
    )
    # r6 mitigation under test: PER-USER SQ codebooks (each tenant
    # quantizes in its own min/max range — index/sq.train_sq_per_user)
    sq_idx = build_multi_ivf(
        df, num_centroids=num_centroids, quantizer="sq", seed=42,
    )
    # r7 mitigation on the quantizer that SHOWED the skew: PER-USER PQ
    # codebooks (index/pq.train_pq_per_user, quantizer="pq_user")
    pqu_idx = build_multi_ivf(
        df, num_centroids=num_centroids, quantizer="pq_user",
        pq_subvectors=8, pq_centers=32, seed=42,
    )
    # r8 quantizers, swept r10 (the r8 verdict's OPQ-twin ask): shared
    # OPQ (one learned rotation + one PQ codebook across users — does
    # the rotation help or hurt the off-distribution minority?) and
    # PER-USER OPQ (each tenant gets its own rotation + codebook)
    opq_idx = build_multi_ivf(
        df, num_centroids=num_centroids, quantizer="opq",
        pq_subvectors=8, pq_centers=32, seed=42,
    )
    opqu_idx = build_multi_ivf(
        df, num_centroids=num_centroids, quantizer="opq_user",
        pq_subvectors=8, pq_centers=32, seed=42,
    )
    exact_idx = build_multi_ivf(df, num_centroids=num_centroids, seed=42)

    full_probe = dict(num_probes=num_centroids, centroid_distance_ratio=None)
    out: dict = {"metric": "pq_recall_skew", "users": {}}
    for user, vecs, n in ((0, dom, n_dom), (1, off, n_min)):
        qidx = rng.choice(n, n_queries, replace=False)
        recalls, rerank_recalls, sq_recalls = [], [], []
        pqu_recalls, pqu_rerank_recalls = [], []
        opq_recalls, opqu_recalls, opqu_rerank_recalls = [], [], []
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
            sq = {
                r["id"] for r in
                multi_ivf_search(sq_idx, user, q, k, **full_probe).collect()
            }
            pqu = {
                r["id"] for r in
                multi_ivf_search(pqu_idx, user, q, k, **full_probe).collect()
            }
            pqu_rr = {
                r["id"] for r in
                multi_ivf_search(
                    pqu_idx, user, q, k, rerank=4 * k, **full_probe
                ).collect()
            }
            opq = {
                r["id"] for r in
                multi_ivf_search(opq_idx, user, q, k, **full_probe).collect()
            }
            opqu = {
                r["id"] for r in
                multi_ivf_search(opqu_idx, user, q, k, **full_probe).collect()
            }
            opqu_rr = {
                r["id"] for r in
                multi_ivf_search(
                    opqu_idx, user, q, k, rerank=4 * k, **full_probe
                ).collect()
            }
            recalls.append(len(adc & truth) / k)
            rerank_recalls.append(len(rr & truth) / k)
            sq_recalls.append(len(sq & truth) / k)
            pqu_recalls.append(len(pqu & truth) / k)
            pqu_rerank_recalls.append(len(pqu_rr & truth) / k)
            opq_recalls.append(len(opq & truth) / k)
            opqu_recalls.append(len(opqu & truth) / k)
            opqu_rerank_recalls.append(len(opqu_rr & truth) / k)
        out["users"][user] = {
            "adc_recall_at_10": round(float(np.mean(recalls)), 3),
            "adc_rerank40_recall_at_10": round(
                float(np.mean(rerank_recalls)), 3
            ),
            "per_user_sq_recall_at_10": round(float(np.mean(sq_recalls)), 3),
            "per_user_pq_adc_recall_at_10": round(
                float(np.mean(pqu_recalls)), 3
            ),
            "per_user_pq_rerank40_recall_at_10": round(
                float(np.mean(pqu_rerank_recalls)), 3
            ),
            "shared_opq_adc_recall_at_10": round(
                float(np.mean(opq_recalls)), 3
            ),
            "per_user_opq_adc_recall_at_10": round(
                float(np.mean(opqu_recalls)), 3
            ),
            "per_user_opq_rerank40_recall_at_10": round(
                float(np.mean(opqu_rerank_recalls)), 3
            ),
        }
    out["skew_adc"] = round(
        out["users"][0]["adc_recall_at_10"]
        - out["users"][1]["adc_recall_at_10"], 3
    )
    out["skew_per_user_sq"] = round(
        out["users"][0]["per_user_sq_recall_at_10"]
        - out["users"][1]["per_user_sq_recall_at_10"], 3
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
