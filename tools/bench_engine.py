"""Engine-metric benchmarks mirroring the reference's harness intent
(BASELINE.md): ingest throughput, index build time, ANN query latency +
recall@10 vs exact, and compaction (vacuum) cost — on the reference's
own recall-dataset recipe (10 clusters x 1000 points x 128 dims,
centers at i*100, sigma 5, seed 42 — py/create_test_hdf5.py).

Writes docs/ENGINE_BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N_CLUSTERS, PER_CLUSTER, DIM = 10, 1000, 128


def main() -> None:
    from pyspark.sql import functions as F

    from muopdb_spark.catalog import Collection, CollectionConfig
    from muopdb_spark.index.ivf import build_ivf, ivf_search
    from muopdb_spark.operators.knn import knn
    from muopdb_spark.session import get_spark

    spark = get_spark("engine-bench")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, float] = {}

    # dataset: the reference's seeded recall recipe
    rng = np.random.default_rng(42)
    rows = []
    for c in range(N_CLUSTERS):
        pts = np.full(DIM, c * 100.0) + rng.normal(0, 5.0, size=(PER_CLUSTER, DIM))
        for j, p in enumerate(pts):
            rows.append((0, c * PER_CLUSTER + j, [float(x) for x in p]))
    df = spark.createDataFrame(rows, "user_id long, doc_id long, vector array<float>") \
        .repartition(32).persist()
    n = df.count()

    root = tempfile.mkdtemp()
    col = Collection.create(spark, root, CollectionConfig(name="bench", num_features=DIM))

    # 1. ingest throughput (WAL append)
    t0 = time.time()
    col.insert(df)
    results["ingest_rows_per_sec"] = round(n / (time.time() - t0), 1)

    # 2. flush (segment write)
    t0 = time.time()
    col.flush()
    results["flush_rows_per_sec"] = round(n / (time.time() - t0), 1)

    # 3. index build (KMeans + split + postings)
    t0 = time.time()
    idx = build_ivf(df, vec_col="vector", id_col="doc_id",
                    num_centroids=N_CLUSTERS, seed=42)
    idx.postings.count()  # materialize
    results["index_build_sec"] = round(time.time() - t0, 2)

    # 4. query latency + recall@10 vs exact (5 queries, probes=2)
    lat, rec = [], []
    for c in (0, 3, 5, 7, 9):
        q = (np.full(DIM, c * 100.0) + rng.normal(0, 5.0, DIM)).tolist()
        t0 = time.time()
        approx = [r["id"] for r in ivf_search(idx, q, 10, num_probes=2).collect()]
        lat.append(time.time() - t0)
        exact = [r["doc_id"] for r in knn(df, q, 10, vector_col="vector",
                                          id_col="doc_id").collect()]
        rec.append(len(set(exact) & set(approx)) / 10)
    results["ann_query_latency_sec"] = round(float(np.mean(lat)), 3)
    results["ann_recall_at_10"] = round(float(np.mean(rec)), 3)

    # 4b. SQ8 durable artifact: build (train + encode + packed persist)
    #     and serving latency from the reloaded artifact — the r6
    #     serving-path contract (train at flush, never at search)
    import os as _os

    from muopdb_spark.index.sq import sq_encode, sq_load, sq_save, sq_search, train_sq

    sq_path = _os.path.join(root, "sq_idx")
    t0 = time.time()
    cb = train_sq(df, vec_col="vector")
    sq_save(sq_encode(df, cb, vec_col="vector"), cb, sq_path,
            id_col="doc_id", vec_col="vector")
    results["sq_build_sec"] = round(time.time() - t0, 2)
    enc, cb2 = sq_load(spark, sq_path, id_col="doc_id", vec_col="vector")
    sq_lat = []
    for c in (0, 3, 5, 7, 9):
        q = (np.full(DIM, c * 100.0) + rng.normal(0, 5.0, DIM)).tolist()
        t0 = time.time()
        sq_search(enc, q, cb2, 10, id_col="doc_id", vec_col="vector",
                  rerank=50).collect()
        sq_lat.append(time.time() - t0)
    results["sq_query_latency_sec"] = round(float(np.mean(sq_lat)), 3)

    # 4c. per-user PQ (r7): multi-tenant build (per-user codebooks +
    #     salted cogroup encode) and serving latency — the quantizer
    #     that showed the r5 recall skew, now skew-free. Rerank is
    #     sized to the probed set (500 of ~2000 probed): this dataset's
    #     i.i.d. sigma-5 Gaussian clusters leave near-zero neighbor
    #     margin inside a cluster, so PQ-ADC candidate containment at
    #     small rerank is weak for ANY PQ geometry (measured: rerank
    #     50 -> 0.24, 200 -> 0.62, 500 -> 0.96 at m=8, k=256) — the
    #     standard rerank-fraction knob, not a per-user artifact.
    from muopdb_spark.index.multi_ivf import build_multi_ivf, multi_ivf_search

    t0 = time.time()
    pqu = build_multi_ivf(
        df.select("user_id", "doc_id", "vector"),
        num_centroids=N_CLUSTERS, quantizer="pq_user",
        pq_subvectors=8, pq_centers=256, seed=42,
    )
    pqu.postings.count()
    results["pq_user_build_sec"] = round(time.time() - t0, 2)
    pqu_lat, pqu_rec = [], []
    for c in (0, 3, 5, 7, 9):
        q = (np.full(DIM, c * 100.0) + rng.normal(0, 5.0, DIM)).tolist()
        t0 = time.time()
        approx = [r["id"] for r in multi_ivf_search(
            pqu, 0, q, 10, num_probes=2, rerank=500).collect()]
        pqu_lat.append(time.time() - t0)
        exact = [r["doc_id"] for r in knn(df, q, 10, vector_col="vector",
                                          id_col="doc_id").collect()]
        pqu_rec.append(len(set(exact) & set(approx)) / 10)
    results["pq_user_query_latency_sec"] = round(float(np.mean(pqu_lat)), 3)
    results["pq_user_recall_at_10_rerank500"] = round(float(np.mean(pqu_rec)), 3)

    # 4d. OPQ (r7): rotated-space PQ — same code bytes as PQ, recall
    #     per byte is the product. Same rerank-500 sizing rationale as
    #     4c (the synthetic clusters have near-zero neighbor margin).
    t0 = time.time()
    opq = build_multi_ivf(
        df.select("user_id", "doc_id", "vector"),
        num_centroids=N_CLUSTERS, quantizer="opq",
        pq_subvectors=8, pq_centers=256, seed=42,
    )
    opq.postings.count()
    results["opq_build_sec"] = round(time.time() - t0, 2)
    opq_lat, opq_rec = [], []
    for c in (0, 3, 5, 7, 9):
        q = (np.full(DIM, c * 100.0) + rng.normal(0, 5.0, DIM)).tolist()
        t0 = time.time()
        approx = [r["id"] for r in multi_ivf_search(
            opq, 0, q, 10, num_probes=2, rerank=500).collect()]
        opq_lat.append(time.time() - t0)
        exact = [r["doc_id"] for r in knn(df, q, 10, vector_col="vector",
                                          id_col="doc_id").collect()]
        opq_rec.append(len(set(exact) & set(approx)) / 10)
    results["opq_query_latency_sec"] = round(float(np.mean(opq_lat)), 3)
    results["opq_recall_at_10_rerank500"] = round(float(np.mean(opq_rec)), 3)

    # 4e. per-user OPQ (r8): per-tenant rotation+codebook through the
    #     pq_user shapes; same rerank-500 sizing rationale as 4c/4d.
    t0 = time.time()
    opqu = build_multi_ivf(
        df.select("user_id", "doc_id", "vector"),
        num_centroids=N_CLUSTERS, quantizer="opq_user",
        pq_subvectors=8, pq_centers=256, seed=42,
    )
    opqu.postings.count()
    results["opq_user_build_sec"] = round(time.time() - t0, 2)
    opqu_lat, opqu_rec = [], []
    for c in (0, 3, 5, 7, 9):
        q = (np.full(DIM, c * 100.0) + rng.normal(0, 5.0, DIM)).tolist()
        t0 = time.time()
        approx = [r["id"] for r in multi_ivf_search(
            opqu, 0, q, 10, num_probes=2, rerank=500).collect()]
        opqu_lat.append(time.time() - t0)
        exact = [r["doc_id"] for r in knn(df, q, 10, vector_col="vector",
                                          id_col="doc_id").collect()]
        opqu_rec.append(len(set(exact) & set(approx)) / 10)
    results["opq_user_query_latency_sec"] = round(float(np.mean(opqu_lat)), 3)
    results["opq_user_recall_at_10_rerank500"] = round(
        float(np.mean(opqu_rec)), 3)

    # 5. compaction: tombstone 10% then vacuum
    col.remove([0], list(range(0, n, 10)))
    t0 = time.time()
    col.vacuum()
    results["vacuum_sec_10pct_deleted"] = round(time.time() - t0, 2)

    results["n_rows"] = n
    results["dim"] = DIM
    print(json.dumps({"metric": "engine_benchmarks", **results}))

    import os

    os.makedirs("/root/repo/docs", exist_ok=True)
    with open("/root/repo/docs/ENGINE_BENCH.md", "w") as f:
        f.write(
            "# Engine benchmarks\n\n"
            "Generated by `python tools/bench_engine.py` on the reference's\n"
            f"seeded recall dataset ({N_CLUSTERS} clusters x {PER_CLUSTER} x {DIM}-dim,\n"
            "centers at i*100, sigma 5, seed 42 — py/create_test_hdf5.py recipe),\n"
            "local[32]. Mirrors BASELINE.md's four engine metrics (the\n"
            "reference ships Criterion harnesses but publishes no numbers).\n\n"
            "| metric | value |\n|---|---|\n"
            + "\n".join(f"| {k} | {v} |" for k, v in results.items())
            + "\n"
        )


if __name__ == "__main__":
    main()
