"""Measured OPQ-vs-PQ evidence on ANISOTROPIC vectors — the regime the
rotation exists for (tests/test_opq.py gates the MSE win; this records
the user-visible recall/MSE table for docs/SCALE.md).

Dataset: n x dim Gaussians mixed by a random matrix with singular
values spread 30:1 (linspace 3.0 -> 0.1), so variance is unevenly
distributed and correlated across PQ's storage-order subvector slices
— i.i.d. isotropic data (the engine-bench synthetic) shows parity by
construction, which is also worth knowing and recorded there.

Protocol: train PQ and OPQ on the same sample (m=8, k=16), encode the
corpus, and for 20 seeded queries compare ADC-top-`rerank` containment
recall@10 (how often the true top-10 survives to the exact re-rank —
the number that decides end-to-end exactness) at several rerank
budgets, plus quantization MSE. Prints a markdown table.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    from muopdb_spark.index.opq import (
        opq_adc_score,
        opq_encode,
        quantization_mse,
        train_opq,
    )
    from muopdb_spark.index.pq import pq_adc_score, pq_encode, train_pq
    from muopdb_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("opq-recall")
    spark.sparkContext.setLogLevel("ERROR")

    n, dim, seed = 4000, 64, 11
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(dim, dim)) * np.linspace(3.0, 0.1, dim)
    X = rng.normal(size=(n, dim)) @ A
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    ).localCheckpoint(eager=True)

    pq = train_pq(df, vec_col="embedding", num_subvectors=8, num_centers=16)
    opq = train_opq(
        df, vec_col="embedding", num_subvectors=8, num_centers=16,
        opq_iters=8,
    )
    coded_pq = pq_encode(df, pq, vec_col="embedding").localCheckpoint(True)
    coded_opq = opq_encode(df, opq, vec_col="embedding").localCheckpoint(True)

    queries = rng.normal(size=(20, dim)) @ A

    def containment(coded, score_fn, rerank):
        hits = []
        for q in queries:
            qv = [float(x) for x in q]
            d2 = ((X - q) ** 2).sum(axis=1)
            exact = set(np.argsort(d2, kind="stable")[:10].tolist())
            pool = {
                r["vec_id"]
                for r in coded.select(
                    "vec_id", score_fn(qv).alias("adc")
                ).orderBy(F.col("adc").asc(), F.col("vec_id").asc())
                .limit(rerank).collect()
            }
            hits.append(len(exact & pool) / 10.0)
        return float(np.mean(hits))

    print("| metric | PQ | OPQ |")
    print("|---|---|---|")
    print(f"| quantization MSE | {quantization_mse(X, pq):.1f} "
          f"| {quantization_mse(X, opq):.1f} |")
    for rr in (20, 50, 100):
        rp = containment(coded_pq, lambda q: pq_adc_score(q, pq), rr)
        ro = containment(coded_opq, lambda q: opq_adc_score(q, opq), rr)
        print(f"| containment recall@10, rerank={rr} | {rp:.2f} | {ro:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
