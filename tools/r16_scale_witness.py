"""r16 scale witnesses for the round's two plan changes:

1. t12_vocab_topk promoted to the single-scan vocab_tables plan — time
   it at sf0.1 and synthetic sf1.0 (10 disjoint-token-space replicas,
   the scale_sweep_ext synthesis rule) to pin the 10x decade step of
   the NEW plan, alongside the two-table form at both scales so the
   crossover claim (single-scan wins as the scan share grows) is
   measured, not asserted.

2. SemDeDup's new two-level assignment stage — the flat stage is
   n x k; the tier is n x (meta_k + k/meta_k expected). The fixture's
   k=8 can't witness that, so this times flat vs two-level assignment
   at k=1024 synthetic centroids over the sf0.1 embeddings (5k x 64)
   and checks the two agree on assignment when every cell is probed.

Best-of-3 after a compile rep; prints a markdown table for
docs/SCALING.md. Correctness-neutral: everything here is timing over
already-pinned-equivalent paths.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from muopdb_spark.session import get_spark  # noqa: E402
from tools.scale_sweep_ext import BASE, WORK, synthesize  # noqa: E402


def _best(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main() -> None:
    spark = get_spark("r16-scale-witness")
    spark.sparkContext.setLogLevel("ERROR")
    sf10 = os.path.join(WORK, "sf1.0")
    synthesize(spark, 10, sf10)

    from muopdb_spark.operators.vocab import (
        pair_vocab,
        token_vocab,
        vocab_tables,
    )

    def single(docs):
        return lambda: vocab_tables(
            docs, token_top_k=150, pair_top_k=50
        ).orderBy("kind", "rank").collect()

    def two(docs):
        def run():
            t = token_vocab(docs, top_k=150).select(
                F.lit("token").alias("kind"),
                F.col("token").alias("term"), "count", "rank")
            p = pair_vocab(docs, top_k=50).select(
                F.lit("pair").alias("kind"),
                F.concat_ws(" ", "left", "right").alias("term"),
                "count", "rank")
            t.unionByName(p).orderBy("kind", "rank").collect()
        return run

    print("| plan | sf0.1 (s) | sf1.0 (s) | 10x step |")
    print("|---|---|---|---|")
    rows = {}
    for name, mk in (("t12 single-scan (promoted)", single),
                     ("t12 two-table (parked)", two)):
        docs01 = spark.read.parquet(f"{BASE}/documents.parquet")
        docs10 = spark.read.parquet(f"{sf10}/documents.parquet")
        mk(docs01.limit(50))()  # compile
        a = _best(mk(docs01))
        b = _best(mk(docs10))
        rows[name] = (a, b)
        print(f"| {name} | {a:.2f} | {b:.2f} | {b / a:.2f}x |")

    # --- semdedup assignment: flat n x k vs two-level at k=1024 ---
    from muopdb_spark.operators.semdedup import (
        cluster_assignments,
        cluster_assignments_two_level,
    )

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet").localCheckpoint(
        eager=True
    )
    rng = np.random.default_rng(42)
    k = 1024
    cents = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=64)]) for i in range(k)],
        "cluster_id int, centroid array<double>",
    ).localCheckpoint(eager=True)

    flat = lambda: cluster_assignments(emb, cents).select(
        F.count("*"), F.sum("cluster_id")).collect()
    tier = lambda: cluster_assignments_two_level(
        emb, cents, meta_k=32, meta_probes=4
    ).select(F.count("*"), F.sum("cluster_id")).collect()
    flat()
    tier()  # compile both
    tf, tt = _best(flat), _best(tier)
    print()
    print(f"| assignment stage, k={k} (sf0.1 embeddings) | s |")
    print("|---|---|")
    print(f"| flat n x k | {tf:.2f} |")
    print(f"| two-level meta_k=32, probes=4 | {tt:.2f} |")
    # agreement under full probe at this k (spot re-pin at scale)
    a = {(r["id"], r["cluster_id"]) for r in cluster_assignments(
        emb.limit(500), cents).collect()}
    b = {(r["id"], r["cluster_id"]) for r in cluster_assignments_two_level(
        emb.limit(500), cents, meta_k=32, meta_probes=None).collect()}
    print(f"full-probe agreement at k={k}: {'EXACT' if a == b else 'DIVERGED'}")
    spark.stop()


if __name__ == "__main__":
    main()
