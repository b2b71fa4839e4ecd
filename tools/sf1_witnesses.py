"""sf1.0 spot-run for the SHUFFLE-HEAVY scale witnesses (r8 verdict ask,
executed r10): t15 line_dedup (distinct-line exchange + doc reassembly
shuffle) and smp7 soft_dedup_weights (corpus-wide gram-df shuffle +
join-back). The r8 spot-run covered only artifact-served/cheap queries
(d9/smp6/v24); these two are the ones whose exchanges actually grow
with the corpus, so they are the honest 3-decade witnesses.

Synthetic sf1.0 = 10 disjoint-token-space replicas of sf0.1 (the
scale_sweep_ext synthesis rule — near-dup/boilerplate structure grows
linearly like a real corpus instead of multiplying cross-replica
collisions). Best-of-2 after an sf0.001 precompile rep.

Consumption: full-computation aggregates (count + sums over every
output column) rather than .collect() — t15's output carries the
reassembled text_clean (~corpus-sized), and a GB-scale driver fetch
would time the single-threaded transfer, not the distributed work the
witness is about. The aggregate forces every shuffle and the complete
string reassembly on the executors.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.scale_sweep_ext import BASE, WORK, synthesize  # noqa: E402


def _consume_t15(spark, sf_dir):
    from muopdb_spark.operators.dedup import line_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        line_dedup(docs)
        .agg(
            F.count("*"),
            F.sum(F.length("text_clean")),
            F.sum("n_lines"),
            F.sum("kept_lines"),
        )
        .collect()
    )


def _consume_smp7(spark, sf_dir):
    from muopdb_spark.operators.dedup import soft_dedup_weights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        soft_dedup_weights(docs, n=3)
        .agg(F.count("*"), F.sum("n_grams"), F.sum("soft_weight"))
        .collect()
    )


WITNESSES = {
    "t15_line_dedup (agg-consumed)": _consume_t15,
    "smp7_soft_dedup_weights (agg-consumed)": _consume_smp7,
}


def main() -> None:
    from muopdb_spark.session import get_spark

    spark = get_spark("sf1-witnesses")
    spark.sparkContext.setLogLevel("ERROR")

    sf1 = os.path.join(WORK, "sf1.0")
    synthesize(spark, 10, sf1)
    dirs = [("sf0.1", BASE), ("sf1.0", sf1)]

    times: dict[str, dict[str, float]] = {}
    for name, fn in WITNESSES.items():
        fn(spark, "/root/testdata/sf0.001")  # precompile
        times[name] = {}
        for label, d in dirs:
            best = None
            for _ in range(2):
                t0 = time.monotonic()
                fn(spark, d)
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            times[name][label] = round(best, 2)
            print(f"{name} @ {label}: {times[name][label]:.2f}s", flush=True)

    print("\n| query | sf0.1 (s) | sf1.0 (s) | 10x step |")
    print("|---|---|---|---|")
    for name, t in times.items():
        s1, s10 = t["sf0.1"], t["sf1.0"]
        print(f"| {name} | {s1:.2f} | {s10:.2f} "
              f"| {s10 / max(s1, 1e-9):.1f}x |")
    print()
    print(json.dumps(times))
    spark.stop()


if __name__ == "__main__":
    main()
