"""Reproduce a bench-session-only slowdown (the r7 d5 case) INSIDE a
faithful bench.py replica, with per-rep telemetry.

r7 context: d5_dedup_embedding_cosine benched 4.25 s (all three reps
4.2-5.2 s) in the 66-query driver bench while its isolated floor —
measured the same session via tools/repro_interference.py — was
0.911 s with flat GC. So the operator is fine and the SESSION is the
variable. This tool replays bench.py's exact protocol (same session
conf, same warm-up, same artifact pre-build list, same sf0.001 smoke
compile of every benchmark query, same clearCache-between-reps timed
loop) but records, around every timed rep:

  - wall seconds
  - JVM GC time/count delta and heap used before/after (JMX)
  - storage memory used (block manager)
  - pyspark.daemon worker process count and total RSS (via /proc)

and supports bisection knobs:

  D5_POS=first|last|only   move the suspect query's timed slot
  SKIP_PREBUILD=1          skip the artifact pre-build list
  SKIP_SMOKE=1             skip the sf0.001 compile pass
  QUERY=<name>             suspect query (default d5_dedup_embedding_cosine)
  REPS=<n>                 timed reps for the suspect (default 3)

Usage:
    python tools/repro_bench_session.py                  # full replica
    D5_POS=first python tools/repro_bench_session.py     # suspect first
    SKIP_PREBUILD=1 python tools/repro_bench_session.py

Output: one JSON line per timed query (suspect gets full telemetry,
others wall-only) + a SUMMARY line. Findings land in
docs/BENCH_STABILITY.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def jvm_stats(spark):
    """(gc_ms_total, gc_count_total, heap_used_mb, storage_used_mb)."""
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    gc_ms = 0
    gc_n = 0
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        b = it.next()
        gc_ms += max(b.getCollectionTime(), 0)
        gc_n += max(b.getCollectionCount(), 0)
    heap = mf.getMemoryMXBean().getHeapMemoryUsage().getUsed() // (1 << 20)
    try:
        storage = (
            spark.sparkContext._jsc.sc()
            .env()
            .blockManager()
            .memoryStore()
            .memoryUsed()
            // (1 << 20)
        )
    except Exception:
        storage = -1
    return gc_ms, gc_n, heap, storage


def python_workers():
    """(count, total_rss_mb) of pyspark daemon/worker processes."""
    n, rss_kb = 0, 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace")
            if "pyspark.daemon" not in cmd and "pyspark.worker" not in cmd:
                continue
            n += 1
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        rss_kb += int(line.split()[1])
                        break
        except OSError:
            continue
    return n, rss_kb // 1024


def main() -> None:
    suspect = os.environ.get("QUERY", "d5_dedup_embedding_cosine")
    pos = os.environ.get("D5_POS", "normal")
    reps_n = int(os.environ.get("REPS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from muopdb_spark.session import get_spark

    spark = get_spark("repro-bench-session")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from bench import BENCH_QUERIES

    qs = {**entry_mod.queries(), **entry_mod.extra_queries()}

    order = [n for n in BENCH_QUERIES if n != suspect]
    if pos == "first":
        order = [suspect] + order
    elif pos == "only":
        order = [suspect]
    elif pos == "last":
        order = order + [suspect]
    else:
        order = list(BENCH_QUERIES)

    # --- bench.py preamble, verbatim protocol ---
    qs["v1_knn_l2"](spark, sf_dir).collect()
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s):
        return s

    spark.range(spark.sparkContext.defaultParallelism * 4).select(
        _warm(F.col("id"))
    ).collect()

    if not os.environ.get("SKIP_PREBUILD"):
        entry_mod._ivf_index(spark, sf_dir)
        entry_mod._ivf_index(spark, sf_dir, pq=True)
        entry_mod._multi_ivf_index(spark, sf_dir)
        entry_mod._lsh_index(spark, sf_dir)
        entry_mod._bm25_docs_and_stats(spark, sf_dir)
        entry_mod._minhash_corpus_index(spark, sf_dir)
        entry_mod._minhash_full_sigs(spark, sf_dir)
        entry_mod._lm_index(spark, sf_dir)
        entry_mod._ngram_ranked_index(spark, sf_dir)
        entry_mod._bench_grams(spark, sf_dir)
        entry_mod._semdedup_centroids(spark, sf_dir)
        entry_mod._sq_index(spark, sf_dir)
        entry_mod._quality_model(spark, sf_dir)
        entry_mod._two_level_index(spark, sf_dir)
        entry_mod._ivf_index(spark, sf_dir, quantizer="sq")
        entry_mod._dup_span_stats(spark, sf_dir)
        entry_mod._dsir_weights_table(spark, sf_dir)
        entry_mod._opq_index(spark, sf_dir)
        entry_mod._multi_ivf_opq_user_index(spark, sf_dir)

    if not os.environ.get("SKIP_SMOKE"):
        for name in order:
            qs[name](spark, entry_mod.SF_SMOKE).collect()
            spark.catalog.clearCache()

    # --- timed loop, instrumented ---
    results = []
    for name in order:
        n_reps = reps_n if name == suspect else 2
        reps = []
        for _ in range(n_reps):
            g0, c0, h0, s0 = jvm_stats(spark)
            w0, r0 = python_workers()
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            wall = round(time.time() - t0, 3)
            g1, c1, h1, s1 = jvm_stats(spark)
            w1, r1 = python_workers()
            reps.append(
                {
                    "wall_s": wall,
                    "gc_ms": g1 - g0,
                    "gc_n": c1 - c0,
                    "heap_mb": [h0, h1],
                    "storage_mb": [s0, s1],
                    "pyworkers": [w0, w1],
                    "pyworker_rss_mb": [r0, r1],
                }
            )
            spark.catalog.clearCache()
        best = min(r["wall_s"] for r in reps)
        rec = {"query": name, "best_s": best}
        if name == suspect:
            rec["reps"] = reps
        else:
            rec["walls"] = [r["wall_s"] for r in reps]
        results.append(rec)
        print(json.dumps(rec), flush=True)

    suspect_best = next(
        (r["best_s"] for r in results if r["query"] == suspect), None
    )
    print(
        json.dumps(
            {
                "SUMMARY": suspect,
                "pos": pos,
                "skip_prebuild": bool(os.environ.get("SKIP_PREBUILD")),
                "skip_smoke": bool(os.environ.get("SKIP_SMOKE")),
                "suspect_best_s": suspect_best,
                "total_s": round(sum(r["best_s"] for r in results), 2),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
