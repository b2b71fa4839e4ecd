"""Isolate the r5 bench-interference cluster (m1 2.8x its r01 baseline,
second-rep spikes on v1/v11/h3 with unchanged code).

Runs a configurable query list in ONE session the way bench.py does
(smoke-SF compile warm-up, artifact pre-build, clearCache between
reps), but with per-rep JVM telemetry: GC time delta, GC count delta,
and heap-used before/after — so a slow rep can be attributed to a GC
pause vs a slow plan vs box contention.

Usage:
    python tools/repro_interference.py m1_media_bytes v1_knn_l2
    SPARK_GRAFT_DRIVER_MEM=48g python tools/repro_interference.py ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def jvm_stats(spark):
    """(gc_ms_total, gc_count_total, heap_used_mb) via JMX beans."""
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
    return gc_ms, gc_n, heap


def main() -> None:
    names = sys.argv[1:] or ["m1_media_bytes", "v1_knn_l2"]
    reps = int(os.environ.get("REPS", "6"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from muopdb_spark.session import get_spark

    spark = get_spark("repro-interference")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = {**entry_mod.queries(), **entry_mod.extra_queries()}

    # same pre-conditions as bench.py
    qs["v1_knn_l2"](spark, sf_dir).collect()
    entry_mod._ivf_index(spark, sf_dir)
    entry_mod._ivf_index(spark, sf_dir, pq=True)
    entry_mod._lsh_index(spark, sf_dir)
    entry_mod._sq_index(spark, sf_dir)
    for name in names:
        qs[name](spark, entry_mod.SF_SMOKE).collect()
        spark.catalog.clearCache()

    out = {}
    for name in names:
        rows = []
        for _ in range(reps):
            g0, n0, h0 = jvm_stats(spark)
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            wall = round(time.time() - t0, 3)
            g1, n1, h1 = jvm_stats(spark)
            rows.append(
                {
                    "wall_s": wall,
                    "gc_ms": g1 - g0,
                    "gc_n": n1 - n0,
                    "heap_mb_before": h0,
                    "heap_mb_after": h1,
                }
            )
            spark.catalog.clearCache()
        out[name] = rows
        floor = min(r["wall_s"] for r in rows)
        print(f"{name}: floor={floor}s reps={[r['wall_s'] for r in rows]} "
              f"gc_ms={[r['gc_ms'] for r in rows]}", flush=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
