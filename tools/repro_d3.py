"""Isolated reproduction of the d3_dedup_minhash_lsh bench regression.

Runs q_dedup_minhash_lsh at sf0.1 exactly as bench.py does (warm-up,
best-of-2 with clearCache between reps) and prints per-rep timings.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from muopdb_spark.session import get_spark

spark = get_spark("repro-d3")
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry_mod

qs = {**entry_mod.queries(), **entry_mod.extra_queries()}

# same warm-up as bench.py
qs["v1_knn_l2"](spark, sf_dir).collect()
from pyspark.sql import functions as F


@F.pandas_udf("long")
def _warm(s):
    return s


spark.range(spark.sparkContext.defaultParallelism * 4).select(_warm(F.col("id"))).collect()

reps = []
for i in range(3):
    t0 = time.time()
    n = len(qs[sys.argv[1] if len(sys.argv) > 1 else "d3_dedup_minhash_lsh"](spark, sf_dir).collect())
    dt = time.time() - t0
    reps.append(round(dt, 3))
    print(f"rep{i}: {dt:.3f}s rows={n}", flush=True)
    spark.catalog.clearCache()

print("reps:", reps)
spark.stop()
