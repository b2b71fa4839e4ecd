"""Run the bench prefix (queries before d3, best-of-2 each) then time d3,
to reproduce the in-bench 14s regression."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from muopdb_spark.session import get_spark

spark = get_spark("repro-d3-ctx")
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry_mod
from bench import BENCH_QUERIES

qs = {**entry_mod.queries(), **entry_mod.extra_queries()}

qs["v1_knn_l2"](spark, sf_dir).collect()
from pyspark.sql import functions as F


@F.pandas_udf("long")
def _warm(s):
    return s


spark.range(spark.sparkContext.defaultParallelism * 4).select(_warm(F.col("id"))).collect()

for name in BENCH_QUERIES:
    reps = []
    for _ in range(2):
        t0 = time.time()
        qs[name](spark, sf_dir).collect()
        reps.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    print(f"{name}: {reps}", flush=True)
    if name == "d3_dedup_minhash_lsh":
        break

spark.stop()
