"""End-to-end walkthrough of the engine: create a collection, stream
documents in, flush, hybrid-search, delete, compact, and query through
the per-user ANN index.

Run: python examples/end_to_end.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from muopdb_spark.catalog import Collection, CollectionConfig  # noqa: E402
from muopdb_spark.index.multi_ivf import build_multi_ivf, multi_ivf_search_users  # noqa: E402
from muopdb_spark.session import get_spark  # noqa: E402
from muopdb_spark.streaming import stream_insert  # noqa: E402


def main() -> None:
    spark = get_spark("end-to-end-demo")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp()

    # 1. DDL — schema + index config persisted as the catalog entry
    config = CollectionConfig(
        name="memories", num_features=4,
        attribute_schema={"title": "text", "category": "keyword"},
        num_centroids=4,
    )
    col = Collection.create(spark, root, config)
    print("created collection at", col.root)

    # 2. streaming ingest (micro-batch = WAL group commit)
    src = os.path.join(root, "incoming")
    os.makedirs(src)
    docs = [
        (0, 1, [1.0, 0.0, 0.0, 0.0], "running fast", "news"),
        (0, 2, [0.0, 1.0, 0.0, 0.0], "slow snail", "blog"),
        (0, 3, [0.9, 0.1, 0.0, 0.0], "running shoes", "news"),
        (1, 4, [0.0, 0.0, 1.0, 0.0], "alpha beta", "news"),
        (1, 5, [0.0, 0.0, 0.9, 0.1], "gamma delta", "blog"),
    ]
    with open(os.path.join(src, "batch.jsonl"), "w") as f:
        for u, d, v, t, c in docs:
            f.write(json.dumps({"user_id": u, "doc_id": d, "vector": v,
                                "title": t, "category": c}) + "\n")
    stream = spark.readStream.schema(
        "user_id long, doc_id long, vector array<float>, title string, category string"
    ).json(src)
    stream_insert(col, stream, os.path.join(root, "ckpt")).awaitTermination(120)

    # 3. flush — docs become searchable (read-your-writes boundary)
    seg = col.flush()
    print("flushed", seg)

    # 4. hybrid search: vector top-k with a term pre-filter (stemmed)
    hits = col.search([0], [1.0, 0.0, 0.0, 0.0], 2)
    print("knn user 0:", [(r["doc_id"], round(r["score"], 3)) for r in hits.collect()])
    terms = col.term_search([0, 1], {"contains": {"path": "title", "value": "runs"}}, 10)
    print("term 'runs' (stems to run):", [r["doc_id"] for r in terms.collect()])

    # 5. delete + compact
    col.remove([0], [2])
    print("after remove:", [r["doc_id"] for r in col.search([0], [0.0, 1.0, 0.0, 0.0], 5).collect()])
    print("auto_optimize:", col.auto_optimize())

    # 6. per-user ANN index over the flushed docs
    idx = build_multi_ivf(col.docs(), user_col="user_id", vec_col="vector",
                          id_col="doc_id", num_centroids=2, seed=42)
    out = multi_ivf_search_users(idx, [0, 1], [0.0, 0.0, 1.0, 0.0], 3,
                                 num_probes=2, centroid_distance_ratio=None)
    print("multi-user ANN:", [(r["user_id"], r["id"], round(r["score"], 3))
                              for r in out.collect()])

    # 7. offline HDF5 ingest — the reference index_writer's exact
    #    pipeline (read vectors from an HDF5 file -> build the index ->
    #    search), via the pure-Python distributed reader. Uses the
    #    reference's own h5py-written fixture when present, else a
    #    file written by our spec writer.
    from muopdb_spark.index.ivf import build_ivf, ivf_search
    from muopdb_spark.sources.hdf5 import (
        read_hdf5_vectors,
        write_hdf5_vectors,
    )

    ref = "/root/reference/rs/index_writer/resources/test.hdf5"
    if os.path.exists(ref):
        h5_path, ds = ref, "test"
    else:
        h5_path = os.path.join(tempfile.mkdtemp(prefix="muopdb_h5_"),
                               "vectors.hdf5")
        ds = "train"
        write_hdf5_vectors(
            spark.range(200).select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(1), F.lit(8)),
                    lambda i: (F.col("id") % 10 + i).cast("float"),
                ).alias("embedding"),
            ),
            h5_path, dataset=ds,
        )
    vecs = read_hdf5_vectors(spark, h5_path, dataset=ds, rows_per_task=256)
    n, dim = vecs.count(), len(vecs.first()["embedding"])
    h5_idx = build_ivf(vecs, num_centroids=8, seed=42)
    q = vecs.filter("vec_id = 0").first()["embedding"]
    hits = ivf_search(h5_idx, list(q), k=3, num_probes=8)
    print(f"hdf5 ingest: {n}x{dim} from {os.path.basename(h5_path)};",
          "top-3 for row 0:",
          [(r["id"], round(r["score"], 3)) for r in hits.collect()])

    # 7b. chunked+gzip HDF5 round trip — public vector corpora usually
    #     ship h5py-chunked/compressed; re-export the ingested vectors
    #     chunked (v1 B-tree index + shuffle+deflate filters) and prove
    #     the re-read is bit-identical to the contiguous read.
    ch_path = os.path.join(tempfile.mkdtemp(prefix="muopdb_h5c_"),
                           "vectors_chunked.hdf5")
    write_hdf5_vectors(
        vecs, ch_path, dataset="train",
        chunks=(128, max(1, dim // 2)), compression="gzip", shuffle=True,
    )
    back = read_hdf5_vectors(spark, ch_path, dataset="train",
                             rows_per_task=100)
    mism = (
        back.withColumnRenamed("embedding", "e2")
        .join(vecs, "vec_id")
        .filter(F.col("e2") != F.col("embedding"))
        .count()
    )
    print(f"chunked hdf5 roundtrip: {back.count()} rows,",
          f"{mism} mismatches (expect 0)")
    spark.stop()


if __name__ == "__main__":
    main()
