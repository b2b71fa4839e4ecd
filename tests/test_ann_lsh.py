"""Random-hyperplane LSH: recall vs exact brute force on clustered and
fixture data."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from muopdb_spark.index.ann_lsh import build_rp_lsh, lsh_knn, lsh_near_dup_pairs
from muopdb_spark.operators.dedup import embedding_near_dup_pairs
from muopdb_spark.operators.knn import knn


@pytest.fixture(scope="module")
def vectors(spark):
    # directional clusters (cosine LSH buckets by direction)
    rng = np.random.default_rng(11)
    dirs = rng.standard_normal((5, 16))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rows = []
    for c in range(5):
        for j in range(40):
            v = dirs[c] + rng.normal(0, 0.05, 16)
            rows.append((c * 40 + j, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


@pytest.fixture(scope="module")
def index(vectors):
    return build_rp_lsh(vectors, num_planes=10, num_tables=6, seed=4)


@pytest.mark.slow
def test_lsh_knn_recall(vectors, index):
    rng = np.random.default_rng(2)
    recalls = []
    for probe_id in (0, 40, 160):
        q = vectors.filter(F.col("vec_id") == probe_id).first()["embedding"]
        exact = {r["vec_id"] for r in
                 knn(vectors, q, 10, id_col="vec_id", metric="cosine").collect()}
        approx = {r["id"] for r in lsh_knn(index, q, 10).collect()}
        recalls.append(len(exact & approx) / 10)
    assert np.mean(recalls) >= 0.9


def test_lsh_near_dup_recall_vs_bruteforce(vectors, index):
    brute = {(r["id_a"], r["id_b"]) for r in
             embedding_near_dup_pairs(vectors, threshold=0.995).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in
           lsh_near_dup_pairs(index, threshold=0.995).collect()}
    assert lsh <= brute or not brute  # no false positives (exact verify)
    if brute:
        assert len(lsh & brute) / len(brute) >= 0.8  # recall


@pytest.mark.slow
def test_save_load_roundtrip(spark, tmp_path):
    """lsh_save/lsh_load: the reloaded index serves identical near-dup
    pairs and knn results — the durable-artifact contract the serving
    path depends on."""
    import numpy as np

    from muopdb_spark.index.ann_lsh import (
        build_rp_lsh, lsh_knn, lsh_load, lsh_near_dup_pairs, lsh_save,
    )

    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 8))
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    # plant near dups
    for j in range(5):
        rows.append((100 + j, [float(x) for x in base[j] * 1.001]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    built = build_rp_lsh(df, num_planes=4, num_tables=6, seed=3)
    p = str(tmp_path / "lsh")
    lsh_save(built, p)
    loaded = lsh_load(spark, p)
    assert np.allclose(loaded.planes, built.planes)

    def pairs(idx):
        return sorted(
            (r["id_a"], r["id_b"])
            for r in lsh_near_dup_pairs(idx, threshold=0.99).collect()
        )

    assert pairs(loaded) == pairs(built) and len(pairs(loaded)) >= 5
    q = [float(x) for x in base[0]]
    got_b = [r["id"] for r in lsh_knn(built, q, 3).collect()]
    got_l = [r["id"] for r in lsh_knn(loaded, q, 3).collect()]
    assert got_b == got_l


def test_max_bucket_size_drops_viral_buckets(spark):
    """A bucket over the cap contributes no pairs; small buckets are
    unaffected — bounding any verification task at cap^2 work."""
    import numpy as np

    from muopdb_spark.index.ann_lsh import build_rp_lsh, lsh_near_dup_pairs

    rng = np.random.default_rng(3)
    # 40 near-identical vectors (a viral bucket in every table) + one
    # isolated close pair far from the blob
    blob = rng.normal(0, 0.01, (40, 8)) + np.array([5.0] * 8)
    pair = np.array([[-5.0, 1, 0, 0, 0, 0, 0, 0], [-5.0, 1.01, 0, 0, 0, 0, 0, 0]])
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(blob)] + [
        (100, [float(x) for x in pair[0]]),
        (101, [float(x) for x in pair[1]]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = build_rp_lsh(df, num_planes=6, num_tables=4, seed=1)
    uncapped = lsh_near_dup_pairs(idx, threshold=0.99).collect()
    capped = lsh_near_dup_pairs(
        idx, threshold=0.99, max_bucket_size=10
    ).collect()
    # the blob's quadratic pair set is gone, the small pair survives
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(100, 101)}
    assert len(uncapped) > len(capped)


def test_num_planes_bucket_width_guard(spark):
    """63+ sign bits would shift past the int64 bucket's sign bit and
    silently fold buckets together (r16 hardening: named refusal)."""
    import pytest

    from muopdb_spark.index.ann_lsh import build_rp_lsh

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="1..62"):
        build_rp_lsh(df, num_planes=63)
    with pytest.raises(ValueError, match="num_tables"):
        build_rp_lsh(df, num_planes=8, num_tables=0)
