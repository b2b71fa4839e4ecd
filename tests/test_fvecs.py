"""fvecs/bvecs/ivecs source: roundtrip, distributed chunking, and
format validation (sources/fvecs.py; S8 offline-ingest role,
rs/index_writer/src/input/hdf5.rs analog)."""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from muopdb_spark.sources.fvecs import read_vecs, write_vecs


@pytest.mark.parametrize("kind,dtype", [
    ("fvecs", np.float32), ("bvecs", np.uint8), ("ivecs", np.int32),
])
def test_roundtrip_all_kinds(spark, tmp_path, kind, dtype):
    rng = np.random.default_rng(7)
    n, dim = 257, 12  # not a multiple of rows_per_task on purpose
    if kind == "fvecs":
        mat = rng.normal(size=(n, dim)).astype(dtype)
    else:
        mat = rng.integers(0, 100, size=(n, dim)).astype(dtype)
    p = str(tmp_path / f"v.{kind}")
    with open(p, "wb") as f:
        for row in mat:
            f.write(struct.pack("<i", dim))
            f.write(row.tobytes())

    df = read_vecs(spark, p, kind=kind, rows_per_task=100)
    rows = {r["vec_id"]: r["embedding"] for r in df.collect()}
    assert len(rows) == n
    assert np.allclose(rows[0], mat[0].astype(np.float32))
    assert np.allclose(rows[n - 1], mat[n - 1].astype(np.float32))
    # ids are dense and chunk boundaries do not duplicate or drop rows
    assert sorted(rows) == list(range(n))


def test_write_then_read(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, [float(i), float(i) + 0.5]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    p = str(tmp_path / "out.fvecs")
    assert write_vecs(df, p, kind="fvecs") == 10
    back = {r["vec_id"]: r["embedding"] for r in
            read_vecs(spark, p, kind="fvecs").collect()}
    assert back[3] == [3.0, 3.5]


def test_id_offset(spark, tmp_path):
    p = str(tmp_path / "o.fvecs")
    with open(p, "wb") as f:
        for i in range(5):
            f.write(struct.pack("<i", 2))
            f.write(np.array([i, i], dtype=np.float32).tobytes())
    ids = sorted(r["vec_id"] for r in
                 read_vecs(spark, p, kind="fvecs", id_offset=100).collect())
    assert ids == [100, 101, 102, 103, 104]


def test_truncated_file_rejected(spark, tmp_path):
    p = str(tmp_path / "bad.fvecs")
    with open(p, "wb") as f:
        f.write(struct.pack("<i", 4))
        f.write(np.zeros(3, dtype=np.float32).tobytes())  # 1 value short
    with pytest.raises(ValueError, match="not a multiple"):
        read_vecs(spark, p, kind="fvecs")


def test_mixed_dims_rejected(spark, tmp_path):
    # two records whose sizes happen to sum compatibly but differ in dim
    p = str(tmp_path / "mixed.fvecs")
    with open(p, "wb") as f:
        f.write(struct.pack("<i", 2))
        f.write(np.zeros(2, dtype=np.float32).tobytes())
        f.write(struct.pack("<i", 3))
        f.write(np.zeros(3, dtype=np.float32).tobytes())
        f.write(struct.pack("<i", 1))
        f.write(np.zeros(1, dtype=np.float32).tobytes())
    with pytest.raises(Exception):
        read_vecs(spark, p, kind="fvecs").collect()


def test_bad_kind_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="kind"):
        read_vecs(spark, str(tmp_path / "x"), kind="npy")


def test_noncontiguous_ids_rejected(spark, tmp_path):
    """The format carries no ids; write_vecs must refuse a frame whose
    ids a read-side positional renumbering would silently change."""
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (2, [3.0, 4.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="contiguous"):
        write_vecs(df, str(tmp_path / "gap.fvecs"))


def test_sharded_roundtrip(spark, tmp_path):
    """write_vecs_sharded -> read_vecs_sharded preserves ids and values,
    and the executors wrote multiple part files (no driver iterator)."""
    import os

    import numpy as np

    from muopdb_spark.sources.fvecs import (
        read_vecs_sharded,
        write_vecs_sharded,
    )

    rng = np.random.default_rng(4)
    n, dim = 1000, 8
    vals = rng.normal(0, 1, (n, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vals[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    d = str(tmp_path / "shards")
    manifest = write_vecs_sharded(df, d, rows_per_shard=256)
    assert manifest["total_rows"] == n and manifest["dim"] == dim
    assert len(manifest["shards"]) == 4  # 256+256+256+232
    assert sorted(f for f in os.listdir(d) if f.endswith(".fvecs")) == [
        s["file"] for s in manifest["shards"]
    ]

    back = read_vecs_sharded(spark, d, rows_per_task=100)
    rows = {r["vec_id"]: r["embedding"] for r in back.collect()}
    assert len(rows) == n
    for i in (0, 255, 256, 999):
        assert np.allclose(rows[i], vals[i])


def test_sharded_rejects_gappy_ids(spark, tmp_path):
    import pytest

    from muopdb_spark.sources.fvecs import write_vecs_sharded

    df = spark.createDataFrame(
        [(i * 2, [1.0, 2.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="contiguous"):
        write_vecs_sharded(df, str(tmp_path / "bad"), rows_per_shard=4)


def test_write_vecs_empty_frame_writes_empty_file(spark, tmp_path):
    from muopdb_spark.sources.fvecs import read_vecs, write_vecs

    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    path = str(tmp_path / "empty.fvecs")
    assert write_vecs(df, path) == 0
    import os

    assert os.path.getsize(path) == 0


def test_write_vecs_chunked_path_matches_fast_path(spark, tmp_path):
    # force the chunked Arrow-collect path with a tiny collect budget:
    # output must be byte-identical to the one-collect fast path
    df = spark.createDataFrame(
        [(i, [float(i), float(i) + 0.5]) for i in range(100)],
        "vec_id long, embedding array<float>",
    )
    fast = str(tmp_path / "fast.fvecs")
    chunked = str(tmp_path / "chunked.fvecs")
    assert write_vecs(df, fast, kind="fvecs") == 100
    assert write_vecs(df, chunked, kind="fvecs",
                      max_collect_bytes=256) == 100
    with open(fast, "rb") as a, open(chunked, "rb") as b:
        assert a.read() == b.read()


def test_write_vecs_chunked_rejects_gappy_ids(spark, tmp_path):
    import pytest

    df = spark.createDataFrame(
        [(i * 2, [1.0, 2.0]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="contiguous"):
        write_vecs(df, str(tmp_path / "gap.fvecs"), max_collect_bytes=256)
