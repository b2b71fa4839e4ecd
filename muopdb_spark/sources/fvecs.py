"""fvecs/bvecs/ivecs offline vector source (S8) — the standard on-disk
vector format of the TexMex corpora and ann-benchmarks suites (public
format: each record is a little-endian int32 dimension d followed by d
values — float32 for .fvecs, uint8 for .bvecs, int32 for .ivecs).

The reference's index_writer ingests offline vector files for index
builds (rs/index_writer/src/input/hdf5.rs, driver index_writer.rs:429);
this environment has no HDF5 bindings (sources/hdf5.py stays gated), so
the vecs family fills the offline-ingest role with zero dependencies
beyond numpy.

Spark-first shape: the DRIVER reads only the first 4 bytes (dimension
probe) and computes fixed-size record offsets; the file body is read by
EXECUTORS — a chunk-spec DataFrame feeds mapInPandas tasks that each
pread their own byte range (numpy frombuffer, zero row-at-a-time work).
At scale the file lives on a shared filesystem (NFS/HDFS-mounted/
object-store FUSE) and N tasks read N disjoint ranges in parallel; no
collect, no driver materialization. Vector values surface as float
(array<float>) for every kind, matching the embeddings fixture schema.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_KINDS = {
    # kind -> (numpy dtype of the payload, bytes per element)
    "fvecs": (np.float32, 4),
    "bvecs": (np.uint8, 1),
    "ivecs": (np.int32, 4),
}


def _probe(path: str, kind: str) -> tuple[int, int, int]:
    """(dim, record_bytes, n_records) from the first header + file size.

    The format permits per-record dims, but every published corpus is
    constant-dim; constancy is validated by the size check here and by
    each task's per-record header check."""
    _, elem = _KINDS[kind]
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        head = f.read(4)
    if len(head) < 4:
        raise ValueError(f"{path}: too short for a {kind} header")
    dim = struct.unpack("<i", head)[0]
    if dim <= 0:
        raise ValueError(f"{path}: non-positive dimension {dim}")
    rec = 4 + dim * elem
    if size % rec != 0:
        raise ValueError(
            f"{path}: size {size} not a multiple of record size {rec} "
            f"(dim {dim}) — mixed dimensions or truncated file"
        )
    return dim, rec, size // rec


def read_vecs(
    spark: SparkSession,
    path: str,
    *,
    kind: str = "fvecs",
    id_offset: int = 0,
    rows_per_task: int = 65536,
) -> DataFrame:
    """Distributed (vec_id long, embedding array<float>) over a
    .fvecs/.bvecs/.ivecs file. Executors read disjoint byte ranges;
    the driver touches 4 bytes.

    vec_ids are SYNTHESIZED as id_offset + file position — the format
    carries no ids (a write_vecs→read_vecs roundtrip preserves ids only
    when the written ids were contiguous from id_offset; write_vecs
    asserts that)."""
    if kind not in _KINDS:
        raise ValueError(f"kind must be one of {sorted(_KINDS)}, got {kind!r}")
    dim, rec, n = _probe(path, kind)
    chunks = [
        (id_offset + start, min(rows_per_task, n - start))
        for start in range(0, n, rows_per_task)
    ]
    spec = spark.createDataFrame(chunks, "start long, rows long")
    dtype, elem = _KINDS[kind]
    base = id_offset

    def _read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for start, rows in zip(b["start"], b["rows"]):
                with open(path, "rb") as f:
                    f.seek((int(start) - base) * rec)
                    raw = f.read(int(rows) * rec)
                mat = np.frombuffer(raw, dtype=np.uint8).reshape(int(rows), rec)
                dims = mat[:, :4].copy().view("<i4").ravel()
                if not (dims == dim).all():
                    raise ValueError(
                        f"{path}: record dim {set(dims.tolist()) - {dim}} "
                        f"!= header dim {dim}"
                    )
                vals = (
                    mat[:, 4:].copy().view(np.dtype(dtype).newbyteorder("<"))
                    .astype(np.float32)
                )
                ids = np.arange(int(start), int(start) + int(rows), dtype=np.int64)
                yield pd.DataFrame(
                    {"vec_id": ids, "embedding": list(vals)}
                )

    return (
        spec.repartition("start")
        .mapInPandas(_read, "vec_id long, embedding array<float>")
    )


def write_vecs(df: DataFrame, path: str, *, kind: str = "fvecs",
               vec_col: str = "embedding", id_col: str = "vec_id") -> int:
    """Export a vector DataFrame to a single .fvecs/.bvecs/.ivecs file,
    id-ordered. Streams through toLocalIterator — one partition
    driver-resident at a time; a test/export utility (the serving path
    is parquet), not a bulk sink. Returns the row count.

    The format carries NO ids: a later read_vecs synthesizes them from
    file position, so ids are asserted contiguous here (0, 1, 2, ...) —
    otherwise the roundtrip would silently renumber rows. Re-key a
    non-contiguous frame with row_number() before export, and pass the
    first id as read_vecs' id_offset."""
    if kind not in _KINDS:
        raise ValueError(f"kind must be one of {sorted(_KINDS)}, got {kind!r}")
    dtype, _ = _KINDS[kind]
    n = 0
    prev_id = None
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        for row in df.select(id_col, vec_col).orderBy(id_col).toLocalIterator():
            if prev_id is not None and row[id_col] != prev_id + 1:
                raise ValueError(
                    f"write_vecs requires contiguous {id_col}s (format carries"
                    f" no ids; read_vecs re-synthesizes from position): gap"
                    f" {prev_id} -> {row[id_col]}"
                )
            prev_id = row[id_col]
            vec = np.asarray(row[vec_col], dtype=dtype)
            f.write(struct.pack("<i", len(vec)))
            f.write(vec.astype(np.dtype(dtype).newbyteorder("<")).tobytes())
            n += 1
    return n
