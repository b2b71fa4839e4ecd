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
               vec_col: str = "embedding", id_col: str = "vec_id",
               max_collect_bytes: int = 1 << 30) -> int:
    """Export a vector DataFrame to a single .fvecs/.bvecs/.ivecs file,
    id-ordered. Driver-side BY DESIGN (one file demands one writer).
    Serving-sized frames (payload <= max_collect_bytes, default 1 GiB)
    take one Arrow collect + flat-buffer reshape — the same treatment
    as write_hdf5_vectors after r12 measured the row-at-a-time
    toLocalIterator variant 2-3x slower on the serving rows. Larger
    frames fall back to CHUNKED Arrow collects over contiguous id
    ranges (one filtered job per chunk, appended in order), bounding
    driver memory at ~max_collect_bytes instead of the whole frame.
    A test/export utility (the serving path is parquet); use
    write_vecs_sharded for bulk export (executors write part files; no
    driver bound at all). Returns the row count.

    The format carries NO ids: a later read_vecs synthesizes them from
    file position, so ids are asserted contiguous here — otherwise the
    roundtrip would silently renumber rows. Re-key a non-contiguous
    frame with row_number() before export, and pass the first id as
    read_vecs' id_offset."""
    if kind not in _KINDS:
        raise ValueError(f"kind must be one of {sorted(_KINDS)}, got {kind!r}")
    dtype, isize = _KINDS[kind]
    from pyspark.sql import functions as F

    sel = df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(vec_col).alias(vec_col)
    )
    probe = sel.select(F.size(vec_col).alias("d")).first()
    if probe is not None:
        est = sel.count() * (4 + int(probe["d"]) * isize)
        if est > max_collect_bytes:
            return _write_vecs_chunked(
                sel, path, dtype=dtype, isize=isize, vec_col=vec_col,
                id_col=id_col, max_collect_bytes=max_collect_bytes,
            )
    tbl = sel.toArrow()
    ids = tbl.column(id_col).to_numpy()
    n = len(ids)
    if n == 0:
        # an empty selection is a legitimate export: a valid
        # zero-record file (the pre-r13 behavior)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb"):
            pass
        return 0
    emb = tbl.column(vec_col).combine_chunks()
    lens = np.diff(emb.offsets.to_numpy())
    if not (lens == lens[0]).all():
        bad = ids[np.argmax(lens != lens[0])]
        raise ValueError(
            f"ragged embeddings: {id_col} {bad} has {int(lens.min())}.."
            f"{int(lens.max())} values across the frame"
        )
    dim = int(lens[0])
    order = np.argsort(ids, kind="stable")
    sid = ids[order]
    if n > 1 and (np.diff(sid) != 1).any():
        gap = int(np.argmax(np.diff(sid) != 1))
        raise ValueError(
            f"write_vecs requires contiguous {id_col}s (format carries"
            f" no ids; read_vecs re-synthesizes from position): gap"
            f" {int(sid[gap])} -> {int(sid[gap + 1])}"
        )
    flat = emb.flatten().to_numpy(zero_copy_only=False)  # offset-safe
    mat = np.ascontiguousarray(
        flat.reshape(n, dim)[order].astype(
            np.dtype(dtype).newbyteorder("<"), copy=False
        )
    )
    # one (n, 4 + dim*isize) byte matrix: per-record int32 dim header
    # followed by the row payload — a single write call
    rec = np.empty((n, 4 + dim * isize), np.uint8)
    rec[:, :4] = np.frombuffer(struct.pack("<i", dim), np.uint8)
    rec[:, 4:] = mat.view(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(rec.tobytes())
    return n


def _write_vecs_chunked(
    sel: DataFrame, path: str, *, dtype, isize: int, vec_col: str,
    id_col: str, max_collect_bytes: int,
) -> int:
    """Chunked single-file export for frames past the one-collect
    budget: validate the id span globally (one agg), then collect and
    append contiguous id ranges one chunk at a time. Each chunk is a
    filtered Spark job (the id predicate pushes down), so driver
    memory stays ~max_collect_bytes regardless of frame size."""
    from pyspark.sql import functions as F

    span = sel.agg(
        F.count("*").alias("n"),
        F.count_distinct(id_col).alias("nd"),
        F.min(id_col).alias("lo"),
        F.max(id_col).alias("hi"),
        F.min(F.size(vec_col)).alias("dmin"),
        F.max(F.size(vec_col)).alias("dmax"),
    ).first()
    n, nd, lo, hi = int(span["n"]), int(span["nd"]), int(span["lo"]), int(span["hi"])
    dmin, dmax = int(span["dmin"]), int(span["dmax"])
    if dmin != dmax:
        raise ValueError(
            f"ragged embeddings: sizes {dmin}..{dmax} across the frame"
        )
    if nd != n or hi - lo + 1 != n:
        raise ValueError(
            f"write_vecs requires contiguous unique {id_col}s (format"
            f" carries no ids; read_vecs re-synthesizes from position):"
            f" {n} rows ({nd} distinct ids) spanning [{lo}, {hi}]"
        )
    dim = dmax
    rec_bytes = 4 + dim * isize
    rows_per_chunk = max(1, max_collect_bytes // rec_bytes)
    hdr = np.frombuffer(struct.pack("<i", dim), np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        for start in range(lo, hi + 1, rows_per_chunk):
            stop = min(start + rows_per_chunk, hi + 1)
            tbl = sel.filter(
                (F.col(id_col) >= start) & (F.col(id_col) < stop)
            ).toArrow()
            ids = tbl.column(id_col).to_numpy()
            order = np.argsort(ids, kind="stable")
            m = len(ids)
            if m != stop - start:
                raise ValueError(
                    f"write_vecs chunk [{start}, {stop}) returned {m}"
                    f" rows — frame changed underneath the export"
                )
            emb = tbl.column(vec_col).combine_chunks()
            flat = emb.flatten().to_numpy(zero_copy_only=False)
            mat = np.ascontiguousarray(
                flat.reshape(m, dim)[order].astype(
                    np.dtype(dtype).newbyteorder("<"), copy=False
                )
            )
            rec = np.empty((m, rec_bytes), np.uint8)
            rec[:, :4] = hdr
            rec[:, 4:] = mat.view(np.uint8)
            f.write(rec.tobytes())
    return n


def write_vecs_sharded(
    df: DataFrame,
    dir_path: str,
    *,
    kind: str = "fvecs",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rows_per_shard: int = 65536,
) -> dict:
    """Distributed vecs export: EXECUTORS write one .{kind} part file
    per contiguous id range (shard k holds ids [k*rows_per_shard,
    (k+1)*rows_per_shard)), plus a manifest.json the sharded reader
    consumes — this removes write_vecs' toLocalIterator driver bound
    (the single-file writer stays for single-file compatibility).

    Same id contract as write_vecs, validated DISTRIBUTED: each shard
    task checks its group is exactly its expected id range (which,
    with the driver-side check that shards 0..S-1 are all present and
    all but the last full, proves global contiguity 0..n-1). The
    directory must be on a shared filesystem in cluster mode — the
    same assumption read_vecs already makes. Returns the manifest."""
    import json

    from pyspark.sql import functions as F

    if kind not in _KINDS:
        raise ValueError(f"kind must be one of {sorted(_KINDS)}, got {kind!r}")
    dtype, elem = _KINDS[kind]
    os.makedirs(dir_path, exist_ok=True)
    rps = int(rows_per_shard)
    sharded = df.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        (F.col(id_col).cast("long") / rps).cast("long").alias("_shard"),
    )

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["_shard"].iat[0])
        order = np.argsort(pdf["vec_id"].to_numpy(), kind="stable")
        ids = pdf["vec_id"].to_numpy()[order]
        start = shard * rps
        if not (ids == np.arange(start, start + len(ids))).all():
            raise ValueError(
                f"shard {shard}: ids are not the contiguous range "
                f"[{start}, {start + len(ids)}) — the vecs format carries "
                "no ids; re-key with row_number() before export"
            )
        X = np.stack([
            np.asarray(v, dtype=dtype) for v in pdf["embedding"].iloc[order]
        ])
        dim = X.shape[1]
        rec = np.empty((len(ids), 4 + dim * elem), dtype=np.uint8)
        rec[:, :4] = np.frombuffer(
            struct.pack("<i", dim), dtype=np.uint8)
        rec[:, 4:] = (
            X.astype(np.dtype(dtype).newbyteorder("<"))
            .view(np.uint8).reshape(len(ids), dim * elem)
        )
        fname = os.path.join(dir_path, f"part-{shard:05d}.{kind}")
        tmp = fname + ".tmp"
        with open(tmp, "wb") as f:
            f.write(rec.tobytes())
        os.replace(tmp, fname)
        return pd.DataFrame({
            "shard": [shard], "file": [os.path.basename(fname)],
            "start": [start], "rows": [len(ids)], "dim": [dim],
        })

    parts = sorted(
        (r["shard"], r["file"], r["start"], r["rows"], r["dim"])
        for r in sharded.groupBy("_shard").applyInPandas(
            write_shard,
            "shard long, file string, start long, rows long, dim long",
        ).collect()
    )
    if not parts:
        raise ValueError("write_vecs_sharded: empty DataFrame")
    dims = {p[4] for p in parts}
    if len(dims) != 1:
        raise ValueError(f"mixed vector dims across shards: {sorted(dims)}")
    for i, p in enumerate(parts):
        if p[0] != i or (i < len(parts) - 1 and p[3] != rps):
            raise ValueError(
                "shards do not form a contiguous full sequence: "
                f"shard {p[0]} rows={p[3]} at position {i}"
            )
    manifest = {
        "kind": kind, "dim": int(parts[0][4]), "rows_per_shard": rps,
        "total_rows": int(sum(p[3] for p in parts)),
        "shards": [
            {"file": f, "start": int(s), "rows": int(n)}
            for _, f, s, n, _ in parts
        ],
    }
    tmp = os.path.join(dir_path, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, os.path.join(dir_path, "manifest.json"))
    return manifest


def read_vecs_sharded(
    spark: SparkSession,
    dir_path: str,
    *,
    rows_per_task: int = 65536,
) -> DataFrame:
    """Distributed reader for a write_vecs_sharded directory: one
    chunk-spec DataFrame over ALL shards (file, id range, byte range),
    one mapInPandas — the same executor-pread shape as read_vecs, with
    the file path riding on the spec row."""
    import json

    with open(os.path.join(dir_path, "manifest.json")) as f:
        manifest = json.load(f)
    kind, dim = manifest["kind"], int(manifest["dim"])
    dtype, elem = _KINDS[kind]
    rec = 4 + dim * elem
    chunks = []
    for sh in manifest["shards"]:
        for off in range(0, int(sh["rows"]), rows_per_task):
            rows = min(rows_per_task, int(sh["rows"]) - off)
            chunks.append((sh["file"], int(sh["start"]) + off, off, rows))
    spec = spark.createDataFrame(
        chunks, "file string, id_start long, row_off long, rows long")

    def _read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for fname, id_start, row_off, rows in zip(
                b["file"], b["id_start"], b["row_off"], b["rows"]
            ):
                with open(os.path.join(dir_path, fname), "rb") as f:
                    f.seek(int(row_off) * rec)
                    raw = f.read(int(rows) * rec)
                mat = np.frombuffer(raw, dtype=np.uint8).reshape(int(rows), rec)
                dims = mat[:, :4].copy().view("<i4").ravel()
                if not (dims == dim).all():
                    raise ValueError(
                        f"{fname}: record dim != manifest dim {dim}")
                vals = (
                    mat[:, 4:].copy().view(np.dtype(dtype).newbyteorder("<"))
                    .astype(np.float32)
                )
                ids = np.arange(
                    int(id_start), int(id_start) + int(rows), dtype=np.int64)
                yield pd.DataFrame({"vec_id": ids, "embedding": list(vals)})

    return (
        spec.repartition("file", "id_start")
        .mapInPandas(_read, "vec_id long, embedding array<float>")
    )
