"""Training-shard export: deterministic pseudo-random global shuffle.

LLM training wants the corpus (a) split into fixed shards sized for a
data-loader, (b) in an order that is random with respect to every
content attribute (source, time, length — sequential corpus order is
badly correlated), and (c) DETERMINISTIC, so re-exports are
byte-identical and any example's position is reproducible from its id
alone.  Hash-based assignment gives all three: shard and position are
pure functions of (seed, id) — no RNG state, no sampling job, stable
under re-runs and under corpus append (old rows keep their shard).

Scale design (100 TB):
  - shard/sort keys are map-side hash expressions (no Python).
  - The only shuffle is the per-shard ordering window.  Pick n_shards
    so one shard is a few GB (e.g. 25k shards at 100 TB): partitions
    stay executor-sized, the per-shard sort is a local sort, and the
    write is one file per shard, exactly what a data-loader wants.
    A skewless hash guarantees shard balance to ~sqrt variance.
  - ``write_shards`` lays out parquet partitioned by shard_id with
    rows pre-sorted by the order key, so a reader streams any shard
    in training order with a plain scan — no shuffle at read time.

The oracle-pinned demo keys use md5 (identical in DuckDB and Spark);
swap ``xxhash64`` in via ``hash_expr`` for cheaper prod keys.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _md5_key(seed: str, id_col: Column) -> Column:
    return F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string")))


def shard_assignment(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "shard-v1",
    hash_expr: Callable[[str, Column], Column] = _md5_key,
) -> DataFrame:
    """(id_col, shard_id, position): deterministic global shuffle.

    shard_id = first-8-hex-chars (32 bits) of md5(seed:id) mod
    n_shards — 2^32 buckets keep the mod-bias below 1 part in 2^16 for
    any n_shards <= 65536, so shards balance to ~sqrt variance for
    every legal n_shards (2 hex chars would skew up to 2x whenever
    n_shards doesn't divide 256); position = 1-based rank within the
    shard by (full hash, id) — random order with a total deterministic
    tie-break.
    """
    if not 1 <= n_shards <= 65536:
        raise ValueError("default md5 key supports 1..65536 shards; pass hash_expr")
    h = hash_expr(seed, F.col(id_col))
    out = df.select(id_col, h.alias("hh"))
    out = out.withColumn(
        "shard_id",
        (F.conv(F.substring("hh", 1, 8), 16, 10).cast("long") % n_shards),
    )
    w = Window.partitionBy("shard_id").orderBy("hh", id_col)
    return out.select(
        id_col,
        "shard_id",
        F.row_number().over(w).cast("long").alias("position"),
    )


def write_shards(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "shard-v1",
) -> None:
    """Materialize the shuffled corpus: parquet partitioned by
    shard_id, rows inside each shard pre-sorted in training order."""
    assigned = shard_assignment(
        df, id_col=id_col, n_shards=n_shards, seed=seed
    ).join(df, id_col)
    (
        assigned.repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", "position")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )


def write_token_shards(
    df: DataFrame,
    path: str,
    merges: list | None = None,
    *,
    unigram_vocab: dict | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "shard-v1",
) -> DataFrame:
    """Trainer-handoff TOKEN BINARY export — the last meter of the
    curation pipeline: per shard, a flat little-endian int32 token-id
    stream (``shard_<k>.bin``) plus an index of int64
    (doc_id, n_tokens) pairs in stream order (``shard_<k>.idx``),
    modeled on the public Megatron-LM indexed-dataset layout, plus one
    driver-written ``vocab.json`` mapping id -> subword. A data loader
    mmaps the .bin and slices documents by the .idx prefix sums — no
    parquet/Arrow runtime at training time.

    Subword model: pass `merges` (an ordered BPE merge list ->
    bpe_apply) OR `unigram_vocab` (a unigram piece table from
    operators/unigram.py -> unigram_apply Viterbi) — exactly one.
    Determinism: tokenization is the chosen model's Arrow apply pass;
    ids are the subword's rank in the lexicographically-sorted
    corpus vocabulary (a bounded collect — the subword set is capped
    by merges + alphabet, the same class as bpe_train's word table);
    shard/position come from shard_assignment's (seed, id) hash, so
    re-exports are byte-identical.

    Scale: the encode is the zero-shuffle Arrow pass bpe_apply already
    is; the only shuffle is the per-shard ordering (pick n_shards so a
    shard is a few GB); each shard's files are written by ITS OWN
    executor task (applyInPandas group) — `path` must be a shared
    filesystem in cluster mode, which a training-data sink requires
    anyway. Returns the per-shard manifest (shard_id, n_docs,
    n_tokens, bin_bytes).
    """
    import json as _json
    import os as _os

    import numpy as _np
    import pandas as _pd

    if (merges is None) == (unigram_vocab is None):
        raise ValueError(
            "write_token_shards: exactly one of merges/unigram_vocab"
        )
    _os.makedirs(path, exist_ok=True)
    if merges is not None:
        from muopdb_spark.operators.vocab import bpe_apply

        enc = bpe_apply(df, merges, text_col=text_col) \
            .withColumnRenamed("bpe_tokens", "_sw").select(id_col, "_sw")
    else:
        from muopdb_spark.operators.unigram import unigram_apply

        enc = unigram_apply(
            df, unigram_vocab, text_col=text_col, out_col="_sw"
        ).select(id_col, "_sw")
    vocab_rows = (
        enc.select(F.explode("_sw").alias("sw")).distinct()
        .orderBy("sw").collect()
    )
    vocab = {r["sw"]: i for i, r in enumerate(vocab_rows)}
    with open(_os.path.join(path, "vocab.json"), "w") as fh:
        _json.dump({i: sw for sw, i in vocab.items()}, fh)

    spark = df.sparkSession
    bvocab = spark.sparkContext.broadcast(vocab)

    @F.pandas_udf("array<int>")
    def to_ids(col):
        v = bvocab.value
        return col.map(lambda toks: [v[t] for t in toks])

    assigned = shard_assignment(
        enc, id_col=id_col, n_shards=n_shards, seed=seed
    ).join(enc.withColumn("ids", to_ids("_sw")).drop("_sw"), id_col)

    out_schema = "shard_id long, n_docs long, n_tokens long, bin_bytes long"

    def _write(pdf: _pd.DataFrame) -> _pd.DataFrame:
        pdf = pdf.sort_values("position", kind="mergesort")
        sid = int(pdf["shard_id"].iloc[0])
        flat = _np.concatenate(
            [_np.asarray(x, dtype="<i4") for x in pdf["ids"]]
        ) if len(pdf) else _np.empty(0, dtype="<i4")
        idx = _np.stack(
            [pdf[id_col].to_numpy(dtype="<i8"),
             _np.asarray([len(x) for x in pdf["ids"]], dtype="<i8")],
            axis=1,
        )
        with open(_os.path.join(path, f"shard_{sid}.bin"), "wb") as fh:
            flat.tofile(fh)
        with open(_os.path.join(path, f"shard_{sid}.idx"), "wb") as fh:
            idx.tofile(fh)
        return _pd.DataFrame(
            {"shard_id": [sid], "n_docs": [len(pdf)],
             "n_tokens": [int(flat.size)],
             "bin_bytes": [int(flat.size * 4)]}
        )

    manifest = assigned.groupBy("shard_id").applyInPandas(
        _write, schema=out_schema
    )
    # applyInPandas is lazy — force the writes and return the manifest
    # as a small materialized frame
    rows = manifest.collect()
    # A shard id that received zero docs produces no applyInPandas
    # group, hence no files and no manifest row — but loaders iterate
    # range(n_shards), so backfill empty .bin/.idx + a zero row for
    # every absent id (driver-side: at most n_shards tiny files).
    written = {r["shard_id"] for r in rows}
    for sid in range(n_shards):
        if sid in written:
            continue
        _np.empty(0, dtype="<i4").tofile(_os.path.join(path, f"shard_{sid}.bin"))
        _np.empty(0, dtype="<i8").tofile(_os.path.join(path, f"shard_{sid}.idx"))
        rows.append((sid, 0, 0, 0))
    return spark.createDataFrame(rows, out_schema)


def read_token_shard(path: str, shard_id: int):
    """Loader-side twin of write_token_shards for one shard: returns
    (ids, index) where ids is the flat int32 stream and index the
    (doc_id, n_tokens) int64 array — slice doc j's tokens with the
    index's prefix sums. Pure numpy; no Spark at training time."""
    import os as _os

    import numpy as _np

    ids = _np.fromfile(
        _os.path.join(path, f"shard_{shard_id}.bin"), dtype="<i4"
    )
    idx = _np.fromfile(
        _os.path.join(path, f"shard_{shard_id}.idx"), dtype="<i8"
    ).reshape(-1, 2)
    return ids, idx


# ------------------------------------------------- WebDataset tar export


_WDS_EXTS = (
    (b"\x89PNG\r\n\x1a\n", "png"), (b"\xff\xd8", "jpg"),
    (b"GIF87a", "gif"), (b"GIF89a", "gif"), (b"BM", "bmp"),
)


def _sniff_ext(blob: bytes) -> str:
    """Container extension by magic — the WebDataset member suffix a
    loader dispatches decoders on; unknown payloads land as .bin."""
    for magic, ext in _WDS_EXTS:
        if blob[:len(magic)] == magic:
            return ext
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav"
    if blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
        return "avi"
    if len(blob) >= 12 and blob[4:8] == b"ftyp":
        return "mp4"
    return "bin"


def write_webdataset(
    media: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    content_col: str = "content",
    meta_cols: list[str] | None = None,
    n_shards: int = 8,
    seed: str = "wds-v1",
) -> DataFrame:
    """Multimodal trainer-handoff export in the PUBLIC WebDataset
    layout (tar shards; per sample `{key}.{ext}` payload + a
    `{key}.json` metadata member) — the standard input format of
    multimodal training loaders, and the media twin of
    write_token_shards' Megatron-style text export.

    - key = zero-padded doc id (lexicographic order == numeric order);
      ext sniffed from the payload magic (png/jpg/gif/bmp/wav/avi/mp4,
      else bin) so a loader dispatches decoders without a sidecar.
    - shard/position come from shard_assignment's (seed, id) hash —
      deterministic pseudo-random global shuffle, re-export stable
      under corpus append.
    - tar members are written with zeroed mtime/uid/gid and fixed
      modes in USTAR format, so a re-export is BYTE-identical (tests
      pin this) — reproducibility loaders can checksum against.
    - each shard's tar is written by ITS OWN executor task
      (applyInPandas group): `path` must be a shared filesystem in
      cluster mode, which a training sink requires anyway. At 100 TB,
      pick n_shards so a tar stays around 1 GB — read_webdataset's
      binaryFile scan holds a whole tar in memory per task and Spark
      caps a binary file at 2 GB, so "a few GB" tars would be
      UNREADABLE by the twin (external loaders stream and don't care).
      The only shuffle is the per-shard ordering.

    Returns the manifest (shard_id, n_docs, tar_bytes); empty shards
    get a valid empty tar + a zero manifest row.
    """
    import io as _io
    import json as _json
    import os as _os
    import tarfile as _tarfile

    import pandas as _pd

    _os.makedirs(path, exist_ok=True)
    meta_cols = list(meta_cols or [])
    payload = media.select(id_col, content_col, *meta_cols)
    assigned = shard_assignment(
        payload, id_col=id_col, n_shards=n_shards, seed=seed
    ).join(payload, id_col)

    out_schema = "shard_id long, n_docs long, tar_bytes long"

    def _write(pdf: _pd.DataFrame) -> _pd.DataFrame:
        pdf = pdf.sort_values("position", kind="mergesort")
        sid = int(pdf["shard_id"].iloc[0])
        tar_path = _os.path.join(path, f"shard-{sid:06d}.tar")

        def add(tf, name, blob):
            info = _tarfile.TarInfo(name)
            info.size = len(blob)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            info.mode = 0o644
            tf.addfile(info, _io.BytesIO(blob))

        with _tarfile.open(
            tar_path, "w", format=_tarfile.USTAR_FORMAT
        ) as tf:
            for _, row in pdf.iterrows():
                key = f"{int(row[id_col]):012d}"
                blob = bytes(row[content_col])
                add(tf, f"{key}.{_sniff_ext(blob)}", blob)
                meta = {id_col: int(row[id_col])}
                for c in meta_cols:
                    v = row[c]
                    meta[c] = v.item() if hasattr(v, "item") else v
                add(tf, f"{key}.json",
                    _json.dumps(meta, sort_keys=True).encode())
        return _pd.DataFrame(
            {"shard_id": [sid], "n_docs": [len(pdf)],
             "tar_bytes": [_os.path.getsize(tar_path)]}
        )

    manifest = (
        assigned.repartition(n_shards, "shard_id")
        .groupBy("shard_id")
        .applyInPandas(_write, out_schema)
    )
    rows = [tuple(r) for r in manifest.collect()]
    written = {r[0] for r in rows}
    import tarfile as _tarfile2

    for sid in range(n_shards):
        if sid in written:
            continue
        tar_path = _os.path.join(path, f"shard-{sid:06d}.tar")
        with _tarfile2.open(tar_path, "w", format=_tarfile2.USTAR_FORMAT):
            pass
        rows.append((sid, 0, _os.path.getsize(tar_path)))
    spark = media.sparkSession
    return spark.createDataFrame(
        sorted(rows), "shard_id long, n_docs long, tar_bytes long"
    )


def read_webdataset(spark, path: str) -> DataFrame:
    """Loader-side twin of write_webdataset: every tar under `path`
    parsed executor-side (binaryFile scan -> mapInPandas tarfile walk)
    into (shard_id, key, ext, content, meta) rows — one row per
    payload member, its .json sidecar attached as a string. The
    roundtrip contract write/read is oracle- and test-pinned."""
    import io as _io
    import json as _json
    import os as _os
    import re as _re
    import tarfile as _tarfile

    import pandas as _pd

    files = spark.read.format("binaryFile").load(
        _os.path.join(path, "*.tar")
    ).select("path", "content")

    def gen(batches):
        for pdf in batches:
            out = {"shard_id": [], "key": [], "ext": [], "content": [],
                   "meta": []}
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                m = _re.search(r"shard-(\d+)\.tar$", fpath)
                sid = int(m.group(1)) if m else -1
                with _tarfile.open(
                    fileobj=_io.BytesIO(bytes(blob))
                ) as tf:
                    members = {}
                    for info in tf:
                        if not info.isfile():  # dirs/links in foreign tars
                            continue
                        data = tf.extractfile(info).read()
                        if "." in info.name:
                            key, ext = info.name.rsplit(".", 1)
                        else:  # extension-less member: opaque payload
                            key, ext = info.name, "bin"
                        members.setdefault(key, {})[ext] = data
                    for key in sorted(members):
                        exts = members[key]
                        meta = exts.pop("json", b"{}").decode()
                        _json.loads(meta)  # malformed sidecar -> error
                        for ext, data in sorted(exts.items()):
                            out["shard_id"].append(sid)
                            out["key"].append(key)
                            out["ext"].append(ext)
                            out["content"].append(data)
                            out["meta"].append(meta)
            yield _pd.DataFrame(out)

    return files.mapInPandas(
        gen,
        "shard_id long, key string, ext string, content binary, "
        "meta string",
    )
