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
    merges: list,
    *,
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

    Determinism: tokenization is bpe_apply under the caller's merge
    list; ids are the subword's rank in the lexicographically-sorted
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

    from muopdb_spark.operators.vocab import bpe_apply

    _os.makedirs(path, exist_ok=True)
    enc = bpe_apply(df, merges, text_col=text_col).select(
        id_col, "bpe_tokens"
    )
    vocab_rows = (
        enc.select(F.explode("bpe_tokens").alias("sw")).distinct()
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
    ).join(enc.withColumn("ids", to_ids("bpe_tokens")).drop("bpe_tokens"),
           id_col)

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
