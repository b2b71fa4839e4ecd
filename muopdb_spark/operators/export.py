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
