"""Skew-mitigation helpers: salted aggregation and salted joins.

AQE's skew-join splitting handles most runtime skew automatically
(enabled in session.py), but two patterns still need explicit salting
at 100 TB:

  1. a groupBy where one key holds a large share of all rows (a viral
     LSH bucket, a whale user): pre-aggregate on (key, salt) then merge —
     two small shuffles instead of one stuck straggler task;
  2. a broadcast-impossible join against a skewed key: replicate the
     small side per salt so the big side's hot key spreads over
     `salt_buckets` tasks.

Salts are deterministic (hash of the row's id-ish columns), so results
are reproducible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, cols: Sequence[str], buckets: int, out: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, buckets) from a row's identifying cols."""
    return df.withColumn(out, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets)))


def salted_count(
    df: DataFrame, key_cols: Sequence[str], *, buckets: int = 16,
    salt_src: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe count per key: partial count on
    (key, salt) -> final sum on key. Same result as a plain groupBy
    count, but the hot key's rows split across `buckets` partial tasks."""
    src = list(salt_src) if salt_src else list(df.columns)
    salted = with_salt(df, src, buckets)
    partial = salted.groupBy(*key_cols, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(*key_cols).agg(F.sum("_c").cast("long").alias("count"))


def salted_sum(
    df: DataFrame, key_cols: Sequence[str], value_col: str, *, buckets: int = 16,
    salt_src: Sequence[str] | None = None,
) -> DataFrame:
    src = list(salt_src) if salt_src else list(df.columns)
    salted = with_salt(df, src, buckets)
    partial = salted.groupBy(*key_cols, "_salt").agg(F.sum(value_col).alias("_s"))
    return partial.groupBy(*key_cols).agg(F.sum("_s").alias(f"sum_{value_col}"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the big side deterministically, replicate
    the small side once per salt value, join on (key, salt). Identical
    result set to big.join(small, on); the hot key fans out over
    `buckets` tasks instead of one straggler.

    Only inner/left/semi/anti joins are equivalent under salting: an
    outer-preserved SMALL side would surface every unmatched small row
    once PER SALT (r16 review: refused by name instead of silently
    multiplying rows)."""
    if how not in ("inner", "left", "leftouter", "left_outer",
                   "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join: how={how!r} unsupported — replicating the "
            "small side breaks right/full-outer semantics (unmatched "
            "small rows would appear once per salt)"
        )
    big_salted = with_salt(big, [c for c in big.columns], buckets)
    salts = F.array(*[F.lit(i) for i in range(buckets)])
    small_rep = small.withColumn("_salt", F.explode(salts))
    return big_salted.join(small_rep, on=[on, "_salt"], how=how).drop("_salt")
