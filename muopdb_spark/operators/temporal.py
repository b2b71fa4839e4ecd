"""Temporal relational operators: as-of join and banded range join.

Spark has no native ASOF JOIN (DuckDB/Pandas do) and a naive
`a.join(b, (b.ts <= a.ts) & ...)` inequality join is a broadcast
nested-loop — O(n*m) and a driver OOM at scale. Both operators here are
re-expressed as equi-shuffles so Catalyst plans them as ordinary
hash/sort-merge exchanges:

- `asof_join`: union both sides tagged, one window pass per key ordered
  by (ts, side, tiebreak), `last(payload, ignorenulls)` carries the most
  recent right payload forward onto each left row. ONE shuffle on the
  join keys, O((n+m) log) within partitions, no candidate explosion.
  This is the standard log-structured merge formulation (same shape the
  reference uses to merge WAL entries onto queries by seq_no,
  rs/index/src/collection/core.rs snapshot reads).
- `range_count_join`: time-bucket band join — right rows replicate to
  their bucket and the next one, equi-join on (keys, bucket), exact
  range predicate applied post-join. Replication factor is a constant 2
  (vs unbounded for the nested loop), shuffle keys are (key, bucket) so
  skewed users spread over buckets.

Scale notes (100 TB): both shuffle once on (key[, bucket]); window
state is O(1) per row (running `last`), so no per-key materialization.
Bucket width should match the range width — wider buckets raise the
post-filter discard rate, narrower raise the replication factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: list[str],
    ts: str = "ts",
    payload: list[str],
    tiebreak: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: each left row gains the payload of the
    latest right row with ``right.ts <= left.ts`` in the same key group
    (null payload when no such row). Ties on (ts) resolve to the largest
    ``tiebreak`` value; inclusive boundary (right-at-equal-ts matches).

    Returns left's columns plus ``{prefix}{c}`` for each payload col.
    """
    out_cols = list(left.columns)
    pay_struct = F.struct(*[F.col(c).alias(c) for c in payload])
    r_cols = [
        *[F.col(k) for k in keys],
        F.col(ts).alias(ts),
        pay_struct.alias("_pay"),
        F.lit(0).alias("_side"),
    ]
    if tiebreak is not None:
        # carry the RIGHT side's tiebreak under a private name — a bare
        # union would null it out (left owns the original column name)
        r_cols.append(F.col(tiebreak).alias("_tb"))
    r = right.select(*r_cols)
    l = left.withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    order = [F.col(ts).asc(), F.col("_side").asc()]
    if tiebreak is not None:
        # among equal-ts right rows the LAST in window order wins, so an
        # ascending tiebreak picks the max — pin it for determinism
        order.append(F.col("_tb").asc_nulls_first())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("_m", F.last("_pay", ignorenulls=True).over(w))
    return matched.filter(F.col("_side") == 1).select(
        *out_cols, *[F.col("_m")[c].alias(f"{prefix}{c}") for c in payload]
    )


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_us: int,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """For each left row, count right rows in the half-open interval
    ``[left.ts - window, left.ts)`` within the same key group (0 when
    none). Banded equi-join: right rows land in bucket
    ``floor(us/window)`` and replicate to bucket+1; every candidate pair
    shares an exact (keys, bucket) equi-key, then the precise range
    predicate filters.
    """
    lw = left.withColumn("_us", F.unix_micros(F.col(left_ts)))
    lb = lw.withColumn("_b", F.floor(F.col("_us") / F.lit(window_us)))
    rw = right.select(
        *[F.col(k) for k in keys], F.unix_micros(F.col(right_ts)).alias("_rus")
    )
    rb = rw.select(
        *keys,
        "_rus",
        F.explode(
            F.array(
                F.floor(F.col("_rus") / F.lit(window_us)),
                F.floor(F.col("_rus") / F.lit(window_us)) + 1,
            )
        ).alias("_b"),
    )
    cond = (F.col("_rus") >= F.col("_us") - F.lit(window_us)) & (
        F.col("_rus") < F.col("_us")
    )
    counts = (
        lb.select(*keys, "_us", "_b").join(rb, on=[*keys, "_b"]).filter(cond)
        .groupBy(*keys, "_us")
        .agg(F.count("*").alias(count_alias))
    )
    return (
        lb.join(counts, on=[*keys, "_us"], how="left")
        .withColumn(count_alias, F.coalesce(F.col(count_alias), F.lit(0)))
        .drop("_us", "_b")
    )
