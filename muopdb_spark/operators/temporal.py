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


def _private_names(taken: set[str], *bases: str) -> dict[str, str]:
    """Internal working-column names guaranteed absent from the inputs —
    a left table that already has a `_side` or `_b` column must not be
    silently overwritten/joined on."""
    out = {}
    for base in bases:
        name, i = base, 0
        while name in taken:
            i += 1
            name = f"{base}_{i}"
        taken = taken | {name}
        out[base] = name
    return out


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
    n = _private_names(set(left.columns) | set(right.columns), "_pay", "_side", "_tb", "_m")
    pay_struct = F.struct(*[F.col(c).alias(c) for c in payload])
    r_cols = [
        *[F.col(k) for k in keys],
        F.col(ts).alias(ts),
        pay_struct.alias(n["_pay"]),
        F.lit(0).alias(n["_side"]),
    ]
    if tiebreak is not None:
        # carry the RIGHT side's tiebreak under a private name — a bare
        # union would null it out (left owns the original column name)
        r_cols.append(F.col(tiebreak).alias(n["_tb"]))
    r = right.select(*r_cols)
    l = left.withColumn(n["_side"], F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    order = [F.col(ts).asc(), F.col(n["_side"]).asc()]
    if tiebreak is not None:
        # among equal-ts right rows the LAST in window order wins, so an
        # ascending tiebreak picks the max — pin it for determinism
        order.append(F.col(n["_tb"]).asc_nulls_first())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn(n["_m"], F.last(n["_pay"], ignorenulls=True).over(w))
    return matched.filter(F.col(n["_side"]) == 1).select(
        *out_cols, *[F.col(n["_m"])[c].alias(f"{prefix}{c}") for c in payload]
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
    n = _private_names(
        set(left.columns) | set(right.columns) | {count_alias}, "_us", "_rus", "_b"
    )
    US, RUS, B = n["_us"], n["_rus"], n["_b"]
    lw = left.withColumn(US, F.unix_micros(F.col(left_ts)))
    lb = lw.withColumn(B, F.floor(F.col(US) / F.lit(window_us)))
    rw = right.select(
        *[F.col(k) for k in keys], F.unix_micros(F.col(right_ts)).alias(RUS)
    )
    rb = rw.select(
        *keys,
        RUS,
        F.explode(
            F.array(
                F.floor(F.col(RUS) / F.lit(window_us)),
                F.floor(F.col(RUS) / F.lit(window_us)) + 1,
            )
        ).alias(B),
    )
    cond = (F.col(RUS) >= F.col(US) - F.lit(window_us)) & (
        F.col(RUS) < F.col(US)
    )
    # the count is a function of (keys, ts) alone — DISTINCT the probe
    # side before the candidate join (r16 review fix: duplicate left
    # rows each joined every candidate, so two rows sharing (key, ts)
    # both reported DOUBLE their true count; dedup also shrinks the
    # join's left side for free)
    counts = (
        lb.select(*keys, US, B).distinct()
        .join(rb, on=[*keys, B]).filter(cond)
        .groupBy(*keys, US)
        .agg(F.count("*").alias(count_alias))
    )
    return (
        lb.join(counts, on=[*keys, US], how="left")
        .withColumn(count_alias, F.coalesce(F.col(count_alias), F.lit(0)))
        .drop(US, B)
    )
