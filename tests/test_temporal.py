"""As-of join and banded range join vs brute-force hand-computed
expectations: boundary inclusivity, tie resolution, no-match nulls,
key isolation, bucket-edge correctness."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from muopdb_spark.operators.temporal import asof_join, range_count_join


def _ts(s: int) -> datetime:
    return datetime(2024, 1, 1) + timedelta(seconds=s)


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        (0, _ts(10), 1.0, 100),
        (0, _ts(20), 2.0, 101),
        (0, _ts(20), 3.0, 102),  # tie on ts -> larger tiebreak (102) wins
        (0, _ts(40), 4.0, 103),
        (7, _ts(15), 9.0, 104),  # other key
    ]
    return spark.createDataFrame(
        rows, "k long, ts timestamp, px double, qid long"
    ).cache()


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        (0, _ts(5), 200),    # before any quote -> null
        (0, _ts(20), 201),   # equal ts -> inclusive, tie -> qid 102
        (0, _ts(39), 202),   # latest quote at 20 -> 3.0
        (0, _ts(50), 203),
        (7, _ts(16), 204),   # matches only key-7 quote
        (8, _ts(99), 205),   # key with no quotes -> null
    ]
    return spark.createDataFrame(rows, "k long, ts timestamp, tid long").cache()


def test_asof_backward_inclusive_ties(quotes, trades):
    out = asof_join(
        trades, quotes, keys=["k"], ts="ts", payload=["px", "qid"],
        tiebreak="qid",
    )
    got = {r["tid"]: (r["asof_px"], r["asof_qid"]) for r in out.collect()}
    assert got[200] == (None, None)
    assert got[201] == (3.0, 102)  # inclusive boundary + max-tiebreak tie
    assert got[202] == (3.0, 102)
    assert got[203] == (4.0, 103)
    assert got[204] == (9.0, 104)  # key isolation
    assert got[205] == (None, None)
    assert out.count() == 6  # every left row survives exactly once


def test_asof_keeps_left_columns(quotes, trades):
    out = asof_join(trades, quotes, keys=["k"], payload=["px"])
    assert out.columns == ["k", "ts", "tid", "asof_px"]


def test_reserved_column_names_survive(spark, quotes, trades):
    """Inputs that already use the operators' former internal names
    (_side, _b, _us...) must pass through untouched — internal working
    columns are generated collision-free."""
    t2 = trades.withColumn("_side", F.lit(77)).withColumn("_b", F.lit(88))
    out = asof_join(t2, quotes, keys=["k"], payload=["px"], tiebreak="qid")
    rows = {r["tid"]: r for r in out.collect()}
    assert all(r["_side"] == 77 and r["_b"] == 88 for r in rows.values())
    assert rows[202]["asof_px"] == 3.0
    out2 = range_count_join(
        t2, quotes, keys=["k"], left_ts="ts", right_ts="ts",
        window_us=15_000_000,
    )
    rows2 = {r["tid"]: r for r in out2.collect()}
    assert all(r["_side"] == 77 and r["_b"] == 88 for r in rows2.values())


def test_range_count_halfopen_window(spark, trades, quotes):
    # count quotes in [trade.ts - 15s, trade.ts) per key
    out = range_count_join(
        trades, quotes, keys=["k"], window_us=15_000_000
    )
    got = {r["tid"]: r["n_in_range"] for r in out.collect()}
    # trade@5: window [-10, 5) -> no quotes
    # trade@20: [5, 20) -> quote@10 only (boundary 20 excluded)
    # trade@39: [24, 39) -> none (20 is out, 40 is future)
    # trade@50: [35, 50) -> quote@40
    assert got == {200: 0, 201: 1, 202: 0, 203: 1, 204: 1, 205: 0}


def test_range_count_bucket_edges(spark):
    # right rows exactly one bucket behind must still be found
    left = spark.createDataFrame(
        [(0, _ts(30), 1)], "k long, ts timestamp, lid long"
    )
    right = spark.createDataFrame(
        [(0, _ts(21), 1), (0, _ts(29), 2), (0, _ts(30), 3)],
        "k long, ts timestamp, rid long",
    )
    out = range_count_join(left, right, keys=["k"], window_us=10_000_000)
    assert out.collect()[0]["n_in_range"] == 2  # 21 and 29; 30 excluded


def test_plans_are_equi_joins(quotes, trades):
    """Neither operator may degrade to a nested-loop join."""
    a = asof_join(trades, quotes, keys=["k"], payload=["px"])
    r = range_count_join(trades, quotes, keys=["k"], window_us=1_000_000)
    for df in (a, r):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_range_count_duplicate_left_rows_not_inflated(spark):
    """r16 review fix: two left rows sharing (key, ts) each joined
    every candidate before the aggregate, so both reported DOUBLE
    their true in-range count."""
    import pyspark.sql.functions as F

    from muopdb_spark.operators.temporal import range_count_join

    left = spark.createDataFrame(
        [(1, 1_000_000), (1, 1_000_000), (1, 3_000_000)],
        "uid long, us long",
    ).select("uid", F.timestamp_micros("us").alias("ts"))
    right = spark.createDataFrame(
        [(1, 500_000), (1, 900_000)], "uid long, us long"
    ).select("uid", F.timestamp_micros("us").alias("ts"))
    out = range_count_join(left, right, keys=["uid"], window_us=1_000_000)
    got = sorted(
        (r["us"], r["n_in_range"])
        for r in out.withColumn("us", F.unix_micros("ts")).collect()
    )
    assert got == [(1_000_000, 2), (1_000_000, 2), (3_000_000, 0)]
