import math

import pytest
from pyspark.sql import functions as F

from muopdb_spark.functions.distance import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_squared,
    neg_dot_distance,
    score_expr,
)


@pytest.fixture(scope="module")
def pairs(spark):
    rows = [
        (1, [0.0, 0.0, 0.0], [3.0, 4.0, 0.0]),
        (2, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),
        (3, [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "id long, a array<float>, b array<float>")


def _one(df, col, rid):
    return df.filter(F.col("id") == rid).select(col.alias("v")).first()["v"]


def test_l2(pairs):
    assert _one(pairs, l2_distance("a", "b"), 1) == pytest.approx(5.0)
    assert _one(pairs, l2_distance("a", "b"), 2) == pytest.approx(0.0)
    assert _one(pairs, l2_squared("a", "b"), 1) == pytest.approx(25.0)


def test_dot_negation(pairs):
    # lower = closer: identical vectors give the most negative score
    assert _one(pairs, dot_product("a", "b"), 2) == pytest.approx(14.0)
    assert _one(pairs, neg_dot_distance("a", "b"), 2) == pytest.approx(-14.0)
    assert _one(pairs, neg_dot_distance("a", "b"), 3) == pytest.approx(0.0)


def test_cosine(pairs):
    assert _one(pairs, cosine_similarity("a", "b"), 2) == pytest.approx(1.0)
    assert _one(pairs, cosine_similarity("a", "b"), 3) == pytest.approx(0.0)


def test_registry(pairs):
    assert _one(pairs, score_expr("l2", "a", "b"), 1) == pytest.approx(5.0)
    with pytest.raises(ValueError):
        score_expr("hamming", "a", "b")


def test_nan_sorts_last(spark):
    # ordering contract utils.rs:95-113: NaN last in ascending order
    df = spark.createDataFrame(
        [(1, float("nan")), (2, 0.5), (3, 2.0)], "id long, score double"
    )
    got = [r["id"] for r in df.orderBy(F.col("score").asc_nulls_last(), "id").collect()]
    assert got == [2, 3, 1]
