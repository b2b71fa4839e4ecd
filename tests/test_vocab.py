"""Vocabulary building (operators/vocab.py): hand-checkable counts,
deterministic tie ranking, budget/min-count truncation, and the
map-side-combine plan shape."""

from __future__ import annotations

from muopdb_spark.operators.vocab import pair_vocab, token_vocab


def _df(spark, *texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_token_counts_and_rank(spark):
    df = _df(spark, "a b a c", "b a, B!")
    rows = {r["token"]: r for r in token_vocab(df).collect()}
    assert rows["a"]["count"] == 3 and rows["b"]["count"] == 3
    assert rows["c"]["count"] == 1
    # tie at count 3 breaks lexicographically: a before b
    assert rows["a"]["rank"] == 1 and rows["b"]["rank"] == 2


def test_top_k_and_min_count(spark):
    df = _df(spark, "x x x y y z")
    top = token_vocab(df, top_k=2).collect()
    assert [r["token"] for r in top] == ["x", "y"]
    assert [r["rank"] for r in top] == [1, 2]
    kept = token_vocab(df, min_count=2).collect()
    assert {r["token"] for r in kept} == {"x", "y"}


def test_pair_counts(spark):
    df = _df(spark, "a b c", "a b d")
    rows = {(r["left"], r["right"]): r["count"] for r in pair_vocab(df).collect()}
    assert rows[("a", "b")] == 2
    assert rows[("b", "c")] == 1 and rows[("b", "d")] == 1
    # single-token / empty docs emit no pairs
    assert pair_vocab(_df(spark, "solo", "")).count() == 0


def test_rank_is_partition_invariant(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = token_vocab(docs.repartition(1), top_k=50).collect()
    b = token_vocab(docs.repartition(7), top_k=50).collect()
    assert [(r["token"], r["count"], r["rank"]) for r in a] == [
        (r["token"], r["count"], r["rank"]) for r in b
    ]


def test_plan_no_corpus_sort(spark, sf_dir):
    """The vocab budget must cut with TakeOrderedAndProject (heap
    top-k), not a global sort of the corpus token stream."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        token_vocab(docs, top_k=100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
