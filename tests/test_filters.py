"""Filter-compiler tests modeled on the reference's iterator-algebra and
planner suites (rs/index/src/query/iters/mod.rs:66-162,
rs/index/src/query/planner.rs:244-493): literal id lists, hand-computed
intersections/unions, multi-token stemming."""

import pytest
from pyspark.sql import functions as F

from muopdb_spark.filters.compiler import FilterSchema, compile_filter, term_search
from muopdb_spark.functions.text import porter_stem, stemmed_tokens, whitespace_tokens


SCHEMA = FilterSchema({"title": "text", "content": "text", "category": "keyword"})


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc_id, title, content, category
        (1, "alpha running", "the quick fox", "news"),
        (2, "alpha", "running connections fast", "news"),
        (3, "beta", "connections everywhere", "blog"),
        (4, "alpha beta", "quick connections running", "blog"),
        (5, "gamma", "slow snail", "news"),
        (6, "delta", "the fox runs", "misc"),
        (7, "alpha", "fox and fox", "misc"),
        (8, "epsilon", "quick quick", "blog"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, title string, content string, category string")
    for f in ("title", "content"):
        df = df.withColumn(f + "_tokens", stemmed_tokens(F.col(f)))
    return df.cache()


def ids(docs, tree, **kw):
    cond = compile_filter(tree, SCHEMA, **kw)
    return sorted(r["doc_id"] for r in docs.filter(cond).select("doc_id").collect())


def test_porter_examples():
    # the planner test's stemming pairs (planner.rs:443-493)
    assert porter_stem("running") == "run"
    assert porter_stem("connections") == "connect"
    assert porter_stem("quick") == "quick"
    assert porter_stem("ponies") == "poni"
    assert porter_stem("caresses") == "caress"


def test_contains_single_token(docs):
    # "running" stems to run; doc 6 "runs" also stems to run
    assert ids(docs, {"contains": {"path": "content", "value": "running"}}) == [2, 4, 6]


def test_contains_multi_word_stemmed(docs):
    # planner.rs:443-493: "running connections" -> run AND connect
    got = ids(docs, {"contains": {"path": "content", "value": "running connections"}})
    assert got == [2, 4]


def test_keyword_exact(docs):
    assert ids(docs, {"contains": {"path": "category", "value": "news"}}) == [1, 2, 5]
    # keyword is whole-value: no partial match
    assert ids(docs, {"contains": {"path": "category", "value": "new"}}) == []


def test_and_or_algebra(docs):
    got = ids(docs, {
        "and": [
            {"contains": {"path": "title", "value": "alpha"}},
            {"contains": {"path": "content", "value": "quick"}},
        ]
    })
    assert got == [1, 4]
    got = ids(docs, {
        "or": [
            {"contains": {"path": "category", "value": "news"}},
            {"contains": {"path": "category", "value": "blog"}},
        ]
    })
    assert got == [1, 2, 3, 4, 5, 8]


def test_nested_and_or_with_ids(docs):
    # (news ∪ blog) ∩ ids[1,3,5,7]
    got = ids(docs, {
        "and": [
            {"or": [
                {"contains": {"path": "category", "value": "news"}},
                {"contains": {"path": "category", "value": "blog"}},
            ]},
            {"ids": [1, 3, 5, 7]},
        ]
    })
    assert got == [1, 3, 5]


def test_ids_literal(docs):
    assert ids(docs, {"ids": [5, 3, 3, 1]}) == [1, 3, 5]
    assert ids(docs, {"ids": []}) == []


def test_empty_filters_match_nothing(docs):
    # planner.rs:124-148: empty/missing filter -> empty result
    assert ids(docs, {}) == []
    assert ids(docs, None) == []
    assert ids(docs, {"and": []}) == []
    assert ids(docs, {"or": []}) == []
    assert ids(docs, {"contains": {"path": "content", "value": "zzzunknown"}}) == []


def test_not_contains(docs):
    # capability-exceeding: reference declares but todo!()s this (planner.rs:120-123)
    got = ids(docs, {"not_contains": {"path": "category", "value": "news"}})
    assert got == [3, 4, 6, 7, 8]


def test_term_search_limit_and_dedup(docs):
    out = term_search(docs, {"contains": {"path": "content", "value": "quick"}},
                      SCHEMA, limit=2, id_col="doc_id")
    assert [r["doc_id"] for r in out.collect()] == [1, 4]


def test_whitespace_tokenizer(spark):
    df = spark.createDataFrame([("  Hello   World\tfoo\nbar ",)], "s string")
    got = df.select(whitespace_tokens("s").alias("t")).first()["t"]
    assert got == ["hello", "world", "foo", "bar"]
