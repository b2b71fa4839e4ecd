"""Dedup suite tests on hand-crafted duplicates where ground truth is
known by construction."""

import pytest
from pyspark.sql import functions as F

from muopdb_spark.operators.dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_table,
    word_shingles,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tonight"  # 1 word differs
OTHER = "completely different content about spark dataframes and shuffles everywhere"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),                      # exact dup of 1
        (3, "  THE  quick brown fox jumps over the lazy dog again and again today "),  # ws/case dup of 1
        (4, NEAR),                      # near dup of 1
        (5, OTHER),
        (6, "tiny"),                    # < 3 tokens -> no shingles
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(docs):
    out = {r["doc_id"]: r for r in exact_dedup(docs).collect()}
    assert out[1]["group_size"] == 3 and out[1]["is_canonical"]
    assert out[2]["group_size"] == 3 and not out[2]["is_canonical"]
    assert out[3]["group_size"] == 3 and not out[3]["is_canonical"]
    assert out[4]["group_size"] == 1 and out[4]["is_canonical"]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    got = df.select(word_shingles("text", 3).alias("sh")).collect()
    assert sorted(got[0]["sh"]) == ["a b c", "b c d"]
    assert got[1]["sh"] == []


def test_ngram_jaccard_pairs(docs):
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert out[(1, 2)] == 1.0 and out[(1, 3)] == 1.0 and out[(2, 3)] == 1.0
    # 1 vs 4: 13 tokens -> 11 shingles each, last 3 shingles differ
    assert (1, 4) in out and 0.5 < out[(1, 4)] < 1.0
    assert not any(5 in pair or 6 in pair for pair in out)


def test_minhash_lsh_finds_planted_dups(docs):
    out = {(r["doc_a"], r["doc_b"]): r for r in
           minhash_lsh_pairs(docs, threshold=0.5).collect()}
    # exact dups always collide in every band and have est == 1.0
    assert out[(1, 2)]["est_jaccard"] == 1.0 and out[(1, 2)]["jaccard"] == 1.0
    assert (1, 3) in out and (2, 3) in out
    # near-dup pair passes only if some band collided; with 10/14 shared
    # shingles it usually does — but never a false positive vs OTHER
    assert not any(5 in pair for pair in out)


def test_simhash_identical_for_same_token_set(docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash_table(docs).collect()}
    assert sh[1] == sh[2] == sh[3]          # same token set
    assert 0 <= sh[1] < 2 ** 16
    assert sh[1] != sh[5]
    # near-dup should be within a few bits
    ham = bin(sh[1] ^ sh[4]).count("1")
    assert ham <= 6


def test_embedding_near_dup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near dup of 1
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {(r["id_a"], r["id_b"]) for r in
           embedding_near_dup_pairs(df, threshold=0.95).collect()}
    assert out == {(1, 2)}
