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


def test_incremental_minhash_vs_full(docs):
    """Incremental (new batch vs corpus artifact) must agree exactly with
    the corpus-wide run restricted to cross pairs: same candidate rule,
    same verification."""
    from muopdb_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_signature_df,
    )

    corpus = docs.filter(F.col("doc_id") <= 3)
    new = docs.filter(F.col("doc_id") > 3)
    sigs = minhash_signature_df(corpus).drop("sh")
    inc = {
        (r["new_id"], r["corpus_id"]): (r["est_jaccard"], r["jaccard"])
        for r in incremental_minhash_pairs(
            new, sigs, corpus, threshold=0.5
        ).collect()
    }
    full = {
        (r["doc_b"], r["doc_a"]): (r["est_jaccard"], r["jaccard"])
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
        if r["doc_a"] <= 3 < r["doc_b"]
    }
    assert inc == full
    # doc 4 is the near-dup of 1/2/3; 5 and 6 must never pair
    assert all(nid == 4 for nid, _ in inc)


def test_incremental_minhash_exact_dup_across_batches(spark):
    from muopdb_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_signature_df,
    )

    corpus = spark.createDataFrame(
        [(1, BASE), (2, OTHER)], "doc_id long, text string"
    )
    new = spark.createDataFrame([(10, BASE)], "doc_id long, text string")
    out = incremental_minhash_pairs(
        new, minhash_signature_df(corpus).drop("sh"), corpus, threshold=0.8
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["new_id"], r["corpus_id"]) == (10, 1)
    assert r["est_jaccard"] == 1.0 and r["jaccard"] == 1.0


def test_passage_dedup_stats(spark):
    from muopdb_spark.operators.dedup import passage_dedup_stats

    p1 = "a b c d e"           # one passage (k=5)
    p2 = "f g h i j"
    p3 = "k l m n o"
    rows = [
        (1, f"{p1} {p2}"),     # shares p1 with doc 2, p2 with nobody
        (2, f"{p1} {p3}"),     # shares p1 with doc 1
        (3, p3),               # shares p3 with doc 2
        (4, "z z z"),          # 3 tokens -> 1 short passage, unique
        (5, ""),               # no tokens -> excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in passage_dedup_stats(df, k=5).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert (out[1]["n_passages"], out[1]["n_dup_passages"]) == (2, 1)
    assert out[1]["dup_frac"] == 0.5
    assert (out[2]["n_passages"], out[2]["n_dup_passages"]) == (2, 2)
    assert out[2]["dup_frac"] == 1.0
    assert (out[3]["n_passages"], out[3]["n_dup_passages"]) == (1, 1)
    assert (out[4]["n_passages"], out[4]["n_dup_passages"]) == (1, 0)


def test_passage_dedup_tail_passage_is_its_own_window(spark):
    """Tail shorter than k is a distinct passage, not merged/dropped —
    'a b c | d' with k=3 shares nothing with 'd a b c' windows."""
    from muopdb_spark.operators.dedup import passage_dedup_stats

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "d a b c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in passage_dedup_stats(df, k=3).collect()}
    assert out[1]["n_passages"] == 2 and out[1]["n_dup_passages"] == 0
    assert out[2]["n_passages"] == 2 and out[2]["n_dup_passages"] == 0


def test_embedding_near_dup_entrypoint_routing(spark):
    """dedup --method embedding default = RP-LSH + exact verify;
    exact=True = the all-pairs referee. Pins: (a) exact=True is
    value-identical to embedding_near_dup_pairs, (b) the default path
    finds every planted EXACT duplicate (identical vectors always
    collide in every table), (c) the default path is a subset of the
    referee with identical cosines (precision 1.0 by exact verify)."""
    import numpy as np

    from muopdb_spark.operators.dedup import embedding_near_dup

    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 8))
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    rows += [(100 + i, [float(x) for x in base[i]]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    ref = {(r["id_a"], r["id_b"]): r["cosine"] for r in
           embedding_near_dup(df, threshold=0.95, exact=True).collect()}
    ref_direct = {(r["id_a"], r["id_b"]): r["cosine"] for r in
                  embedding_near_dup_pairs(df, threshold=0.95).collect()}
    assert ref == ref_direct

    lsh = {(r["id_a"], r["id_b"]): r["cosine"] for r in
           embedding_near_dup(df, threshold=0.95).collect()}
    assert set(lsh) <= set(ref)
    for k, v in lsh.items():
        assert v == ref[k]
    planted = {(i, 100 + i) for i in range(6)}
    assert planted <= set(lsh)
