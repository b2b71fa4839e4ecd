"""Bigram-LM perplexity scoring (operators/lm.py).

Hand-computed probabilities on a 3-doc corpus, empty-doc handling, and
the vocab-cap / OOV-fold contract for scoring new streams against a
trained LM."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from muopdb_spark.operators.lm import (
    UNK,
    bigram_stream,
    lm_bits_per_token,
    score_bits_per_token,
    train_bigram_lm,
)


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, ""), (5, None)],
        ["doc_id", "text"],
    )


def test_bigram_stream(spark, tiny):
    rows = {
        (r.id, r.w1, r.w2)
        for r in bigram_stream(tiny, text_col="text", id_col="doc_id").collect()
    }
    assert rows == {
        (1, "<s>", "a"), (1, "a", "b"),
        (2, "<s>", "a"), (2, "a", "b"),
        (3, "<s>", "a"), (3, "a", "c"),
    }


def test_hand_computed_bits(spark, tiny):
    # corpus bigrams: (<s>,a)x3, (a,b)x2, (a,c)x1
    # contexts: c(<s>)=3, c(a)=3; vocab V = |{a,b,c}| = 3; k=0.5
    k, V = 0.5, 3.0
    p_sa = (3 + k) / (3 + k * V)  # P(a|<s>)
    p_ab = (2 + k) / (3 + k * V)
    p_ac = (1 + k) / (3 + k * V)
    exp1 = -(math.log2(p_sa) + math.log2(p_ab)) / 2
    exp3 = -(math.log2(p_sa) + math.log2(p_ac)) / 2
    got = {
        r.doc_id: (r.n_bigrams, r.bits_per_token)
        for r in lm_bits_per_token(tiny, k=k).collect()
    }
    assert got[1] == (2, round(exp1, 6))
    assert got[2] == got[1]
    assert got[3] == (2, round(exp3, 6))
    # token-less docs: present, zero bigrams, 0.0 bits
    assert got[4] == (0, 0.0)
    assert got[5] == (0, 0.0)


def test_vocab_cap_folds_oov(spark):
    df = spark.createDataFrame(
        [(1, "x x x y"), (2, "x y z")], ["doc_id", "text"]
    )
    uni, big, vocab, keep = train_bigram_lm(df, vocab_size=2)
    kept = {r.tok for r in keep.collect()}
    # top-2 next-words by count: x(3), y(2) — z folds to <unk>
    assert kept == {"x", "y"}
    big_rows = {(r.w1, r.w2) for r in big.collect()}
    assert ("y", UNK) in big_rows
    assert all("z" not in pair for pair in big_rows)
    # vocab size counts the folded alphabet
    assert vocab.collect()[0].vs == 3.0  # {x, y, <unk>}
    # scoring a NEW stream folds with the same keep list — an unseen
    # token scores as <unk>, never as itself
    new = spark.createDataFrame([(9, "x q")], ["doc_id", "text"])
    scored = score_bits_per_token(new, uni, big, vocab, keep=keep)
    row = scored.collect()[0]
    assert row.n_bigrams == 2 and row.bits_per_token > 0


def test_unseen_bigrams_get_addk_floor(spark, tiny):
    uni, big, vocab, _ = train_bigram_lm(tiny)
    new = spark.createDataFrame([(9, "c a")], ["doc_id", "text"])
    # (<s>,c) unseen, (c,a) has unseen context c -> both floor terms
    row = score_bits_per_token(new, uni, big, vocab, k=0.5).collect()[0]
    k, V = 0.5, 3.0
    floor_seen_ctx = -math.log2(k / (3 + k * V))  # c(<s>)=3, c12=0
    floor_no_ctx = -math.log2(k / (0 + k * V))  # unseen context
    exp = (floor_seen_ctx + floor_no_ctx) / 2
    assert row.bits_per_token == round(exp, 6)


def test_plan_shape(spark, tiny):
    # the only Python in the plan is the Arrow-batched bigram pass —
    # never a row-at-a-time PythonUDF. Broadcast contract (ADVICE r5):
    # vocab-CAPPED scoring force-broadcasts the bounded count tables;
    # the uncapped self-train path must NOT hint them (unbounded at
    # scale) — AQE picks broadcast at runtime when they measure small.
    df = lm_bits_per_token(tiny)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, plan
    df.collect()  # finalize the adaptive plan
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in final  # AQE converted the small tables

    uni, big, vocab, keep = train_bigram_lm(tiny, vocab_size=2)
    capped = score_bits_per_token(tiny, uni, big, vocab, keep=keep)
    cplan = capped._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in cplan  # hinted at planning time


def test_ppl_buckets_exact_boundaries(spark):
    """Integer-arithmetic bucket boundaries: 9 docs per lang -> exactly
    3 head / 3 middle / 3 tail, ordered by (bits, id)."""
    from muopdb_spark.operators.lm import perplexity_buckets

    rows = [(lang_i * 100 + i, f"l{lang_i}", float(i))
            for lang_i in range(2) for i in range(9)]
    scored = spark.createDataFrame(
        rows, "doc_id long, lang string, bits_per_token double"
    )
    out = perplexity_buckets(scored).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(
            (r["bits_per_token"], r["ppl_bucket"])
        )
    for lang, pairs in by_lang.items():
        pairs.sort()
        assert [b for _, b in pairs] == (
            ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
        )


def test_ppl_buckets_approx_matches_exact(spark, sf_dir):
    """The no-window scale path agrees with the exact rank form up to
    boundary-score ties (same tolerance contract as t11's approx)."""
    from pyspark.sql import functions as F

    from muopdb_spark.operators.lm import (
        lm_bits_per_token,
        perplexity_buckets,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = lm_bits_per_token(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    ).select(
        "doc_id", "lang", F.round("bits_per_token", 6).alias("bits_per_token")
    ).localCheckpoint(eager=True)

    exact = {(r["doc_id"], r["ppl_bucket"])
             for r in perplexity_buckets(scored).collect()}
    approx = {(r["doc_id"], r["ppl_bucket"])
              for r in perplexity_buckets(scored, approx=True).collect()}
    n = scored.count()
    agree = len(exact & approx)
    assert agree / n >= 0.95, f"only {agree}/{n} bucket assignments agree"

    # the approx plan must carry no language-partitioned window
    plan = (
        perplexity_buckets(scored, approx=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
