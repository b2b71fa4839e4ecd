"""Unigram-LM tokenizer (operators/unigram.py, Kudo 2018): lattice
numerics cross-checked against brute-force enumeration, training
invariants (segmentability, size bound, determinism), Viterbi
encode properties, and Spark apply == pure-Python referee."""

from __future__ import annotations

import itertools
import math

import pytest

from muopdb_spark.operators.unigram import (
    _forward_backward,
    unigram_apply,
    unigram_encode_word,
    unigram_train,
    unigram_train_on_words,
)


def _enumerate_segmentations(word, pieces):
    """All segmentations of `word` into pieces from `pieces`."""
    n = len(word)
    outs = []

    def rec(i, acc):
        if i == n:
            outs.append(list(acc))
            return
        for k in range(i + 1, n + 1):
            if word[i:k] in pieces:
                acc.append(word[i:k])
                rec(k, acc)
                acc.pop()

    rec(0, [])
    return outs


def test_forward_backward_equals_enumeration():
    logp = {
        "a": math.log(0.3), "b": math.log(0.2), "ab": math.log(0.25),
        "ba": math.log(0.15), "aba": math.log(0.1),
    }
    word = "abab"
    z, posts = _forward_backward(word, logp, 8)
    segs = _enumerate_segmentations(word, set(logp))
    probs = [math.exp(sum(logp[p] for p in s)) for s in segs]
    assert z == pytest.approx(math.log(sum(probs)), rel=1e-12)
    # posterior of each piece occurrence = sum of seg probs containing
    # it at that slot / Z; compare aggregate per piece
    agg = {}
    for s, pr in zip(segs, probs):
        for p in s:
            agg[p] = agg.get(p, 0.0) + pr / sum(probs)
    got = {}
    for p, post in posts:
        got[p] = got.get(p, 0.0) + post
    for p in agg:
        assert got[p] == pytest.approx(agg[p], rel=1e-9), p


def test_forward_backward_unreachable():
    z, posts = _forward_backward("xyz", {"a": 0.0}, 8)
    assert z == float("-inf") and posts == []


def test_viterbi_matches_bruteforce():
    logp = {
        "h": -3.0, "e": -3.1, "l": -3.2, "o": -3.3, "he": -2.0,
        "ll": -2.2, "llo": -1.8, "hell": -1.5, "hello": -4.9,
    }
    for word in ("hello", "hell", "lo", "ohe"):
        segs = _enumerate_segmentations(word, set(logp))
        if not segs:
            continue
        best = max(segs, key=lambda s: (sum(logp[p] for p in s),))
        got = unigram_encode_word(word, logp)
        assert sum(logp[p] for p in got) == pytest.approx(
            sum(logp[p] for p in best)
        ), word


def test_encode_roundtrip_and_unknown_chars():
    logp = {"a": -1.0, "b": -1.5, "ab": -0.7}
    assert "".join(unigram_encode_word("abab", logp)) == "abab"
    # unknown char passes through as itself
    out = unigram_encode_word("axb", logp)
    assert "".join(out) == "axb" and "x" in out
    assert unigram_encode_word("", logp) == []


def test_train_invariants():
    words = {
        "spark": 50, "sparks": 20, "sharding": 10, "shard": 30,
        "sharks": 5, "park": 25, "parking": 8,
    }
    vocab = unigram_train_on_words(words, 24)
    assert len(vocab) <= max(24, len({c for w in words for c in w}))
    # all single chars survive -> every word segmentable + roundtrips
    for w in words:
        pieces = unigram_encode_word(w, vocab)
        assert "".join(pieces) == w
    # probabilities normalize
    total = sum(math.exp(lp) for lp in vocab.values()
                if lp > float("-inf"))
    assert total == pytest.approx(1.0, rel=1e-9)
    # a frequent multi-char piece was actually learned
    assert any(len(p) > 1 for p in vocab)
    # determinism
    assert unigram_train_on_words(words, 24) == vocab


def test_train_errors():
    with pytest.raises(ValueError, match="vocab_size"):
        unigram_train_on_words({"a": 1}, 0)
    with pytest.raises(ValueError, match="shrink"):
        unigram_train_on_words({"a": 1}, 5, shrink=1.5)
    with pytest.raises(ValueError, match="empty"):
        unigram_train_on_words({}, 5)


def test_spark_train_and_apply_match_referee(spark):
    rows = [
        (i, f"sparking sharding {'spark' if i % 2 else 'shard'} data "
            f"spark shard parking")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = unigram_train(df, vocab_size=30)
    out = {r["doc_id"]: r["toks"] for r in
           unigram_apply(df, vocab, out_col="toks").collect()}
    import re

    for i, text in rows:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        want = [p for t in toks for p in unigram_encode_word(t, vocab)]
        assert out[i] == want, i
    # encoded stream reassembles the token stream
    for i, text in rows:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        assert "".join(out[i]) == "".join(toks)


def test_apply_is_arrow_not_row_python(spark):
    df = spark.createDataFrame([(0, "spark shard")],
                               "doc_id long, text string")
    vocab = unigram_train_on_words({"spark": 2, "shard": 1}, 12)
    plan = unigram_apply(df, vocab)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
