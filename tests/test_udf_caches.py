"""r17 (r16 VERDICT #4): the module-level UDF memo caches — the
per-language stem memo, the per-merge-list BPE word cache and the
per-vocab unigram word cache — are SIZE-BOUNDED on long-lived reused
Python workers. These tests pin the bounds: per-map generation clears
at the word cap, FIFO eviction at the vocab-count cap, and the
correctness property that a cleared memo still returns identical
encodings (the memos cache pure functions)."""

from __future__ import annotations

import pytest


def test_stem_memo_generation_clear(monkeypatch):
    from muopdb_spark.functions import text as t

    monkeypatch.setattr(t, "_STEM_MEMO_MAX", 4)
    monkeypatch.setitem(t._STEM_MEMO, "x-test-lang", {})
    stem = t._memo_stemmer("x-test-lang", lambda w: w[::-1])
    words = [f"w{i}" for i in range(10)]
    out1 = [stem(w) for w in words]
    memo = t._STEM_MEMO["x-test-lang"]
    assert len(memo) <= 4  # never exceeds the cap
    # repopulating after the clear returns identical values
    assert [stem(w) for w in words] == out1 == [w[::-1] for w in words]
    del t._STEM_MEMO["x-test-lang"]


def test_bpe_word_cache_caps(monkeypatch):
    from muopdb_spark.operators import vocab as v

    monkeypatch.setattr(v, "_BPE_CACHE_MAX_VOCABS", 2)
    monkeypatch.setattr(v, "_BPE_CACHE_MAX_WORDS", 3)
    v._BPE_WORD_CACHE.clear()
    ranks = {("a", "b"): 0}
    # word cap: the per-vocab map generation-clears, results unchanged
    enc = v._bpe_word_encoder("k1", ranks)
    words = [f"ab{i}" for i in range(8)]
    out1 = [enc(w) for w in words]
    assert len(v._BPE_WORD_CACHE["k1"]) <= 3
    assert [enc(w) for w in words] == out1
    assert out1[0] == v.bpe_encode_word("ab0", ranks)
    # vocab cap: FIFO eviction keeps at most 2 vocab maps resident
    for k in ("k2", "k3", "k4"):
        v._bpe_word_encoder(k, ranks)("ab")
    assert len(v._BPE_WORD_CACHE) <= 2
    assert "k1" not in v._BPE_WORD_CACHE  # oldest evicted first
    v._BPE_WORD_CACHE.clear()


def test_unigram_word_cache_caps(monkeypatch):
    from muopdb_spark.operators import unigram as u

    monkeypatch.setattr(u, "_UNIGRAM_CACHE_MAX_VOCABS", 2)
    monkeypatch.setattr(u, "_UNIGRAM_CACHE_MAX_WORDS", 3)
    u._UNIGRAM_WORD_CACHE.clear()
    table = {"a": -1.0, "b": -1.0, "ab": -0.5}
    enc = u._unigram_word_encoder("k1", table, 8)
    words = ["ab", "ba", "aab", "abb", "aa", "bb"]
    out1 = [enc(w) for w in words]
    assert len(u._UNIGRAM_WORD_CACHE["k1"]) <= 3
    assert [enc(w) for w in words] == out1
    assert out1[0] == u.unigram_encode_word("ab", table, max_piece_len=8)
    for k in ("k2", "k3", "k4"):
        u._unigram_word_encoder(k, table, 8)("ab")
    assert len(u._UNIGRAM_WORD_CACHE) <= 2
    assert "k1" not in u._UNIGRAM_WORD_CACHE
    u._UNIGRAM_WORD_CACHE.clear()


def test_bpe_apply_digest_key_is_stable():
    """The digest key derives from the merge-list CONTENT, so two
    equal merge lists share one cache entry (and two different lists
    do not)."""
    import hashlib

    m1 = [("a", "b"), ("ab", "c</w>")]
    m2 = [("a", "b"), ("ab", "d</w>")]
    k1 = hashlib.md5(repr(list(map(tuple, m1))).encode()).hexdigest()
    k1b = hashlib.md5(repr([tuple(p) for p in m1]).encode()).hexdigest()
    k2 = hashlib.md5(repr(list(map(tuple, m2))).encode()).hexdigest()
    assert k1 == k1b and k1 != k2
