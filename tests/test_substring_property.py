"""Property-based gates (hypothesis) for the r7 text operators:
exact-substring span stats vs a direct Python reference over random
small corpora (random k, repeated tokens, empty docs — shapes beyond
the hand fixtures), and vocab counts vs collections.Counter."""

from __future__ import annotations

import pytest

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from muopdb_spark.operators.substring import duplicate_span_stats
from muopdb_spark.operators.vocab import token_vocab

# tiny alphabet forces collisions/repeats; docs up to 30 tokens
_tok = st.sampled_from(["aa", "bb", "cc", "dd"])
_doc = st.lists(_tok, min_size=0, max_size=30).map(" ".join)


def _py_span_stats(texts: list[str], k: int) -> dict[int, tuple[int, int]]:
    """doc_id -> (n_tokens, dup_tokens) by brute force."""
    toks = {i: [t for t in txt.split() if t] for i, txt in enumerate(texts)}
    grams: Counter = Counter()
    for ts in toks.values():
        for i in range(len(ts) - k + 1):
            grams[" ".join(ts[i : i + k])] += 1
    out = {}
    for did, ts in toks.items():
        covered: set[int] = set()
        for i in range(len(ts) - k + 1):
            if grams[" ".join(ts[i : i + k])] >= 2:
                covered.update(range(i, i + k))
        out[did] = (len(ts), len(covered))
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(_doc, min_size=1, max_size=6),
    k=st.sampled_from([1, 2, 3, 5]),
)
@pytest.mark.slow
def test_span_stats_match_bruteforce(spark, texts, k):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"])
        for r in duplicate_span_stats(df, k=k).collect()
    }
    assert got == _py_span_stats(texts, k)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_doc, min_size=1, max_size=6))
@pytest.mark.slow
def test_vocab_counts_match_counter(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    expect = Counter(t for txt in texts for t in txt.split() if t)
    got = {r["token"]: r["count"] for r in token_vocab(df).collect()}
    assert got == dict(expect)
    # rank is the (count desc, token asc) total order
    rows = sorted(
        token_vocab(df).collect(), key=lambda r: r["rank"]
    )
    assert [r["token"] for r in rows] == sorted(
        expect, key=lambda t: (-expect[t], t)
    )
