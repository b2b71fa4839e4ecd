"""Exact-substring dedup (operators/substring.py) — hand-computable
fixtures pin the sliding-window/island semantics, a brute-force referee
pins the paper-equivalence claim, and the removal step is checked
end-to-end on cleaned text."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from muopdb_spark.operators.substring import (
    duplicate_islands,
    duplicate_span_stats,
    gram_positions,
    remove_duplicate_spans,
)

W = "w{} ".format


def _mkdoc(*idx: int) -> str:
    """Distinct-token text 'w<i> w<j> ...' — spans are easy to reason
    about because token i is just 'w<i>'."""
    return " ".join(f"w{i}" for i in idx)


@pytest.fixture(scope="module")
def corpus(spark):
    # doc 1 and 2 share tokens 100..111 (a 12-token run); doc 3 repeats
    # its own 5-token block three times (k=3 catches it); doc 4 is all
    # unique; doc 5 is shorter than k.
    rows = [
        (1, _mkdoc(*range(100, 112), *range(200, 220))),
        (2, _mkdoc(*range(300, 310), *range(100, 112))),
        (3, _mkdoc(*range(400, 405), *range(400, 405), *range(400, 405))),
        (4, _mkdoc(*range(500, 540))),
        (5, _mkdoc(600, 601)),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_gram_positions_counts(corpus):
    g = gram_positions(corpus, k=10).groupBy("id").count().collect()
    counts = {r["id"]: r["count"] for r in g}
    # doc 1: 32 tokens -> 23 windows; doc 5: 2 tokens < k -> absent
    assert counts[1] == 23 and counts[4] == 31 and 5 not in counts


def test_shared_span_islands(corpus):
    isl = duplicate_islands(corpus, k=10)
    rows = {(r["id"], r["span_start"], r["span_end"]) for r in isl.collect()}
    # docs 1+2 share exactly tokens 100..111: 3 windows starting at the
    # run, merged to ONE island covering 12 tokens at each side's offset
    assert (1, 1, 12) in rows
    assert (2, 11, 22) in rows
    assert not any(i == 4 or i == 5 for (i, _, _) in rows)


def test_stats_fixture(corpus):
    stats = {
        r["doc_id"]: r
        for r in duplicate_span_stats(corpus, k=10).collect()
    }
    assert set(stats) == {1, 2, 3, 4, 5}  # total over input docs
    assert stats[1]["dup_tokens"] == 12 and stats[1]["n_dup_spans"] == 1
    assert stats[2]["dup_tokens"] == 12 and stats[2]["n_dup_grams"] == 3
    assert stats[4]["dup_tokens"] == 0 and stats[4]["dup_frac"] == 0.0
    assert stats[5]["n_tokens"] == 2 and stats[5]["dup_tokens"] == 0
    assert stats[1]["dup_frac"] == round(12 / 32, 6)


def test_within_doc_repetition(corpus):
    # doc 3 = block of 5 tokens x3: with k=3 every window is duplicated
    # (the block repeats), so the whole doc is one island of 15 tokens
    stats = {
        r["doc_id"]: r for r in duplicate_span_stats(corpus, k=3).collect()
    }
    assert stats[3]["dup_tokens"] == 15 and stats[3]["n_dup_spans"] == 1


def test_removal_keeps_first_occurrence(spark):
    shared = _mkdoc(*range(0, 12))
    df = spark.createDataFrame(
        [
            (1, shared + " " + _mkdoc(*range(20, 40))),
            (2, _mkdoc(*range(50, 70)) + " " + shared),
        ],
        ["doc_id", "text"],
    )
    # default (paper semantics): doc 1 holds the FIRST occurrence and
    # keeps it; doc 2's copy is cut — one copy of the content survives
    out = {r["doc_id"]: r for r in remove_duplicate_spans(df, k=10).collect()}
    assert out[1]["text_clean"] == shared + " " + _mkdoc(*range(20, 40))
    assert out[1]["kept_tokens"] == out[1]["n_tokens"] == 32
    assert out[2]["text_clean"] == _mkdoc(*range(50, 70))
    assert out[2]["kept_tokens"] == 20 and out[2]["n_tokens"] == 32


def test_removal_cut_all_occurrences(spark):
    shared = _mkdoc(*range(0, 12))
    df = spark.createDataFrame(
        [
            (1, shared + " " + _mkdoc(*range(20, 40))),
            (2, _mkdoc(*range(50, 70)) + " " + shared),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(df, k=10, keep_first=False).collect()
    }
    assert out[1]["text_clean"] == _mkdoc(*range(20, 40))
    assert out[2]["text_clean"] == _mkdoc(*range(50, 70))
    assert out[1]["kept_tokens"] == 20 and out[1]["n_tokens"] == 32


def test_removal_passthrough(corpus):
    out = {
        r["doc_id"]: r for r in remove_duplicate_spans(corpus, k=10).collect()
    }
    assert out[4]["kept_tokens"] == out[4]["n_tokens"] == 40
    assert out[5]["text_clean"] == "w600 w601"


def test_brute_force_referee(spark, sf_dir):
    """Paper-equivalence on real fixture text: a token is duplicated
    iff SOME k-window containing it occurs >= 2 times corpus-wide —
    checked per token against a brute-force set-of-grams pass."""
    k = 8
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .orderBy("doc_id")
        .limit(60)
        .select("doc_id", "text")
    )
    pdf = docs.toPandas()

    def toks(t):
        import re

        return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]

    from collections import Counter

    grams: Counter = Counter()
    doc_toks = {}
    for _, row in pdf.iterrows():
        ts = toks(row["text"])
        doc_toks[row["doc_id"]] = ts
        for i in range(len(ts) - k + 1):
            grams[" ".join(ts[i : i + k])] += 1

    expected = {}
    for did, ts in doc_toks.items():
        covered = set()
        for i in range(len(ts) - k + 1):
            if grams[" ".join(ts[i : i + k])] >= 2:
                covered.update(range(i, i + k))
        expected[did] = len(covered)

    got = {
        r["doc_id"]: r["dup_tokens"]
        for r in duplicate_span_stats(docs, k=k).collect()
    }
    assert got == expected


def test_union_bound_property(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    bad = (
        duplicate_span_stats(docs, k=10)
        .filter(
            (F.col("dup_tokens") > F.col("n_tokens"))
            | (F.col("dup_tokens") < 0)
            | ((F.col("n_dup_spans") > 0) & (F.col("dup_tokens") < 10))
        )
        .count()
    )
    assert bad == 0


# ---------------------------- token-level decontamination (c2, r10)


def test_decontamination_cuts_only_shared_spans(spark):
    from muopdb_spark.operators.substring import remove_contaminated_spans

    bench = spark.createDataFrame(
        [(100, _mkdoc(*range(0, 8)))], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            # tokens 2..6 of doc 1 = bench tokens 2..6 (one 5-token
            # overlap; k=5 -> exactly that window is cut)
            (1, _mkdoc(900, 901, *range(2, 7), 902, 903)),
            # no overlap: untouched
            (2, _mkdoc(*range(700, 710))),
            # wholly benchmark material: gutted to zero
            (3, _mkdoc(*range(0, 8))),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in remove_contaminated_spans(corpus, bench, k=5).collect()
    }
    assert out[1]["kept_tokens"] == 4
    assert out[1]["text_clean"] == "w900 w901 w902 w903"
    assert out[2]["kept_tokens"] == out[2]["n_tokens"] == 10
    assert out[3]["kept_tokens"] == 0 and out[3]["text_clean"] == ""


def test_decontamination_merges_overlapping_windows(spark):
    from muopdb_spark.operators.substring import remove_contaminated_spans

    # bench holds an 8-token run; the corpus doc embeds it whole, so
    # the 4 sliding k=5 windows merge to ONE maximal 8-token span
    bench = spark.createDataFrame(
        [(100, _mkdoc(*range(0, 8)))], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [(1, _mkdoc(800, *range(0, 8), 801))], ["doc_id", "text"]
    )
    r = remove_contaminated_spans(corpus, bench, k=5).collect()[0]
    assert r["n_tokens"] == 10 and r["kept_tokens"] == 2
    assert r["text_clean"] == "w800 w801"


def test_decontamination_plan_broadcasts_benchmark(spark):
    from muopdb_spark.operators.substring import remove_contaminated_spans

    bench = spark.createDataFrame(
        [(100, _mkdoc(*range(0, 8)))], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [(1, _mkdoc(*range(0, 8)))], ["doc_id", "text"]
    )
    plan = (
        remove_contaminated_spans(corpus, bench, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
