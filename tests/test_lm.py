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


# ------------------------------------------------- r15: Kneser-Ney


def _kn_reference(train_texts, score_texts, d=0.75):
    """Independent pure-Python interpolated-KN replica (built from the
    Chen & Goodman formulation, structured nothing like the Spark
    operator) — per-doc (n_bigrams, bits)."""
    import re
    from collections import Counter, defaultdict

    def toks(t):
        return ["<s>"] + re.findall(r"[a-z0-9]+", t.lower())

    big = Counter()
    for t in train_texts:
        ws = toks(t)
        for i in range(len(ws) - 1):
            big[(ws[i], ws[i + 1])] += 1
    c1 = defaultdict(float)
    n1f = defaultdict(int)
    n1b = defaultdict(int)
    for (w1, w2), c in big.items():
        c1[w1] += c
        n1f[w1] += 1
        n1b[w2] += 1
    n1t = float(len(big))
    vs = float(len({w2 for _, w2 in big}))

    def p(w1, w2):
        pc = (n1b[w2] / n1t) if w2 in n1b else 1.0 / vs
        if c1.get(w1, 0) > 0:
            return (max(big.get((w1, w2), 0) - d, 0.0) / c1[w1]
                    + d * n1f[w1] / c1[w1] * pc)
        return pc

    out = []
    for t in score_texts:
        ws = toks(t)
        bits = [-math.log2(p(ws[i], ws[i + 1]))
                for i in range(len(ws) - 1)]
        out.append((len(bits),
                    round(sum(bits) / len(bits), 6) if bits else 0.0))
    return out


TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "san francisco is a city",
    "the city of san francisco",
]


def test_kn_matches_independent_reference(spark):
    from muopdb_spark.operators.lm import (
        score_kn_bits_per_token,
        train_kn_lm,
    )

    docs = spark.createDataFrame(
        list(enumerate(TRAIN)), "doc_id long, text string"
    )
    big, ctx, cont, totals, keep = train_kn_lm(docs)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["kn_bits_per_token"])
        for r in score_kn_bits_per_token(
            docs, big, ctx, cont, totals
        ).collect()
    }
    want = _kn_reference(TRAIN, TRAIN)
    for i, w in enumerate(want):
        assert got[i] == w, (i, got[i], w)


def test_kn_unseen_context_and_word_branches(spark):
    """Foreign scoring stream: an unseen CONTEXT backs off to the
    continuation probability; an unseen WORD gets the 1/|vocab|
    uniform floor — both branches against the independent replica."""
    from muopdb_spark.operators.lm import (
        score_kn_bits_per_token,
        train_kn_lm,
    )

    foreign = [
        "zebra the cat",          # unseen context 'zebra'
        "the qqq sat",            # unseen word 'qqq'
        "qqq zzz",                # everything unseen
    ]
    train = spark.createDataFrame(
        list(enumerate(TRAIN)), "doc_id long, text string"
    )
    score = spark.createDataFrame(
        list(enumerate(foreign)), "doc_id long, text string"
    )
    big, ctx, cont, totals, keep = train_kn_lm(train)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["kn_bits_per_token"])
        for r in score_kn_bits_per_token(
            score, big, ctx, cont, totals
        ).collect()
    }
    want = _kn_reference(TRAIN, foreign)
    for i, w in enumerate(want):
        assert got[i] == w, (i, got[i], w)


def test_kn_distribution_normalizes():
    """For any seen context, interpolated-KN sums to exactly 1 over
    the seen vocabulary — the property that makes it a probability
    model (checked on the reference replica the operator is pinned
    to)."""
    import re
    from collections import Counter

    big = Counter()
    for t in TRAIN:
        ws = ["<s>"] + re.findall(r"[a-z0-9]+", t.lower())
        for i in range(len(ws) - 1):
            big[(ws[i], ws[i + 1])] += 1
    vocab = {w2 for _, w2 in big}
    n1t = len(big)
    n1b = Counter(w2 for _, w2 in big)
    d = 0.75
    for w1 in {w for w, _ in big}:
        c1 = sum(c for (a, _), c in big.items() if a == w1)
        n1f = sum(1 for (a, _) in big if a == w1)
        total = sum(
            max(big.get((w1, w2), 0) - d, 0.0) / c1
            + d * n1f / c1 * (n1b[w2] / n1t)
            for w2 in vocab
        )
        assert abs(total - 1.0) < 1e-9, (w1, total)


def test_kn_vocab_cap_and_d_bounds(spark):
    from muopdb_spark.operators.lm import (
        score_kn_bits_per_token,
        train_kn_lm,
    )

    docs = spark.createDataFrame(
        list(enumerate(TRAIN)), "doc_id long, text string"
    )
    big, ctx, cont, totals, keep = train_kn_lm(docs, vocab_size=5)
    assert keep is not None and keep.count() == 5
    out = score_kn_bits_per_token(
        docs, big, ctx, cont, totals, keep=keep
    ).collect()
    assert all(r["kn_bits_per_token"] > 0 for r in out)
    with pytest.raises(ValueError, match="d must"):
        score_kn_bits_per_token(docs, big, ctx, cont, totals, d=1.0)
