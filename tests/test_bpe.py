"""BPE merge learning + application (operators/vocab.py, Sennrich et
al. 2016 arXiv:1508.07909 step 2): hand-verified merge lists, the
paper's worked example, encoder/trainer consistency, Spark-vs-pure-
Python parity, and the map-side plan shape of bpe_apply."""

from __future__ import annotations

from pyspark.sql import functions as F

from muopdb_spark.operators.vocab import (
    bpe_apply,
    bpe_encode_word,
    bpe_train,
    bpe_train_on_words,
)


def test_tiny_merge_list_hand_verified():
    # vocab: ab x2 -> (a, b</w>) pairs twice; abc x1 contributes
    # (a,b) and (b,c</w>) once each. Round 1 picks (a,'b</w>') (count
    # 2); round 2 tie at count 1 breaks lexicographically to ('a','b');
    # round 3 merges the remainder.
    merges = bpe_train_on_words({"ab": 2, "abc": 1}, 10)
    assert merges == [("a", "b</w>"), ("a", "b"), ("ab", "c</w>")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe_encode_word("ab", ranks) == ["ab</w>"]
    assert bpe_encode_word("abc", ranks) == ["abc</w>"]
    # unseen word: lowest-rank merge (a,b</w>) applies to the final
    # pair first, then (a,b) to the leading pair
    assert bpe_encode_word("abab", ranks) == ["ab", "ab</w>"]


def test_paper_worked_example():
    # Sennrich et al. Fig. 1 corpus. First merge is ('e','s')
    # (count 9, lexicographic winner of the tie with ('s','t</w>')),
    # second is ('es','t</w>') — and after enough merges every seen
    # word encodes to a single symbol.
    corpus = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train_on_words(corpus, 10)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t</w>")
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe_encode_word("newest", ranks) == ["newest</w>"]
    # unseen 'lowest' reuses learned subwords, never falls back to
    # characters-only
    enc = bpe_encode_word("lowest", ranks)
    assert enc == ["lo", "w", "est</w>"]


def test_more_merges_never_lengthen_encoding():
    corpus = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    prev = None
    for n in range(0, 12, 2):
        ranks = {p: i for i, p in enumerate(bpe_train_on_words(corpus, n))}
        total = sum(
            f * len(bpe_encode_word(w, ranks)) for w, f in corpus.items()
        )
        assert prev is None or total <= prev
        prev = total


def test_encoding_of_training_words_matches_final_train_vocab():
    # applying the merge list greedily must reproduce exactly the
    # segmentation training ended with (encoder/trainer consistency)
    corpus = {"hug": 10, "pug": 5, "pun": 12, "bun": 4, "hugs": 5}
    merges = bpe_train_on_words(corpus, 6)
    ranks = {p: i for i, p in enumerate(merges)}
    # re-run the trainer's replacement loop independently
    vocab = {tuple(w[:-1]) + (w[-1] + "</w>",): f for w, f in corpus.items()}
    for a, b in merges:
        new = {}
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        vocab = new
    trained = {("".join(s).replace("</w>", "")): list(s) for s in vocab}
    for w in corpus:
        assert bpe_encode_word(w, ranks) == trained[w]


def test_spark_apply_matches_pure_python(spark):
    texts = [
        "the fast spark table scan",
        "slow scan, Fast TABLE!",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges = bpe_train(df, num_merges=15)
    # distributed trainer == pure-python trainer on the same counts
    from collections import Counter
    import re

    cnt: Counter = Counter()
    for t in texts:
        cnt.update(w for w in re.split(r"[^a-z0-9]+", t.lower()) if w)
    assert merges == bpe_train_on_words(dict(cnt), 15)

    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_apply(df, merges).select("doc_id", "bpe_tokens").collect()
    }
    for i, t in enumerate(texts):
        want = [
            s
            for w in re.split(r"[^a-z0-9]+", t.lower())
            if w
            for s in bpe_encode_word(w, ranks)
        ]
        assert got[i] == want


def test_apply_plan_is_map_side(spark, sf_dir):
    """bpe_apply must add no shuffle: scan -> ArrowEvalPython ->
    project, nothing else."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = [("t", "h"), ("th", "e</w>")]
    plan = (
        bpe_apply(docs, merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan


def test_bpe_token_count_pinned_and_matches_apply(spark):
    """The budget unit: n_bpe_tokens == len(bpe_apply subword stream),
    pinned on a hand-computable corpus."""
    from pyspark.sql import functions as F

    from muopdb_spark.operators.vocab import bpe_token_count

    df = spark.createDataFrame(
        [(1, "ab ab c"), (2, ""), (3, None), (4, "xyz")],
        "doc_id long, text string",
    )
    # merges fuse "ab</w>" into one subword; "c</w>" is a single char
    # word -> 1 token; "xyz" stays 3 chars (no merges apply)
    merges = [("a", "b</w>")]
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_count(df, merges).collect()
    }
    assert got == {1: 3, 2: 0, 3: 0, 4: 3}
    # and rows-wise identical to sizing bpe_apply's stream directly
    twin = {
        r["doc_id"]: r["n"]
        for r in bpe_apply(df, merges)
        .select("doc_id", F.size("bpe_tokens").cast("long").alias("n"))
        .collect()
    }
    assert got == twin


def test_weighted_budget_sample_under_bpe_units(spark, sf_dir):
    """weighted_token_budget_sample consumes BPE counts as its
    token_col: membership/fractions must be identical regardless of
    partitioning, and the kept BPE-token mass lands near the budget."""
    from pyspark.sql import functions as F

    from muopdb_spark.operators.sampling import weighted_token_budget_sample
    from muopdb_spark.operators.vocab import bpe_token_count, bpe_train

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    merges = bpe_train(docs, num_merges=50)
    base = bpe_token_count(docs, merges, out_col="n_tokens") \
        .withColumn("soft_weight", F.lit(1.0)) \
        .select("doc_id", "n_tokens", "soft_weight") \
        .localCheckpoint(eager=True)
    total = base.agg(F.sum("n_tokens")).collect()[0][0]
    budget = int(total * 0.3)
    a = weighted_token_budget_sample(
        base.repartition(1), key_col="doc_id", token_col="n_tokens",
        weight_col="soft_weight", budget_tokens=budget,
    )
    b = weighted_token_budget_sample(
        base.repartition(7), key_col="doc_id", token_col="n_tokens",
        weight_col="soft_weight", budget_tokens=budget,
    )
    ra = sorted((r.doc_id, r.fraction) for r in a.collect())
    rb = sorted((r.doc_id, r.fraction) for r in b.collect())
    assert ra == rb and len(ra) > 0
    kept = a.agg(F.sum("n_tokens")).collect()[0][0]
    assert 0.5 * budget <= kept <= 1.5 * budget


def test_encode_reconstruction_fuzz():
    """Property fuzz (r16): for ANY word and ANY merge list learned
    from ANY corpus, the encoding concatenates back to word + '</w>'
    (no token created, dropped, or reordered) and every emitted piece
    is either a learned merge product or a raw symbol. Deterministic
    seeded generation — no flaky examples."""
    import random

    rng = random.Random(42)
    alphabet = "abz09"
    for trial in range(40):
        corpus = {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 10))):
                rng.randint(1, 5)
            for _ in range(rng.randint(1, 12))
        }
        merges = bpe_train_on_words(corpus, rng.randint(0, 20))
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        for _ in range(25):
            w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
            enc = bpe_encode_word(w, ranks)
            assert "".join(enc) == w + "</w>", (w, merges, enc)
            assert all(enc), (w, enc)  # no empty pieces


def test_unigram_encode_reconstruction_fuzz():
    """Same property for the unigram Viterbi encoder: pieces always
    concatenate back to the word, even for characters unseen at
    training time (byte-fallback analog)."""
    import random

    from muopdb_spark.operators.unigram import (
        unigram_encode_word,
        unigram_train_on_words,
    )

    rng = random.Random(7)
    alphabet = "abz09"
    for trial in range(25):
        corpus = {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 10))):
                rng.randint(1, 5)
            for _ in range(rng.randint(1, 10))
        }
        logp = unigram_train_on_words(
            corpus, rng.randint(1, 30), max_piece_len=rng.randint(2, 6)
        )
        for _ in range(25):
            # include a char ('q') absent from every training corpus
            w = "".join(
                rng.choice(alphabet + "q") for _ in range(rng.randint(1, 14))
            )
            enc = unigram_encode_word(w, logp)
            assert "".join(enc) == w, (w, enc)
            assert all(enc), (w, enc)
