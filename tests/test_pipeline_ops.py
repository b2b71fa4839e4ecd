"""Tests for the round-2 pipeline operators: contamination detection,
PII scrubbing, and sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from muopdb_spark.operators.contamination import contamination_report
from muopdb_spark.operators.packing import (
    pack_sequences,
    pack_sequences_greedy,
    sequence_stats,
)
from muopdb_spark.operators.pii import PII_PATTERNS, scrub_pii

# ------------------------------------------------------ contamination


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_identical_doc_is_fully_contaminated(spark):
    corpus = _docs(spark, [(1, "the quick brown fox jumps over the lazy dog")])
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    row = contamination_report(corpus, bench, n=3).collect()[0]
    assert row.contamination == 1.0 and row.is_contaminated
    assert row.n_grams == row.n_contaminated == 7


def test_contamination_disjoint_vocab_is_zero(spark):
    corpus = _docs(spark, [(1, "alpha beta gamma delta epsilon")])
    bench = _docs(spark, [(100, "one two three four five")])
    row = contamination_report(corpus, bench, n=3).collect()[0]
    assert row.contamination == 0.0 and not row.is_contaminated
    assert row.n_contaminated == 0 and row.n_grams == 3


def test_contamination_partial_overlap_fraction(spark):
    # corpus doc: grams {a b c, b c d, c d e}; bench contains "a b c d" →
    # grams {a b c, b c d}; overlap 2/3
    corpus = _docs(spark, [(1, "a b c d e")])
    bench = _docs(spark, [(100, "a b c d")])
    row = contamination_report(corpus, bench, n=3, threshold=0.5).collect()[0]
    assert row.n_grams == 3 and row.n_contaminated == 2
    assert abs(row.contamination - round(2 / 3, 6)) < 1e-9
    assert row.is_contaminated


def test_contamination_keeps_short_docs(spark):
    corpus = _docs(spark, [(1, "tiny doc"), (2, "a b c d")])
    bench = _docs(spark, [(100, "a b c")])
    rows = {r.doc_id: r for r in contamination_report(corpus, bench, n=3).collect()}
    assert rows[1].n_grams == 0 and rows[1].contamination == 0.0
    assert rows[2].n_contaminated == 1


# --------------------------------------------------------------- PII


def test_pii_categories_and_redaction(spark):
    text = (
        "mail a.user+tag@example.co.uk or root@host.io, "
        "call +1 555-123 4567, ssn 123-45-6789, "
        "host 192.168.0.1, card 12345678901234"
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = scrub_pii(df).collect()[0]
    assert row.n_email == 2
    assert row.n_phone == 1
    assert row.n_ssn == 1
    assert row.n_ip == 1
    assert row.n_longnum == 1
    for token in ("<EMAIL>", "<PHONE>", "<SSN>", "<IP>", "<NUM>"):
        assert token in row.redacted
    # nothing PII-shaped survives
    assert "@" not in row.redacted
    assert "123-45-6789" not in row.redacted


def test_pii_no_double_count_across_stages(spark):
    # the digits inside the email/IP must not count as longnum/ssn
    # after those spans are redacted
    df = spark.createDataFrame(
        [(1, "x123456789@example.com and 10.0.0.255 only")],
        "doc_id long, text string",
    )
    row = scrub_pii(df).collect()[0]
    assert row.n_email == 1 and row.n_ip == 1
    assert row.n_longnum == 0 and row.n_ssn == 0


def test_pii_clean_text_untouched(spark):
    df = spark.createDataFrame(
        [(1, "perfectly ordinary prose with numbers 42 and 1 2 3")],
        "doc_id long, text string",
    )
    row = scrub_pii(df).collect()[0]
    assert row.redacted == "perfectly ordinary prose with numbers 42 and 1 2 3"
    assert (row.n_email, row.n_phone, row.n_ssn, row.n_ip, row.n_longnum) == (
        0, 0, 0, 0, 0,
    )


def test_pii_patterns_are_re2_safe():
    # the oracle runs these under RE2: lookaround and backreferences
    # must never creep in
    for _, rx, _ in PII_PATTERNS:
        assert "(?=" not in rx and "(?!" not in rx and "(?<" not in rx
        assert "\\1" not in rx


# ------------------------------------------------------------ packing


def _tok_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")


def test_pack_stream_chunking_offsets(spark):
    df = _tok_df(
        spark,
        [(1, "en", 100), (2, "en", 100), (3, "en", 100), (4, "en", 100)],
    )
    got = {
        r.doc_id: (r.seq_id, r.seq_offset)
        for r in pack_sequences(df, group_col="lang", budget=256).collect()
    }
    # stream starts: 0,100,200,300 → seqs 0,0,0,1; offsets mod 256
    assert got == {1: (0, 0), 2: (0, 100), 3: (0, 200), 4: (1, 44)}


def test_pack_greedy_never_splits_and_caps_budget(spark):
    df = _tok_df(
        spark,
        [
            (1, "en", 200), (2, "en", 200), (3, "en", 200),
            (4, "de", 600), (5, "de", 10),
        ],
    )
    packed = pack_sequences_greedy(df, group_col="lang", budget=512)
    rows = {r.doc_id: r for r in packed.collect()}
    # en: 200+200 fit, 3rd overflows → new seq
    assert (rows[1].seq_id, rows[1].seq_offset) == (0, 0)
    assert (rows[2].seq_id, rows[2].seq_offset) == (0, 200)
    assert (rows[3].seq_id, rows[3].seq_offset) == (1, 0)
    # de: oversized 600 sits alone in seq 0; next doc opens seq 1
    assert (rows[4].seq_id, rows[4].seq_offset) == (0, 0)
    assert (rows[5].seq_id, rows[5].seq_offset) == (1, 0)
    stats = sequence_stats(packed, group_col="lang").collect()
    for s in stats:
        assert s.sum_tokens <= 512 or s.n_docs == 1


def test_pack_greedy_invariants_on_fixture(spark, sf_dir):
    from muopdb_spark.operators.textstats import ws_token_count

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", ws_token_count("text").cast("long").alias("n_tokens"))
    )
    packed = pack_sequences_greedy(docs, group_col="lang", budget=512)
    bad = (
        sequence_stats(packed, group_col="lang")
        .filter((F.col("sum_tokens") > 512) & (F.col("n_docs") > 1))
        .count()
    )
    assert bad == 0
    assert packed.count() == docs.count()
    # determinism: same input → same assignment
    again = pack_sequences_greedy(docs, group_col="lang", budget=512)
    assert packed.exceptAll(again).count() == 0


def test_pack_stream_no_group(spark):
    df = _tok_df(spark, [(1, "en", 300), (2, "de", 300)])
    got = {
        r.doc_id: (r.seq_id, r.seq_offset)
        for r in pack_sequences(df, budget=512).collect()
    }
    assert got == {1: (0, 0), 2: (0, 300)}


def test_gopher_quality_flags(spark):
    """Gopher table-A1 signals on crafted docs: a clean passing doc,
    a bullet list, an ellipsis-heavy doc, a symbol-heavy doc, and an
    empty doc."""
    from muopdb_spark.operators.quality import gopher_quality_flags

    clean = ("the quick brown fox jumps over the lazy dog and then "
             "runs back home to rest with friends that have apples "
             "of every kind be they red or green to share and enjoy "
             "all day long while the sun shines warm and bright over "
             "the quiet valley where children play games") + " end"
    bullets = "\n".join("- item %d" % i for i in range(10))
    dots = "\n".join("so it goes..." for _ in range(4))
    symbols = "# " * 30
    docs = spark.createDataFrame(
        [(1, clean), (2, bullets), (3, dots), (4, symbols), (5, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in
           gopher_quality_flags(docs).collect()}
    assert out[1]["passes"] is True
    assert out[1]["stop_hits"] >= 2 and out[1]["alpha_frac"] == 1.0
    assert out[2]["bullet_ratio"] == 1.0 and out[2]["passes"] is False
    assert out[3]["ellipsis_ratio"] == 1.0 and out[3]["passes"] is False
    assert out[4]["symbol_ratio"] > 0.1 and out[4]["passes"] is False
    assert out[5]["n_words"] == 0 and out[5]["passes"] is False


def test_c4_line_filter(spark):
    from muopdb_spark.operators.quality import c4_line_filter

    doc = "\n".join([
        "This is a perfectly good sentence with many words.",  # keep
        "Short one.",                                  # < 5 words
        "Please enable JavaScript to view this page.",  # boilerplate
        "We value your privacy and use cookie banners here.",  # cookie
        "this line has no terminal punctuation at all",  # no punct
        "Lorem ipsum dolor sit amet consectetur adipiscing elit.",  # lorem
        "function f() { return 1; }",                   # brace
        'He said "stop right there my friend!"',        # ends with quote
    ])
    out = c4_line_filter(
        spark.createDataFrame([(1, doc), (2, None)], "doc_id long, text string")
    ).collect()
    rows = {r["doc_id"]: r for r in out}
    kept = rows[1]["clean_text"].split("\n")
    assert kept == [
        "This is a perfectly good sentence with many words.",
        'He said "stop right there my friend!"',
    ]
    assert rows[1]["n_lines"] == 8 and rows[1]["n_kept"] == 2
    assert rows[1]["kept"] is True
    assert rows[2]["n_kept"] == 0 and rows[2]["kept"] is False


def test_chunk_documents(spark):
    from muopdb_spark.operators.packing import chunk_documents

    import pytest as _pytest

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),  # 10 toks: 1 chunk
            (2, " ".join(f"w{i}" for i in range(13))),  # 13: chunks of 8 + tail
            (3, ""),                                     # empty: no chunks
            (4, None),                                   # null: no chunks
            (5, " ".join(f"w{i}" for i in range(8))),    # exactly size
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, size=8, overlap=3).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc and 4 not in by_doc
    assert len(by_doc[5]) == 1 and by_doc[5][0].n_tokens == 8
    # doc 1: 10 tokens, stride 5 -> windows at 0, 5 (tail of 5)
    assert [(r.chunk_idx, r.n_tokens) for r in sorted(by_doc[1], key=lambda r: r.chunk_idx)] == [(0, 8), (1, 5)]
    # doc 2: 13 tokens -> starts 0, 5 (covers 5..12)
    c2 = sorted(by_doc[2], key=lambda r: r.chunk_idx)
    assert [r.chunk_idx for r in c2] == [0, 1]
    assert c2[0].chunk_text.split(" ") == [f"w{i}" for i in range(8)]
    assert c2[1].chunk_text.split(" ") == [f"w{i}" for i in range(5, 13)]
    # overlap coverage: consecutive chunks share `overlap` tokens
    assert c2[0].chunk_text.split(" ")[-3:] == c2[1].chunk_text.split(" ")[:3]
    with _pytest.raises(ValueError):
        chunk_documents(docs, size=8, overlap=8)


def test_pack_ffd_beats_or_ties_greedy_and_is_valid(spark):
    from muopdb_spark.operators.packing import pack_sequences_ffd

    rows = [(i, "en", t) for i, t in enumerate(
        [7, 5, 4, 3, 3, 2, 9, 1, 6, 2, 8, 4, 1, 1, 5] * 4
    )]
    df = _tok_df(spark, rows)
    budget = 10
    ffd = pack_sequences_ffd(df, group_col="lang", budget=budget).collect()
    greedy = pack_sequences_greedy(
        df, group_col="lang", budget=budget
    ).collect()
    # validity: every sequence fits the budget, offsets consistent
    fill: dict = {}
    for r in ffd:
        assert 0 <= r["seq_offset"] and r["seq_offset"] + r["n_tokens"] <= budget
        fill[r["seq_id"]] = fill.get(r["seq_id"], 0) + r["n_tokens"]
    assert all(v <= budget for v in fill.values())
    # FFD never uses more sequences than first-fit-in-order
    assert len(fill) <= len({r["seq_id"] for r in greedy})
    # deterministic
    again = pack_sequences_ffd(df, group_col="lang", budget=budget).collect()
    assert sorted(map(tuple, ffd)) == sorted(map(tuple, again))


def test_pack_ffd_oversized_doc_alone(spark):
    from muopdb_spark.operators.packing import pack_sequences_ffd

    df = _tok_df(spark, [(1, "en", 25), (2, "en", 3), (3, "en", 4)])
    out = {r["doc_id"]: r for r in
           pack_sequences_ffd(df, group_col="lang", budget=10).collect()}
    assert out[1]["seq_offset"] == 0
    # nothing shares the oversized doc's sequence
    assert {r["seq_id"] for r in out.values() if r["doc_id"] != 1} \
        .isdisjoint({out[1]["seq_id"]})


# ------------------------------------------- fuzzy decontamination (c3)


def test_fuzzy_contamination_exact_copy_is_found(spark):
    from muopdb_spark.operators.contamination import (
        fuzzy_contamination_pairs,
        fuzzy_contamination_verdicts,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = _docs(spark, [
        (1, base),                                   # verbatim leak
        (2, "totally unrelated words about spark"),  # clean
    ])
    bench = _docs(spark, [(100, base)])
    pairs = fuzzy_contamination_pairs(corpus, bench, threshold=0.8).collect()
    assert [(r.doc_id, r.bench_id) for r in pairs] == [(1, 100)]
    assert pairs[0].jaccard == 1.0 and pairs[0].est_jaccard == 1.0
    v = fuzzy_contamination_verdicts(corpus, bench, threshold=0.8).collect()
    assert len(v) == 1 and v[0].doc_id == 1
    assert v[0].n_bench_hits == 1 and v[0].first_bench_id == 100


def test_fuzzy_contamination_near_dup_below_threshold_dropped(spark):
    from muopdb_spark.operators.contamination import fuzzy_contamination_pairs

    # shares a prefix but diverges: jaccard well under 0.8 — must be
    # excluded even when LSH banding surfaces it as a candidate
    corpus = _docs(spark, [
        (1, "alpha beta gamma delta one two three four five six seven"),
    ])
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    high = fuzzy_contamination_pairs(corpus, bench, threshold=0.9).collect()
    assert high == []
    low = fuzzy_contamination_pairs(corpus, bench, threshold=0.05).collect()
    # at a permissive threshold the true overlap (2 shared of 13 grams)
    # is reported exactly when the bands happen to collide; jaccard is
    # the exact set value either way
    for r in low:
        assert abs(r.jaccard - 2 / 13) < 1e-9


def test_fuzzy_contamination_empty_benchmark(spark):
    from muopdb_spark.operators.contamination import (
        fuzzy_contamination_pairs,
        fuzzy_contamination_verdicts,
    )

    corpus = _docs(spark, [(1, "alpha beta gamma delta epsilon")])
    bench = _docs(spark, []).filter("doc_id is not null")
    assert fuzzy_contamination_pairs(corpus, bench).collect() == []
    assert fuzzy_contamination_verdicts(corpus, bench).collect() == []


def test_fuzzy_contamination_partition_invariant(spark):
    from muopdb_spark.operators.contamination import (
        fuzzy_contamination_verdicts,
    )

    rows = [(i, f"alpha beta gamma delta epsilon zeta token{i % 3}")
            for i in range(40)]
    corpus = _docs(spark, rows)
    bench = _docs(spark, [(1000, "alpha beta gamma delta epsilon zeta token0")])
    a = sorted(map(tuple, fuzzy_contamination_verdicts(
        corpus, bench, threshold=0.5).collect()))
    b = sorted(map(tuple, fuzzy_contamination_verdicts(
        corpus.repartition(7), bench, threshold=0.5).collect()))
    assert a == b and len(a) > 0


def test_fuzzy_contamination_served_from_bench_artifact(spark):
    from muopdb_spark.operators.contamination import (
        fuzzy_contamination_pairs,
    )
    from muopdb_spark.operators.dedup import minhash_signature_df

    base = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = _docs(spark, [(1, base), (2, "other words entirely here now")])
    bench = _docs(spark, [(100, base)])
    sig = minhash_signature_df(bench, text_col="text", id_col="doc_id",
                               n=3, num_hashes=8, bands=4)
    from_art = fuzzy_contamination_pairs(
        corpus, bench, threshold=0.8, bench_sig=sig).collect()
    scratch = fuzzy_contamination_pairs(
        corpus, bench, threshold=0.8).collect()
    assert sorted(map(tuple, from_art)) == sorted(map(tuple, scratch))


# ------------------------------------------- token-run collapse (t18)


def test_collapse_runs_caps_and_counts(spark):
    from muopdb_spark.operators.quality import collapse_token_runs

    out = {r.doc_id: r for r in collapse_token_runs(_docs(spark, [
        (1, "spam spam spam spam spam ok go go"),
        (2, "a b c"),
        (3, None),
        (4, "x x x y y y y x"),
    ]), max_run=3).collect()}
    assert out[1].text_clean == "spam spam spam ok go go"
    assert (out[1].n_tokens, out[1].kept_tokens) == (8, 6)
    assert out[2].text_clean == "a b c" and out[2].kept_tokens == 3
    assert out[3].text_clean == "" and out[3].n_tokens == 0
    # runs cap against the ORIGINAL sequence; the trailing x restarts
    assert out[4].text_clean == "x x x y y y x"


def test_collapse_runs_max_run_one_dedupes_consecutive(spark):
    from muopdb_spark.operators.quality import collapse_token_runs

    r = collapse_token_runs(
        _docs(spark, [(1, "a a b b b a")]), max_run=1
    ).collect()[0]
    assert r.text_clean == "a b a" and r.kept_tokens == 3


def test_collapse_runs_idempotent_and_validated(spark):
    import pytest as _pytest

    from muopdb_spark.operators.quality import collapse_token_runs

    once = collapse_token_runs(
        _docs(spark, [(1, "q q q q w w w w w e")]), max_run=2
    ).collect()[0]
    again = collapse_token_runs(_docs(spark, [
        (1, once.text_clean)
    ]), max_run=2).collect()[0]
    assert again.text_clean == once.text_clean
    assert again.kept_tokens == again.n_tokens
    with _pytest.raises(ValueError, match="max_run"):
        collapse_token_runs(_docs(spark, [(1, "a")]), max_run=0)


def test_fuzzy_contamination_rejects_mismatched_artifacts(spark):
    # an artifact built with different num_hashes/bands must error, not
    # silently probe a band subset (reduced recall in a safety pass)
    import pytest as _pytest

    from muopdb_spark.operators.contamination import (
        fuzzy_contamination_pairs,
    )
    from muopdb_spark.operators.dedup import minhash_signature_df

    corpus = _docs(spark, [(1, "alpha beta gamma delta epsilon")])
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
    sig8 = minhash_signature_df(bench, text_col="text", id_col="doc_id",
                                n=3, num_hashes=16, bands=8)
    with _pytest.raises(ValueError, match="bands=8"):
        fuzzy_contamination_pairs(
            corpus, None, num_hashes=8, bands=4, bench_sig=sig8)
    csig = minhash_signature_df(corpus, text_col="text", id_col="doc_id",
                                n=3, num_hashes=8, bands=2).drop("sh")
    with _pytest.raises(ValueError, match="bands=2"):
        fuzzy_contamination_pairs(
            corpus, bench, num_hashes=8, bands=4, corpus_sig=csig)
    # matching artifacts still pass through
    ok = minhash_signature_df(bench, text_col="text", id_col="doc_id",
                              n=3, num_hashes=8, bands=4)
    assert fuzzy_contamination_pairs(
        corpus, None, num_hashes=8, bands=4, bench_sig=ok,
        threshold=0.8).count() == 1


def test_pii_phone_nanp_any_separator(spark):
    # r11 ADVICE: on the privacy-sensitive side recall wins, so ALL
    # nine {-, ., ' '} separator combinations redact, including mixed
    # ("555-867.5309"). Word-boundary and 3-3-4 shape requirements
    # still keep version-string-like prose out: "v123.456 7890" has no
    # boundary after 'v', "1-23.456-7890" has no 3-3-4 digit shape.
    df = spark.createDataFrame(
        [(1, "call 555-867-5309 or 555.867.5309 or 555 867 5309"),
         (2, "v123.456 7890 build tag and 1-23.456-7890 too"),
         (3, "mixed 555-867.5309 and 555 867-5309 and 555.867 5309")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert out[1].n_phone == 3
    assert out[1].redacted == "call <PHONE> or <PHONE> or <PHONE>"
    assert out[2].n_phone == 0
    assert "<PHONE>" not in out[2].redacted
    assert out[3].n_phone == 3
    assert out[3].redacted == "mixed <PHONE> and <PHONE> and <PHONE>"


# ----------------------------------------------- wordlist gate (t19)


def test_wordlist_gate_any_hit_drop(spark):
    from muopdb_spark.operators.quality import wordlist_gate

    df = _docs(spark, [
        (1, "clean prose only here"),
        (2, "this has one Banned word"),
        (3, "Banned! banned, BANNED twice more"),
        (4, ""),
        (5, None),
    ])
    out = {r.doc_id: r for r in
           wordlist_gate(df, ["banned"]).collect()}
    assert out[1].keep and out[1].n_blocked == 0
    # case-insensitive
    assert not out[2].keep and out[2].n_blocked == 1
    # punctuation-adjacent occurrences normalize and still hit
    assert out[3].n_blocked == 3 and not out[3].keep
    assert out[3].n_tokens == 5
    assert out[3].blocked_frac == round(3 / 5, 6)
    # empty/null docs: zero tokens, zero fraction, kept
    assert out[4].keep and out[4].n_tokens == 0
    assert out[5].keep and out[5].blocked_frac == 0.0


def test_wordlist_gate_fraction_threshold(spark):
    from muopdb_spark.operators.quality import wordlist_gate

    df = _docs(spark, [(1, "bad good good good good good good good good")])
    strict = wordlist_gate(df, ["bad"]).collect()[0]
    soft = wordlist_gate(df, ["bad"], max_frac=0.2).collect()[0]
    assert not strict.keep and soft.keep
    assert soft.blocked_frac == round(1 / 9, 6)


def test_wordlist_gate_empty_list_rejected(spark):
    import pytest as _pytest

    from muopdb_spark.operators.quality import wordlist_gate

    with _pytest.raises(ValueError, match="non-empty"):
        wordlist_gate(_docs(spark, [(1, "x")]), [])


def test_wordlist_gate_normalizes_entries_and_rejects_phrases(spark):
    from muopdb_spark.operators.quality import wordlist_gate

    df = _docs(spark, [(1, "this has one banned word")])
    # punctuation-adjacent list entries normalize like tokens do
    r = wordlist_gate(df, ["Banned!"]).collect()[0]
    assert r.n_blocked == 1 and not r.keep
    # a multi-word phrase can never match a token: loud error, not a
    # silent never-match in a safety gate
    import pytest as _pytest
    with _pytest.raises(ValueError, match="multi-word"):
        wordlist_gate(df, ["bad words"])
    with _pytest.raises(ValueError, match="normalization"):
        wordlist_gate(df, ["!!!"])
    # r11 ADVICE: edge-stripping may only remove punctuation/symbols.
    # 'café' would silently broaden to 'caf' (matching caf, caf., ...)
    # — a safety gate must not widen quietly, so it raises; the ASCII
    # core passed explicitly is the opt-in spelling.
    with _pytest.raises(ValueError, match="broader"):
        wordlist_gate(df, ["café"])
    with _pytest.raises(ValueError, match="broader"):
        wordlist_gate(df, ["übanned"])
    r = wordlist_gate(df, ["caf"]).collect()[0]  # explicit core is fine
    assert r.n_blocked == 0 and r.keep


def test_wordlist_gate_any_hit_exact_on_very_long_docs(spark):
    # one blocked token in a 2.2M-token doc: round-6 collapses the
    # fraction to 0.0 but keep must use the UNROUNDED value — the
    # any-hit rule may not leak on long documents
    from muopdb_spark.operators.quality import wordlist_gate

    text = "banned " + ("ok " * 2_200_000)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = wordlist_gate(df, ["banned"]).collect()[0]
    assert r.n_tokens == 2_200_001 and r.n_blocked == 1
    assert r.blocked_frac == 0.0      # display rounding
    assert not r.keep                 # but the gate still drops it


# --------------------------------------------------- p8 (r15): FIM


def test_fim_reconstruction_invariant(spark):
    """Every transformed doc reassembles to the original
    (prefix+middle+suffix == text), prefix and middle are non-empty,
    untouched docs pass through byte-identical; short docs and docs
    outside the rate are fim=false."""
    import re

    from muopdb_spark.operators.packing import (
        FIM_MID,
        FIM_PRE,
        FIM_SUF,
        fim_transform,
    )

    rows = [(i, f"document body number {i} with some repeated text")
            for i in range(40)] + [(900, "ab"), (901, "")] + [
        # ids past the old d*H1 BIGINT overflow point (~3.48e9) and
        # monotonically_increasing_id's partition-1 base (2**33), plus
        # negative ids where sign-preserving % escaped the 1..n-2
        # split range — all must reconstruct exactly
        (3_500_000_000, "overflow-prone id body text alpha"),
        (2**33 + 7, "monotonically increasing id body beta"),
        (2**62, "very large id body gamma gamma"),
        (-3, "abcdefghij"),
        (-3_500_000_000, "negative huge id body delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    orig = dict(rows)
    got = {r["doc_id"]: (r["fim"], r["text"])
           for r in fim_transform(df, rate=0.5).collect()}
    pat = re.compile(
        re.escape(FIM_PRE) + "(.*)" + re.escape(FIM_SUF) + "(.*)"
        + re.escape(FIM_MID) + "(.*)", re.S,
    )
    n_fim = 0
    for i, (fim, txt) in got.items():
        if fim:
            n_fim += 1
            m = pat.fullmatch(txt)
            assert m, (i, txt)
            pre, suf, mid = m.groups()
            assert pre + mid + suf == orig[i], i
            assert pre and mid, i
        else:
            assert txt == orig[i], i
    assert 0 < n_fim < 45  # the rate really selects a strict subset
    assert got[900] == (False, "ab") and got[901] == (False, "")
    # deterministic: a second run is identical
    again = {r["doc_id"]: (r["fim"], r["text"])
             for r in fim_transform(df, rate=0.5).collect()}
    assert again == got


def test_fim_reconstruction_fuzz(spark):
    """Seeded fuzz over the whole id/text space the operator can see:
    ids across the full signed-64 range (incl. the old overflow band
    and negatives), texts with multibyte unicode, whitespace runs, and
    the length-3 boundary — every transformed doc must reassemble
    exactly and split points must respect 1 <= a < b <= n-1 (checked
    via the non-empty prefix/middle invariant)."""
    import re

    import numpy as np

    from muopdb_spark.operators.packing import (
        FIM_MID,
        FIM_PRE,
        FIM_SUF,
        fim_transform,
    )

    rng = np.random.default_rng(1234)
    alphabet = list("abc xyz09") + ["é", "漢", "🙂", "\n", "\t"]
    rows = []
    for i in range(200):
        vid = int(rng.integers(-(2**63), 2**63 - 1, dtype=np.int64))
        n = int(rng.integers(0, 40))
        rows.append((vid, "".join(rng.choice(alphabet, size=n))))
    # the exact length-3 boundary on extreme ids
    rows += [(2**63 - 1, "abc"), (-(2**63), "abc"), (0, "abc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    orig = dict(rows)
    pat = re.compile(
        re.escape(FIM_PRE) + "(.*)" + re.escape(FIM_SUF) + "(.*)"
        + re.escape(FIM_MID) + "(.*)", re.S,
    )
    n_fim = 0
    for r in fim_transform(df, rate=0.7).collect():
        fim, txt, i = r["fim"], r["text"], r["doc_id"]
        if fim:
            n_fim += 1
            m = pat.fullmatch(txt)
            assert m, (i, txt)
            pre, suf, mid = m.groups()
            assert pre + mid + suf == orig[i], i
            assert pre and mid, i
        else:
            assert txt == orig[i], i
    assert n_fim > 30  # the rate actually fires across the id space


def test_fim_spm_mode_and_rate_bounds(spark):
    from muopdb_spark.operators.packing import (
        FIM_MID,
        FIM_PRE,
        FIM_SUF,
        fim_transform,
    )
    import pytest as _pytest

    df = spark.createDataFrame(
        [(2, "abcdefghijklmnop")], "doc_id long, text string"
    )
    psm = fim_transform(df, rate=1.0).collect()[0]["text"]
    spm = fim_transform(df, rate=1.0, spm=True).collect()[0]["text"]
    assert psm.startswith(FIM_PRE) and FIM_SUF in psm and FIM_MID in psm
    # SPM: sentinels up front, document content after
    assert spm.startswith(FIM_PRE + FIM_SUF)
    # both carry the same characters of the original
    strip = lambda s: s.replace(FIM_PRE, "").replace(FIM_SUF, "") \
        .replace(FIM_MID, "")
    psm_m = strip(psm)
    # psm order: prefix, suffix, middle; spm order: suffix, prefix+middle
    assert sorted(psm_m) == sorted("abcdefghijklmnop") == sorted(strip(spm))
    # rate=0 is a pure passthrough
    assert fim_transform(df, rate=0.0).collect()[0]["text"] \
        == "abcdefghijklmnop"
    with _pytest.raises(ValueError, match="rate"):
        fim_transform(df, rate=1.5)


def test_fim_plan_is_pure_jvm(spark):
    from muopdb_spark.operators.packing import fim_transform

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = fim_transform(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan


def test_quality_features_carry_matches_join(spark, sf_dir):
    """carry= passthrough is bit-identical to joining the carried
    projection back on doc_id, and its plan stays join-free (the
    point of the parameter: one corpus scan instead of two)."""
    from muopdb_spark.operators.textstats import quality_features, ws_token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    joined = docs.select(
        "doc_id", ws_token_count("text").cast("long").alias("n_ws")
    ).join(quality_features(docs), "doc_id")
    carried = quality_features(
        docs.select(
            "doc_id", "text", ws_token_count("text").cast("long").alias("n_ws")
        ),
        carry=("n_ws",),
    ).select(*joined.columns)
    assert carried.exceptAll(joined).count() == 0
    assert joined.exceptAll(carried).count() == 0
    plan = carried._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
