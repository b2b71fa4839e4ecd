"""Unicode/whitespace canonicalization (operators/normalize, t17)."""

from __future__ import annotations

import unicodedata

from muopdb_spark.operators.normalize import _clean_one, clean_text


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# pure-python core (fast cases, no session needed)


def test_nfc_composes_combining_sequences():
    assert _clean_one("café") == "café"
    # already-composed input is a fixed point
    assert _clean_one("café") == "café"


def test_invisibles_stripped():
    assert _clean_one("a​b‌c‍d﻿e­f") == "abcdef"


def test_controls_and_crlf():
    assert _clean_one("a\x00b\x07c") == "abc"
    assert _clean_one("one\r\ntwo\rthree") == "one\ntwo\nthree"
    # tab becomes a space; runs collapse; newline keeps line structure
    assert _clean_one("a\t\tb") == "a b"
    assert _clean_one("x  \n  y") == "x\ny"


def test_trim_and_idempotence():
    s = "  a  b \r\n c​  "
    once = _clean_one(s)
    assert once == "a b\nc"
    assert _clean_one(once) == once  # cleanup is idempotent


def test_none_passthrough():
    assert _clean_one(None) is None


def test_clean_is_nfc_invariant_hash():
    # the operator's purpose: equal-looking text hashes equal
    a = _clean_one("résumé  draft")
    b = _clean_one("résumé ​draft")
    assert a == b and unicodedata.is_normalized("NFC", a)


# dataframe operator


def test_clean_text_columns_and_flags(spark):
    out = {r["doc_id"]: r for r in clean_text(_df(spark, [
        (1, "plain ascii stays"),
        (2, "dirty​  text\r\nhere"),
        (3, None),
    ])).collect()}
    assert out[1]["text_clean"] == "plain ascii stays"
    assert out[1]["changed"] is False
    assert out[2]["text_clean"] == "dirty text\nhere"
    assert out[2]["changed"] is True
    assert out[2]["n_chars_in"] > out[2]["n_chars_out"]
    assert out[3]["text_clean"] is None and out[3]["changed"] is False


def test_clean_text_partition_invariant(spark):
    rows = [(i, f"t́ext{i}\t x ") for i in range(50)]
    a = sorted(map(tuple, clean_text(_df(spark, rows)).collect()))
    b = sorted(map(tuple, clean_text(
        _df(spark, rows).repartition(7)).collect()))
    assert a == b and len(a) == 50
