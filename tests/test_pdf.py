"""PDF text-layer extraction (operators/pdf.py): object lexer, ObjStm
expansion, filters + refusals, font decoding (WinAnsi base,
/Differences glyph names, ToUnicode CMaps), content interpretation
(Tj/TJ/kern-space/line moves), writer determinism + roundtrip, the
Spark operator, probe triage, and foreign-fixture pins against real
TeX-produced PDF 1.5 files."""

from __future__ import annotations

import os
import zlib

import pytest

from muopdb_spark.operators.pdf import (
    PdfDocument,
    PdfError,
    SPACE_KERN,
    _parse_tounicode,
    encode_pdf,
    extract_pdf_text,
    parse_object,
    pdf_info,
    pdf_pages,
)

_FOREIGN = [
    "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf",
    "/usr/share/doc/libtasn1-doc/libtasn1.pdf",
]


# ---------------------------------------------------------------- lexer


def test_parse_objects():
    assert parse_object(b" 42 ", 0)[0] == 42
    assert parse_object(b"-3.5", 0)[0] == -3.5
    assert parse_object(b"/Name#20x", 0)[0] == "Name x"
    assert parse_object(b"(a\\(b\\)c\\\\d)", 0)[0] == b"a(b)c\\d"
    assert parse_object(b"(oct \\101\\102)", 0)[0] == b"oct AB"
    assert parse_object(b"(nest (ed) ok)", 0)[0] == b"nest (ed) ok"
    assert parse_object(b"<48 65 6C6C6F>", 0)[0] == b"Hello"
    assert parse_object(b"<486>", 0)[0] == b"H`"  # odd: pad 0
    d, _ = parse_object(b"<< /A 1 /B [2 3 R 4] /C true >>", 0)
    assert d["A"] == 1 and d["C"] is True
    # '2 3 R' is ONE reference (object 2, generation 3)
    assert d["B"][0].num == 2 and d["B"][0].gen == 3 and d["B"][1] == 4
    ref, _ = parse_object(b"12 0 R", 0)
    assert ref.num == 12
    with pytest.raises(PdfError):
        parse_object(b"(unterminated", 0)


def test_parse_name_lexer_edges():
    # fast path: name runs to end-of-data (no terminator byte)
    obj, end = parse_object(b"/Type", 0)
    assert obj == "Type" and end == 5
    # fast path stops at every delimiter class and at whitespace
    for term in (b"/", b"(", b"<", b"[", b"{", b"%", b" ", b"\n", b"]"):
        obj, end = parse_object(b"/Font" + term, 0)
        assert obj == "Font" and end == 5, term
    # escape path: multiple #xx escapes mixed into one name
    assert parse_object(b"/A#42#2FC d", 0)[0] == "AB/C"
    # trailing incomplete escape (#x at end) keeps the literal bytes
    assert parse_object(b"/N#4", 0)[0] == "N#4"
    # empty name (bare '/') parses to the empty string
    obj, end = parse_object(b"/ 1", 0)
    assert obj == "" and end == 1
    # fused number/ref probe: 'R' followed by an alnum is NOT a ref
    obj, end = parse_object(b"5 0 RG", 0)
    assert obj == 5 and end == 1
    # ...but a ref terminated by a delimiter is
    ref, _ = parse_object(b"5 0 R/Next", 0)
    assert ref.num == 5 and ref.gen == 0


def test_tounicode_bfchar_and_bfrange():
    cmap = _parse_tounicode(
        b"beginbfchar <01> <0041> <02> <00660066> endbfchar\n"
        b"beginbfrange <10> <12> <0061> "
        b"<20> <21> [<005A> <0079>] endbfrange"
    )
    assert cmap[0x01] == "A"
    assert cmap[0x02] == "ff"
    assert cmap[0x10] == "a" and cmap[0x12] == "c"
    assert cmap[0x20] == "Z" and cmap[0x21] == "y"


# ------------------------------------------------------------ roundtrip


def test_encode_extract_roundtrip():
    pages = ["Hello world\nsecond line", "Page two: (parens) & \\slash"]
    pdf = encode_pdf(pages)
    assert extract_pdf_text(pdf) == pages
    info = pdf_info(pdf)
    assert info == {"version": "1.4", "n_pages": 2,
                    "width": 612, "height": 792}


def test_encoder_deterministic_and_refusals():
    assert encode_pdf(["x"]) == encode_pdf(["x"])
    with pytest.raises(ValueError, match="no pages"):
        encode_pdf([])
    with pytest.raises(ValueError, match="non-WinAnsi"):
        encode_pdf(["日本語"])


def test_uncompressed_variant():
    pdf = encode_pdf(["plain text"], compress=False)
    assert b"FlateDecode" not in pdf
    assert extract_pdf_text(pdf) == ["plain text"]


# ------------------------------------------------------------- refusals


def test_encrypted_contract_r15():
    """r15: empty-user-password standard security decrypts
    transparently (the full matrix lives in tests/test_pdfcrypt.py);
    password-protected files still refuse BY NAME, and a dangling
    /Encrypt reference is malformed, not silently ignored."""
    assert extract_pdf_text(encode_pdf(["secret"], encrypt="rc4-128")) \
        == extract_pdf_text(encode_pdf(["secret"]))
    pdf = encode_pdf(["secret"]).replace(
        b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R"
    )
    with pytest.raises((NotImplementedError, ValueError)):
        extract_pdf_text(pdf)


def test_unsupported_filter_refuses_by_name():
    pdf = encode_pdf(["body"]).replace(b"/FlateDecode", b"/LZWDecode")
    with pytest.raises(NotImplementedError, match="LZWDecode"):
        extract_pdf_text(pdf)


def test_predictor_refuses_by_name():
    pdf = encode_pdf(["body"]).replace(
        b"/Filter /FlateDecode",
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 >>",
    )
    with pytest.raises(NotImplementedError, match="predictor"):
        extract_pdf_text(pdf)


def test_not_a_pdf_refuses():
    with pytest.raises(PdfError, match="header"):
        extract_pdf_text(b"%PNG nope")


# ------------------------------------------------- content heuristics


def _wrap_content(content: bytes) -> bytes:
    """Minimal one-page PDF around a raw content stream."""
    pdf = encode_pdf(["placeholder"], compress=False)
    old = b"BT\n/F1 11 Tf\n13 TL\n72 720 Td\n(placeholder) Tj\nET\n"
    assert old in pdf
    head, _, tail = pdf.partition(old)
    # fix Length: find the stream object's /Length
    new = head + content + tail
    new = new.replace(
        f"/Length {len(old)}".encode(), f"/Length {len(content)}".encode()
    )
    return new


def test_tj_kern_space_heuristic():
    # TeX-style: words separated by kerns below SPACE_KERN, letter
    # kerns above it stay glued
    content = (b"BT /F1 10 Tf 72 720 Td "
               b"[(Shar)20(ed)-278(MIME)-50(-info)] TJ ET")
    pdf = _wrap_content(content)
    assert extract_pdf_text(pdf) == ["Shared MIME-info"]
    assert SPACE_KERN == -100.0


def test_line_moves_and_quote_ops():
    content = (b"BT /F1 10 Tf 72 720 Td (one) Tj 0 -12 Td (two) Tj "
               b"10 0 Td (glued) Tj T* (three) Tj (four) ' ET")
    pdf = _wrap_content(content)
    assert extract_pdf_text(pdf) == ["one\ntwoglued\nthree\nfour"]


def test_differences_encoding_glyph_names():
    # a font with /Differences remapping code 65 ('A') to /fi and 66
    # to /endash; also /uniXXXX algorithmic names
    pdf = encode_pdf(["AB C"], compress=False)
    pdf = pdf.replace(
        b"/Encoding /WinAnsiEncoding",
        b"/Encoding << /Differences [65 /fi /endash 67 /uni0051] >>",
    )
    assert extract_pdf_text(pdf) == ["ﬁ– Q"]


# ------------------------------------------------------ foreign fixtures


@pytest.mark.parametrize("path", _FOREIGN)
def test_foreign_pdfs_extract_real_text(path):
    if not os.path.exists(path):
        pytest.skip(f"{path} not in this container")
    data = open(path, "rb").read()
    info = pdf_info(data)
    pages = extract_pdf_text(data)
    assert info["n_pages"] == len(pages) and len(pages) >= 17
    text = "\n".join(pages)
    # real sentences, not mojibake: mostly printable ASCII letters
    letters = sum(c.isalpha() for c in text)
    assert letters > 0.5 * len(text.replace("\n", "").replace(" ", ""))
    assert text.count("�") < 0.005 * len(text)
    if "mime" in path:
        assert "Shared MIME-info Database" in pages[0]
        assert info["n_pages"] == 17
    else:
        assert "Libtasn1" in pages[0]
        assert info["n_pages"] == 36


# ------------------------------------------------------- spark operator


def test_pdf_pages_operator(spark):
    rows = [(i, encode_pdf([f"doc {i} page one", f"doc {i} page two"]))
            for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = pdf_pages(df).collect()
    assert len(out) == 12
    got = {(r["doc_id"], r["page"]): r["text"] for r in out}
    assert got[(3, 1)] == "doc 3 page two"
    # skip posture drops undecodable docs
    bad = spark.createDataFrame(
        [(0, encode_pdf(["ok"])), (1, b"%PDF-1.4 garbage")],
        "doc_id long, content binary",
    )
    assert pdf_pages(bad, on_error="skip").count() == 1
    with pytest.raises(Exception):
        pdf_pages(bad, on_error="error").collect()
    with pytest.raises(ValueError, match="on_error"):
        pdf_pages(df, on_error="zap")


def test_media_probe_pdf(spark):
    from muopdb_spark.operators.multimodal import media_probe

    df = spark.createDataFrame(
        [(0, encode_pdf(["hi"])), (1, b"%PDF-1.7 then junk"),
         (2, b"not a pdf")],
        "doc_id long, content binary",
    )
    rows = {r["doc_id"]: r for r in media_probe(df).collect()}
    assert rows[0]["format"] == "pdf"
    assert rows[0]["width"] == 612 and rows[0]["height"] == 792
    assert rows[1]["format"] == "pdf" and rows[1]["width"] is None
    assert rows[2]["format"] == "unknown"
