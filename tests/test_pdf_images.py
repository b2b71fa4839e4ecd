"""Embedded-image extraction from PDFs (operators/pdf.py r14):
writer-twin roundtrips (FlateDecode RGB/Gray exact, DCTDecode through
the repo JPEG codec), named refusals via byte-patched variants (the
linear-reconstruction reader ignores xref offsets, so same-file
patches are valid PDFs), the Spark feature pass, and dHash parity
with the image near-dup family."""

from __future__ import annotations

import numpy as np
import pytest

from muopdb_spark.operators.image import area_resize, dhash64, to_gray
from muopdb_spark.operators.pdf import (
    encode_pdf_images,
    extract_pdf_images,
    extract_pdf_text,
    pdf_image_features,
)


def _rgb(h, w, seed=0):
    g = np.arange(h * w * 3, dtype=np.int64) * 37 + seed
    return (g % 251).astype(np.uint8).reshape(h, w, 3)


def _gray(h, w, seed=0):
    g = np.arange(h * w, dtype=np.int64) * 11 + seed
    return (g % 251).astype(np.uint8).reshape(h, w)


def test_flate_rgb_and_gray_roundtrip_exact():
    rgb, gray = _rgb(12, 20), _gray(9, 7, seed=5)
    pdf = encode_pdf_images([("hello fig", [rgb, gray])])
    ims = extract_pdf_images(pdf)
    assert [(i["page"], i["format"]) for i in ims] == [
        (0, "flate"), (0, "flate")
    ]
    np.testing.assert_array_equal(ims[0]["pixels"], rgb)
    np.testing.assert_array_equal(ims[1]["pixels"], gray)
    assert (ims[0]["width"], ims[0]["height"]) == (20, 12)
    # the text layer coexists with the images
    assert extract_pdf_text(pdf) == ["hello fig"]


def test_dct_roundtrip_via_repo_jpeg_codec():
    rgb = np.full((16, 16, 3), 128, np.uint8)
    rgb[:8, :8] = (200, 40, 90)
    pdf = encode_pdf_images([("", [("jpeg", rgb)])])
    ims = extract_pdf_images(pdf)
    assert [i["format"] for i in ims] == ["jpeg"]
    got = ims[0]["pixels"]
    assert got.shape == rgb.shape
    assert np.mean(np.abs(got.astype(int) - rgb.astype(int))) < 8


def test_multipage_mapping():
    pdf = encode_pdf_images(
        [("p0", [_rgb(4, 4)]), ("p1", []), ("p2", [_gray(4, 4), _rgb(6, 6)])]
    )
    ims = extract_pdf_images(pdf)
    assert [i["page"] for i in ims] == [0, 2, 2]
    assert extract_pdf_text(pdf) == ["p0", "p1", "p2"]


def test_no_images_is_empty_not_error():
    from muopdb_spark.operators.pdf import encode_pdf

    assert extract_pdf_images(encode_pdf(["just text"])) == []


def _patched(pdf: bytes, old: bytes, new: bytes) -> bytes:
    assert old in pdf
    return pdf.replace(old, new)


def test_refusals_by_name():
    pdf = encode_pdf_images([("", [_rgb(4, 4)])])
    with pytest.raises(NotImplementedError, match="color space"):
        extract_pdf_images(
            _patched(pdf, b"/ColorSpace /DeviceRGB", b"/ColorSpace /DeviceN12")
        )
    with pytest.raises(NotImplementedError, match="BitsPerComponent"):
        extract_pdf_images(
            _patched(pdf, b"/BitsPerComponent 8", b"/BitsPerComponent 4")
        )
    with pytest.raises(NotImplementedError, match="ImageMask"):
        extract_pdf_images(
            _patched(
                pdf,
                b"/Type /XObject /Subtype /Image",
                b"/ImageMask true /Subtype /Image",
            )
        )


def test_truncated_samples_raise_pdferror():
    from muopdb_spark.operators.pdf import PdfError

    pdf = encode_pdf_images([("", [_rgb(4, 4)])])
    # double the claimed height so the sample buffer is short
    bad = _patched(pdf, b"/Width 4 /Height 4", b"/Width 4 /Height 9")
    with pytest.raises(PdfError, match="sample bytes"):
        extract_pdf_images(bad)


def test_dhash_parity_with_image_family():
    rgb = _rgb(24, 32, seed=9)
    pdf = encode_pdf_images([("", [rgb])])
    im = extract_pdf_images(pdf)[0]
    want = dhash64(area_resize(to_gray(rgb), 8, 9))
    got = dhash64(area_resize(to_gray(im["pixels"]), 8, 9))
    assert got == want


def test_spark_pdf_image_features(spark):
    rows = []
    for d in range(8):
        imgs = [_rgb(8 + (d % 3) * 4, 16, seed=d)]
        if d % 2 == 0:
            imgs.append(("jpeg", _rgb(16, 16, seed=d + 100)))
        rows.append((d, bytearray(encode_pdf_images([("", imgs)]))))
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = pdf_image_features(df).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d in range(8):
        rs = sorted(by_doc[d], key=lambda r: r["img_idx"])
        assert len(rs) == (2 if d % 2 == 0 else 1)
        assert rs[0]["format"] == "flate"
        assert rs[0]["height"] == 8 + (d % 3) * 4
        want = dhash64(area_resize(to_gray(_rgb(8 + (d % 3) * 4, 16, seed=d)), 8, 9))
        assert rs[0]["dhash"] == want
        if d % 2 == 0:
            assert rs[1]["format"] == "jpeg"


def test_spark_on_error_skip(spark):
    rows = [
        (0, bytearray(encode_pdf_images([("", [_rgb(4, 4)])]))),
        (1, bytearray(b"%PDF-1.4 garbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = pdf_image_features(df, on_error="skip").collect()
    assert {r["doc_id"] for r in got} == {0}
    with pytest.raises(Exception):
        pdf_image_features(df, on_error="error").collect()
    with pytest.raises(ValueError, match="on_error"):
        pdf_image_features(df, on_error="nope")
