"""Multimodal binary-column plumbing: media schema, byte features,
frame sampling, decoder stub gating."""

import pytest
from pyspark.sql import functions as F

from muopdb_spark.operators.multimodal import (
    byte_histogram,
    byte_stats,
    decode_image,
    frame_sample,
    media_table,
)


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(1, "abcd" * 40), (2, "z"), (3, "")],
        "doc_id long, text string",
    )
    return media_table(df).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["doc_id", "media_type", "content", "n_bytes"]
    rows = {r["doc_id"]: r for r in media.collect()}
    assert rows[1]["n_bytes"] == 160
    assert bytes(rows[2]["content"]) == b"z"
    assert rows[1]["media_type"] == "text/plain"


def test_byte_stats_digest(media, spark):
    got = {r["doc_id"]: r["digest"] for r in byte_stats(media).collect()}
    import hashlib

    assert got[2] == hashlib.md5(b"z").hexdigest()


def test_byte_histogram(media):
    got = {r["doc_id"]: r["features"] for r in byte_histogram(media, bins=16).collect()}
    # 'abcd'*40: all bytes in 0x61-0x64 -> bin 6 (96-111); total count 160
    assert got[1][6] == 160 and sum(got[1]) == 160
    assert sum(got[3]) == 0  # empty payload -> zero histogram
    assert len(got[1]) == 16


def test_frame_sample(media):
    frames = frame_sample(media, frame_bytes=32, every_n=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 160 bytes -> 5 frames of 32, keep idx 0,2,4
    idxs = sorted(r["frame_idx"] for r in by_doc[1])
    assert idxs == [0, 2, 4]
    f0 = bytes([r for r in by_doc[1] if r["frame_idx"] == 0][0]["frame"])
    assert f0 == b"abcd" * 8
    # doc 2: 1 byte -> frame 0 only; doc 3 empty -> no frames
    assert [r["frame_idx"] for r in by_doc[2]] == [0]
    assert 3 not in by_doc


def test_decode_image_pure_route_without_pil(media):
    # r12: PIL absent no longer means a stub — decode_image routes PNG
    # and baseline-JPEG payloads through the pure-Python spec codecs.
    # The `media` fixture wraps TEXT payloads, which are neither: the
    # refusal is per-payload, naming the magic, at execution.
    with pytest.raises(Exception, match="magic"):
        decode_image(media).collect()
    # real PNG payloads decode (full coverage in tests/test_image.py)
    import numpy as np

    from muopdb_spark.operators.image import encode_png

    spark = media.sparkSession
    png = encode_png(np.arange(48, dtype=np.uint8).reshape(6, 8))
    df = spark.createDataFrame(
        [(1, "image/png", bytearray(png), len(png))],
        "doc_id long, media_type string, content binary, n_bytes long",
    )
    r = decode_image(df).collect()[0]
    assert (r.width, r.height) == (8, 6)
    assert r.pixels == list(range(48))


def test_hdf5_source_errors_are_plain(spark):
    # the HDF5 source is a REAL pure-Python reader since r10 (no h5py
    # gate any more — tests/test_hdf5.py covers it); missing files and
    # non-HDF5 bytes fail with ordinary, named errors
    from muopdb_spark.sources.hdf5 import read_hdf5_vectors

    with pytest.raises(FileNotFoundError):
        read_hdf5_vectors(spark, "/nonexistent.h5")


def test_probe_webp_tiff_ico_foreign_fixtures():
    """r14 probe-only formats, pinned on real third-party files (the
    same PSF logo as the png/gif/jpg fixtures, plus CPython's idle
    icon). These formats have NO decode path — triage only."""
    import os

    from muopdb_spark.operators.multimodal import (
        _probe_ico,
        _probe_tiff,
        _probe_webp,
    )

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "media")

    def rd(name):
        with open(os.path.join(fix, name), "rb") as fh:
            return fh.read()

    assert _probe_webp(rd("python.webp")) == {
        "format": "webp", "channels": 3, "width": 16, "height": 16}
    assert _probe_tiff(rd("python.tiff")) == {
        "format": "tiff", "channels": 3, "width": 16, "height": 16}
    assert _probe_ico(rd("idle.ico")) == {
        "format": "ico", "width": 16, "height": 16, "channels": 3}
    # hand-built variants: VP8 lossy + VP8L lossless + big-endian TIFF
    import struct

    vp8 = (b"RIFF" + struct.pack("<I", 22) + b"WEBPVP8 "
           + struct.pack("<I", 10) + b"\x00\x00\x00\x9d\x01\x2a"
           + struct.pack("<HH", 320, 240))
    assert _probe_webp(vp8)["width"] == 320
    assert _probe_webp(vp8)["height"] == 240
    bits = (24 - 1) | ((7 - 1) << 14)
    vp8l = (b"RIFF" + struct.pack("<I", 17) + b"WEBPVP8L"
            + struct.pack("<I", 5) + b"\x2f" + struct.pack("<I", bits))
    assert _probe_webp(vp8l)["width"] == 24
    assert _probe_webp(vp8l)["height"] == 7
    mm = (b"MM\x00*" + struct.pack(">I", 8)
          + struct.pack(">H", 2)
          + struct.pack(">HHIHH", 256, 3, 1, 33, 0)
          + struct.pack(">HHIHH", 257, 4, 1, 0, 44)[:8]
          + struct.pack(">I", 44)
          + struct.pack(">I", 0))
    got = _probe_tiff(mm)
    assert got["width"] == 33 and got["height"] == 44
    # garbage stays un-probed
    assert _probe_webp(b"RIFF....WAVE" + bytes(20)) is None
    assert _probe_tiff(b"II+\x00" + bytes(8)) is None
    assert _probe_ico(bytes(22)) is None


def test_media_probe_routes_new_formats(spark):
    import os

    from muopdb_spark.operators.multimodal import media_probe

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "media")
    rows = []
    for i, name in enumerate(("python.webp", "python.tiff", "idle.ico")):
        with open(os.path.join(fix, name), "rb") as fh:
            rows.append((i, bytearray(fh.read())))
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: (r["format"], r["width"], r["height"])
           for r in media_probe(df).collect()}
    assert got == {0: ("webp", 16, 16), 1: ("tiff", 16, 16),
                   2: ("ico", 16, 16)}
