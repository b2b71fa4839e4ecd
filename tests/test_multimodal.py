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
