"""MJPEG-in-AVI frame extraction (operators/video.py): the RIFF/AVI
container walk + per-frame baseline JPEG decode. Test strategy mirrors
the other codecs: flat frames at quality=100 roundtrip pixel-exactly
(the JPEG fidelity contract), container structure is exercised incl.
'rec ' groupings and word-aligned odd-length chunks, refusals by name,
probe/decoder agreement, and the Spark operator end-to-end."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from muopdb_spark.operators.video import (
    decode_avi_mjpeg_frames,
    encode_avi_mjpeg,
    probe_avi,
    video_frame_features,
)


def _flat_frames(n=5, h=16, w=24):
    return [np.full((h, w), 40 + 10 * i, np.uint8) for i in range(n)]


def test_flat_q100_roundtrip_exact():
    frames = _flat_frames()
    out = list(decode_avi_mjpeg_frames(encode_avi_mjpeg(frames, quality=100)))
    assert [i for i, _ in out] == [0, 1, 2, 3, 4]
    for (_, px), f in zip(out, frames):
        assert np.array_equal(px, f)


def test_rgb_frames_and_sampling():
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (24, 32, 3), np.uint8) for _ in range(6)]
    avi = encode_avi_mjpeg(frames, fps=3, quality=95)
    assert [i for i, _ in decode_avi_mjpeg_frames(avi, every_n=2)] == [0, 2, 4]
    assert [i for i, _ in decode_avi_mjpeg_frames(avi, max_frames=2)] == [0, 1]
    _, px = next(decode_avi_mjpeg_frames(avi))
    psnr = 10 * np.log10(
        255 ** 2
        / ((px.astype(float) - frames[0].astype(float)) ** 2).mean()
    )
    assert px.shape == (24, 32, 3) and psnr > 30


def test_rec_grouped_movi_chunks_decode_in_order():
    # some muxers wrap frames in LIST 'rec ' groups — rebuild the movi
    # body with each chunk wrapped and assert identical output
    from muopdb_spark.operators.jpeg import encode_jpeg

    frames = _flat_frames(3)
    blobs = [encode_jpeg(f, quality=100) for f in frames]

    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    recs = b"".join(
        chunk(b"LIST", b"rec " + chunk(b"00dc", b)) for b in blobs
    )
    movi = chunk(b"LIST", b"movi" + recs)
    base = encode_avi_mjpeg(frames, quality=100)
    # splice: header list stays, movi replaced, idx1 dropped
    hdr_end = base.find(b"movi") - 8
    body = base[12:hdr_end] + movi
    data = b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body
    out = list(decode_avi_mjpeg_frames(data))
    assert [i for i, _ in out] == [0, 1, 2]
    for (_, px), f in zip(out, frames):
        assert np.array_equal(px, f)


def test_probe_agrees_with_decoder():
    frames = _flat_frames(8, h=32, w=48)
    avi = encode_avi_mjpeg(frames, fps=4, quality=100)
    p = probe_avi(avi)
    assert p["format"] == "avi"
    assert (p["width"], p["height"]) == (48, 32)
    assert abs(p["duration_s"] - 2.0) < 1e-6
    # total by contract
    assert probe_avi(b"RIFF\x04\x00\x00\x00WAVE") is None
    assert probe_avi(b"garbage") is None
    assert probe_avi(avi[:40]) is None or isinstance(probe_avi(avi[:40]), dict)


def test_media_probe_routes_avi_and_wav_separately(spark):
    from muopdb_spark.operators.audio import encode_wav
    from muopdb_spark.operators.multimodal import media_probe

    avi = encode_avi_mjpeg(_flat_frames(2), fps=2, quality=100)
    wav = encode_wav(np.zeros(800, np.int16), 8000)
    media = spark.createDataFrame(
        [(0, bytearray(avi)), (1, bytearray(wav))],
        "doc_id long, content binary",
    )
    rows = {r.doc_id: r for r in media_probe(media).collect()}
    assert rows[0].format == "avi" and rows[0].width == 24
    assert rows[1].format == "wav" and rows[1].sample_rate == 8000


def test_refusals_by_name():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        list(decode_avi_mjpeg_frames(b"not an avi"))
    # non-JPEG frame payload
    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", b"\x00\x01raw frame"))
    data = b"RIFF" + struct.pack("<I", len(movi) + 4) + b"AVI " + movi
    with pytest.raises(NotImplementedError, match="MJPEG streams only"):
        list(decode_avi_mjpeg_frames(data))


def _strip_dht(blob: bytes) -> bytes:
    """Remove every DHT segment via a marker walk (FF C4 bytes inside
    other payloads must survive)."""
    out = bytearray(blob[:2])
    pos = 2
    while pos + 4 <= len(blob):
        m = blob[pos + 1]
        if m == 0xDA:
            out += blob[pos:]
            return bytes(out)
        if m == 0xD9 or 0xD0 <= m <= 0xD7 or m == 0x01:
            out += blob[pos:pos + 2]
            pos += 2
            continue
        (ln,) = struct.unpack(">H", blob[pos + 2:pos + 4])
        if m != 0xC4:
            out += blob[pos:pos + 2 + ln]
        pos += 2 + ln
    return bytes(out)


def test_dht_less_mjpeg_decodes_via_standard_tables():
    """The MJPEG implicit-table convention: frames encoded with the
    T.81 Annex K.3 standard tables may omit their DHT segments; the
    decode must come out IDENTICAL to the table-carrying original.
    Uses the vendored foreign fixture (a real encoder that embeds the
    standard tables — our own encoder uses fixed-length tables and
    cannot exercise this)."""
    import os

    from muopdb_spark.operators.jpeg import decode_jpeg

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "media",
                       "2x2.jpg")
    blob = open(fix, "rb").read()
    stripped = _strip_dht(blob)
    assert b"\xff\xc4" not in stripped[:stripped.index(b"\xff\xda")]
    assert np.array_equal(decode_jpeg(stripped), decode_jpeg(blob))

    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", stripped) * 1)
    data = b"RIFF" + struct.pack("<I", len(movi) + 4) + b"AVI " + movi
    out = list(decode_avi_mjpeg_frames(data))
    assert len(out) == 1
    assert np.array_equal(out[0][1], decode_jpeg(blob))


def test_video_frame_features_operator(spark):
    frames_a = _flat_frames(4, h=16, w=16)
    rng = np.random.default_rng(1)
    frames_b = [rng.integers(0, 256, (8, 24), np.uint8) for _ in range(2)]
    media = spark.createDataFrame(
        [(0, bytearray(encode_avi_mjpeg(frames_a, quality=100))),
         (1, bytearray(encode_avi_mjpeg(frames_b, quality=95))),
         (2, bytearray(b"broken payload"))],
        "doc_id long, content binary",
    )
    rows = video_frame_features(media, on_error="skip").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert sorted(by_doc) == [0, 1]
    assert len(by_doc[0]) == 4 and len(by_doc[1]) == 2
    assert {(r.height, r.width) for r in by_doc[0]} == {(16, 16)}
    # q100 flat frames decode bit-exactly, so per-frame dhash equals
    # the hash of the source frame computed locally
    from muopdb_spark.operators.image import dhash64, to_gray

    expected = [dhash64(to_gray(f)) for f in frames_a]
    got = [r.dhash for r in sorted(by_doc[0], key=lambda r: r.frame_idx)]
    assert got == expected
    with pytest.raises(Exception):
        video_frame_features(media, on_error="raise").collect()


def test_every_n_validation():
    with pytest.raises(ValueError, match="every_n"):
        list(decode_avi_mjpeg_frames(b"RIFF\x00\x00\x00\x00AVI ", every_n=0))
    with pytest.raises(ValueError, match="no frames"):
        encode_avi_mjpeg([])
    with pytest.raises(ValueError, match="fps"):
        encode_avi_mjpeg(_flat_frames(1), fps=0)


def test_standard_tables_match_foreign_fixture_dht():
    """The Annex K.3 constants in jpeg.py must equal the DHT payloads
    a real-world encoder embedded in the vendored fixture — the
    constants are extracted data, not memory."""
    import os

    from muopdb_spark.operators.jpeg import _STD_DHT

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "media",
                       "2x2.jpg")
    blob = open(fix, "rb").read()
    found = {}
    pos = 2
    while pos + 4 <= len(blob):
        m = blob[pos + 1]
        if m in (0xD9, 0xDA):
            break
        (ln,) = struct.unpack(">H", blob[pos + 2:pos + 4])
        if m == 0xC4:
            body = blob[pos + 4:pos + 2 + ln]
            p = 0
            while p + 17 <= len(body):
                tc, th = body[p] >> 4, body[p] & 15
                n = sum(body[p + 1:p + 17])
                found[(tc, th)] = bytes(body[p + 1:p + 17 + n])
                p += 17 + n
        pos += 2 + ln
    # the grayscale fixture carries the luminance pair; chrominance is
    # cross-validated against other in-environment files at extraction
    # time (see the _STD_DHT docstring)
    assert found[(0, 0)] == _STD_DHT[(0, 0)]
    assert found[(1, 0)] == _STD_DHT[(1, 0)]
