"""Pure-stdlib PNG codec + perceptual-hash image near-dup (the
multimodal family's decode step, made real without PIL). Mirrors the
HDF5 source's test strategy: spec-level crafted inputs (every scanline
filter type, palette, CRC corruption) plus operator-level Spark checks.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from muopdb_spark.operators.image import (
    _PNG_MAGIC,
    ahash64,
    area_resize,
    decode_png,
    dhash64,
    encode_png,
    image_features,
    image_near_dup,
    to_gray,
)


def _chunk(typ: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))


def _png_with_filters(img: np.ndarray, ftypes: list[int],
                      color_type: int = 0, plte: bytes | None = None) -> bytes:
    """Forward-filter each scanline with the given per-row filter type
    (spec section 9: Sub/Up/Average/Paeth) and assemble a valid PNG —
    the encoder only emits type 0, so this exercises the decoder's
    unfilter paths against independently-written filter math."""
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    flat = img.reshape(h, w * ch).astype(np.int32)
    bpp = ch
    raw = bytearray()
    prev = np.zeros(w * ch, np.int32)
    for r in range(h):
        cur = flat[r]
        ft = ftypes[r % len(ftypes)]
        line = np.zeros(w * ch, np.int32)
        for i in range(w * ch):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                da, db, dc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (da <= db and da <= dc) else (b if db <= dc else c)
            line[i] = (cur[i] - pred) & 0xFF
        raw.append(ft)
        raw.extend(line.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    parts = [_PNG_MAGIC, _chunk(b"IHDR", ihdr)]
    if plte is not None:
        parts.append(_chunk(b"PLTE", plte))
    parts.append(_chunk(b"IDAT", zlib.compress(bytes(raw))))
    parts.append(_chunk(b"IEND", b""))
    return b"".join(parts)


# ------------------------------------------------------------- codec


def test_roundtrip_gray_rgb_rgba():
    rng = np.random.default_rng(42)
    g = rng.integers(0, 256, (16, 18), dtype=np.uint8)
    assert (decode_png(encode_png(g)) == g).all()
    rgb = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    assert (decode_png(encode_png(rgb)) == rgb).all()
    rgba = rng.integers(0, 256, (4, 9, 4), dtype=np.uint8)
    assert (decode_png(encode_png(rgba)) == rgba).all()


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_decoder_inverts_every_scanline_filter(ftypes):
    rng = np.random.default_rng(sum(ftypes) + 7)
    img = rng.integers(0, 256, (10, 6), dtype=np.uint8)
    assert (decode_png(_png_with_filters(img, ftypes)) == img).all()
    rgb = rng.integers(0, 256, (8, 5, 3), dtype=np.uint8)
    assert (decode_png(_png_with_filters(rgb, ftypes, color_type=2)) == rgb).all()


def test_palette_decodes_through_plte():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 4, (6, 7), dtype=np.uint8)
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                    dtype=np.uint8)
    png = _png_with_filters(idx, [0], color_type=3, plte=plte.tobytes())
    out = decode_png(png)
    assert out.shape == (6, 7, 3)
    assert (out == plte[idx]).all()


def test_palette_index_out_of_range_rejected():
    idx = np.full((2, 2), 5, dtype=np.uint8)  # palette has 2 entries
    png = _png_with_filters(idx, [0], color_type=3,
                            plte=bytes([0, 0, 0, 255, 255, 255]))
    with pytest.raises(ValueError, match="palette index"):
        decode_png(png)


def test_crc_corruption_detected():
    png = bytearray(encode_png(np.zeros((4, 4), np.uint8)))
    # flip a byte inside the IDAT body (after its 8-byte header)
    i = bytes(png).index(b"IDAT") + 4 + 2
    png[i] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(png))


def test_unsupported_features_refused_by_name():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a not a png at all")
    # invalid interlace method (0=none and 1=Adam7 are the only legal
    # values; Adam7 is SUPPORTED since late r12)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 2)
    png = _PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlace"):
        decode_png(png)
    # sub-byte depths still refuse by name (16-bit decodes since r12)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 2, 0, 0, 0, 0)
    png = _PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="bit depth 2"):
        decode_png(png)
    # truncated chunk
    good = encode_png(np.zeros((4, 4), np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:-6])


def test_ancillary_chunks_skipped_after_crc_check():
    g = np.arange(16, dtype=np.uint8).reshape(4, 4)
    png = encode_png(g)
    # splice a tEXt chunk between IHDR and IDAT
    i = bytes(png).index(b"IDAT") - 4
    spliced = png[:i] + _chunk(b"tEXt", b"k\x00v") + png[i:]
    assert (decode_png(spliced) == g).all()


# -------------------------------------------------- perceptual hashes


def test_hashes_invariant_under_brightness_shift():
    rng = np.random.default_rng(11)
    base = rng.integers(0, 199, (16, 18)).astype(np.uint8)
    for k in (1, 2, 50):
        shifted = (base.astype(np.int64) + k).astype(np.uint8)
        assert dhash64(to_gray(base)) == dhash64(to_gray(shifted))
        assert ahash64(to_gray(base)) == ahash64(to_gray(shifted))


def test_distinct_patterns_are_distant():
    rng = np.random.default_rng(5)
    hs = [dhash64(to_gray(rng.integers(0, 199, (16, 18)).astype(np.uint8)))
          for _ in range(24)]
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            d = bin((hs[i] ^ hs[j]) & ((1 << 64) - 1)).count("1")
            assert d > 10, (i, j, d)


def test_area_resize_exact_for_integer_ratio():
    a = np.arange(16 * 18, dtype=np.float64).reshape(16, 18)
    assert np.array_equal(area_resize(a, 8, 9),
                          a.reshape(8, 2, 9, 2).mean(axis=(1, 3)))


def test_hash_range_is_signed_int64():
    # force the top bit: all-decreasing gradient sets bit 63
    g = np.tile(np.arange(18, 0, -1, dtype=np.float64) * 10, (16, 1))
    h = dhash64(g)
    assert -(1 << 63) <= h < (1 << 63) and h < 0  # top bit set -> negative


# --------------------------------------------------- Spark operators


def _media(spark, imgs):
    return spark.createDataFrame(
        [(i, bytearray(encode_png(im))) for i, im in imgs],
        "doc_id long, content binary",
    )


def test_image_features_matches_local_codec(spark):
    rng = np.random.default_rng(23)
    imgs = [(i, rng.integers(0, 256, (16, 18), dtype=np.uint8))
            for i in range(6)]
    out = {r.doc_id: r for r in image_features(_media(spark, imgs)).collect()}
    assert len(out) == 6
    for i, im in imgs:
        r = out[i]
        assert (r.width, r.height, r.channels) == (18, 16, 1)
        assert r.ahash == ahash64(to_gray(im))
        assert r.dhash == dhash64(to_gray(im))


def test_image_features_on_error_skip(spark):
    rng = np.random.default_rng(2)
    good = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(good))), (2, bytearray(b"not a png"))],
        "doc_id long, content binary",
    )
    with pytest.raises(Exception):
        image_features(df).collect()
    rows = image_features(df, on_error="skip").collect()
    assert [r.doc_id for r in rows] == [1]


def test_image_near_dup_recovers_planted_pairs(spark):
    rng = np.random.default_rng(9)
    base_a = rng.integers(0, 199, (16, 18)).astype(np.uint8)
    base_b = rng.integers(0, 199, (16, 18)).astype(np.uint8)
    # planted near-dups: brightness shifts of base_a (hamming 0)
    shift1 = (base_a.astype(np.int64) + 3).astype(np.uint8)
    # a small local edit: bump one 2x2 cell hard — flips only the
    # gradient bits that cell participates in. Scan positions until one
    # lands at local hamming 1..3 (deterministic given the seed).
    h_a = dhash64(to_gray(base_a))
    edit = local_h = None
    for r0 in range(0, 16, 2):
        for c0 in range(0, 18, 2):
            cand = base_a.copy()
            cand[r0:r0 + 2, c0:c0 + 2] = 255
            d = bin((h_a ^ dhash64(to_gray(cand))) & ((1 << 64) - 1)).count("1")
            if 1 <= d <= 3:
                edit, local_h = cand, d
                break
        if edit is not None:
            break
    assert edit is not None
    pairs = image_near_dup(
        _media(spark, [(0, base_a), (1, shift1), (2, edit), (3, base_b)]),
        max_hamming=3,
    ).collect()
    got = {(r.a_id, r.b_id): r.hamming for r in pairs}
    assert got[(0, 1)] == 0
    assert got[(0, 2)] == local_h
    # base_b is unrelated: no pair with it at hamming <= 3
    assert not any(3 in p for p in got), got


def test_image_near_dup_exact_recall_all_band_splits(spark):
    # adversarial placement: 3 flipped bits all in DIFFERENT bands of
    # the 4x16 split still must be recovered (pigeonhole leaves band 3
    # intact). Flip dhash bits directly by feeding a custom feats table.
    from pyspark.sql import functions as F  # noqa: F401

    base = 0x0123456789ABCDEF
    variant = base ^ (1 << 0) ^ (1 << 16) ^ (1 << 32)  # bands 0,1,2
    feats = spark.createDataFrame(
        [(0, base - (1 << 64) if base >= (1 << 63) else base),
         (1, variant - (1 << 64) if variant >= (1 << 63) else variant)],
        "doc_id long, dhash long",
    )
    pairs = image_near_dup(None, feats=feats, max_hamming=3).collect()
    assert len(pairs) == 1 and pairs[0].hamming == 3


# ------------------------------------------- multimodal decode routing


def test_decode_image_pure_png_route(spark):
    from muopdb_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(31)
    g = rng.integers(0, 256, (12, 10), dtype=np.uint8)
    rgb = rng.integers(0, 256, (6, 20, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "image/png", bytearray(encode_png(g)), 0),
         (2, "image/png", bytearray(encode_png(rgb)), 0)],
        "doc_id long, media_type string, content binary, n_bytes long",
    )
    out = {r.doc_id: r for r in decode_image(media, max_side=256).collect()}
    assert (out[1].width, out[1].height) == (10, 12)
    assert out[1].pixels == g.astype(np.int64).ravel().tolist()
    assert (out[2].width, out[2].height) == (20, 6)
    assert out[2].pixels == rgb.astype(np.int64).ravel().tolist()


def test_decode_image_thumbnail_shrinks(spark):
    from muopdb_spark.operators.multimodal import decode_image

    g = np.zeros((40, 80), np.uint8)
    media = spark.createDataFrame(
        [(1, "image/png", bytearray(encode_png(g)), 0)],
        "doc_id long, media_type string, content binary, n_bytes long",
    )
    r = decode_image(media, max_side=20).collect()[0]
    assert (r.width, r.height) == (20, 10)
    assert len(r.pixels) == 200 and set(r.pixels) == {0}


def test_decode_image_unknown_magic_refused_without_pil(spark):
    # PNG/JPEG/GIF decode through the pure codecs (GIF since r13); an
    # unrecognized magic (TIFF here) still refuses by name
    from muopdb_spark.operators.multimodal import _try_import_pil, decode_image

    if _try_import_pil() is not None:
        pytest.skip("PIL installed; pure route not taken")
    media = spark.createDataFrame(
        [(1, "image/tiff", bytearray(b"II*\x00 not decodable here"), 0)],
        "doc_id long, media_type string, content binary, n_bytes long",
    )
    with pytest.raises(Exception, match="magic"):
        decode_image(media).collect()


# ------------------------------------------------------- media probe


def _jpeg(w, h, nc=3):
    # SOI + APP0(JFIF) + SOF0 + SOS-less EOI: a valid marker stream up
    # to the frame header, which is all the probe reads
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
    sof = (b"\xff\xc0" + (8 + 3 * nc).to_bytes(2, "big") + bytes([8])
           + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
           + bytes(3 * nc))
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def _gif(w, h):
    return (b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + bytes(3))


def _bmp(w, h):
    return (b"BM" + bytes(16) + w.to_bytes(4, "little")
            + h.to_bytes(4, "little") + bytes(10))


def _box(typ, body):
    return (len(body) + 8).to_bytes(4, "big") + typ + body


def _mp4(w, h, dur_ts, timescale=1000):
    mvhd = _box(b"mvhd", bytes(12) + timescale.to_bytes(4, "big")
                + dur_ts.to_bytes(4, "big") + bytes(80))
    tkhd = _box(b"tkhd", bytes(76) + (w << 16).to_bytes(4, "big")
                + (h << 16).to_bytes(4, "big"))
    moov = _box(b"moov", mvhd + _box(b"trak", tkhd))
    return _box(b"ftyp", b"isom" + bytes(8)) + moov


def test_media_probe_all_formats(spark):
    from muopdb_spark.operators.audio import encode_wav
    from muopdb_spark.operators.multimodal import media_probe

    rng = np.random.default_rng(17)
    png = encode_png(rng.integers(0, 256, (12, 34, 3), dtype=np.uint8))
    wav = encode_wav(np.zeros(8000, dtype=np.int16), 16000)
    rows = [
        (0, bytearray(png)),
        (1, bytearray(wav)),
        (2, bytearray(_jpeg(640, 480))),
        (3, bytearray(_gif(320, 200))),
        (4, bytearray(_bmp(100, 50))),
        (5, bytearray(_mp4(1280, 720, 2500))),
        (6, bytearray(b"\x00\x01plain junk")),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r.doc_id: r.asDict() for r in media_probe(df).collect()}
    assert out[0] == {"doc_id": 0, "format": "png", "width": 34,
                      "height": 12, "channels": 3, "sample_rate": None,
                      "duration_s": None, "n_bytes": len(png)}
    assert out[1]["format"] == "wav" and out[1]["sample_rate"] == 16000
    assert out[1]["duration_s"] == 0.5 and out[1]["channels"] == 1
    assert (out[2]["format"], out[2]["width"], out[2]["height"],
            out[2]["channels"]) == ("jpeg", 640, 480, 3)
    assert (out[3]["format"], out[3]["width"], out[3]["height"]) == \
        ("gif", 320, 200)
    assert (out[4]["format"], out[4]["width"], out[4]["height"]) == \
        ("bmp", 100, 50)
    assert (out[5]["format"], out[5]["width"], out[5]["height"],
            out[5]["duration_s"]) == ("mp4", 1280, 720, 2.5)
    assert out[6]["format"] == "unknown" and out[6]["n_bytes"] == 12
    assert out[7]["format"] == "unknown" and out[7]["n_bytes"] == 0


def test_media_probe_total_on_adversarial_bytes(spark):
    # truncated/corrupt payloads of every magic must land in a row
    # (format may degrade to 'unknown'), never raise — the probe is
    # the FIRST pass over an untrusted crawl
    from muopdb_spark.operators.multimodal import media_probe

    rows = [(i, bytearray(p)) for i, p in enumerate([
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 5,       # truncated PNG
        b"\xff\xd8\xff",                           # truncated JPEG
        b"\xff\xd8" + b"\xff\xc0\x00\x03\x08",     # SOF too short
        b"GIF89a\x01",                             # truncated GIF
        b"BM\x00",                                 # truncated BMP
        b"RIFF\x04\x00\x00\x00WAVE",               # WAV without fmt
        b"\x00\x00\x00\x08ftyp",                   # MP4 ftyp only
        b"\x00\x00\x00\x20ftypisom" + b"\x00" * 8  # bad box size
        + b"\xff\xff\xff\xffmoov",
    ])]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = media_probe(df).collect()
    assert len(out) == len(rows)  # total: every row lands


def test_hash64_near_dup_max_hamming_zero_exact_equality(spark):
    # r12 review: bands=1 (exact dedup) must not build a 64-bit mask
    # literal; negative thresholds raise
    from muopdb_spark.operators.image import hash64_near_dup

    feats = spark.createDataFrame(
        [(0, -42), (1, -42), (2, 7)], "doc_id long, dhash long",
    )
    pairs = hash64_near_dup(feats, hash_col="dhash", max_hamming=0).collect()
    assert [(r.a_id, r.b_id, r.hamming) for r in pairs] == [(0, 1, 0)]
    with pytest.raises(ValueError, match="max_hamming"):
        hash64_near_dup(feats, hash_col="dhash", max_hamming=-1)


def test_media_probe_wav_zero_rate_still_wav(spark):
    # r12 review: rate=0 must not demote a sniffed WAV to 'unknown'
    from muopdb_spark.operators.audio import encode_wav
    from muopdb_spark.operators.multimodal import media_probe

    raw = bytearray(encode_wav(np.ones(64, dtype=np.int16), 8000))
    i = bytes(raw).index(b"fmt ") + 8 + 4
    raw[i:i + 4] = (0).to_bytes(4, "little")
    df = spark.createDataFrame([(1, raw)], "doc_id long, content binary")
    r = media_probe(df).collect()[0]
    assert r.format == "wav" and r.sample_rate == 0 and r.duration_s is None


def test_media_probe_jpeg_fill_bytes(spark):
    # r12 review: spec-legal 0xFF padding before markers must not
    # desync the SOF walk
    from muopdb_spark.operators.multimodal import media_probe

    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
    sof = (b"\xff\xc0" + (17).to_bytes(2, "big") + bytes([8])
           + (480).to_bytes(2, "big") + (640).to_bytes(2, "big")
           + bytes([3]) + bytes(9))
    padded = b"\xff\xd8" + b"\xff\xff\xff" + app0[1:] + b"\xff\xff" + sof[1:]
    df = spark.createDataFrame([(1, bytearray(padded))],
                               "doc_id long, content binary")
    r = media_probe(df).collect()[0]
    assert (r.format, r.width, r.height) == ("jpeg", 640, 480)


# ------------------------------------------- Adam7 + 16-bit (r12 late)


_ADAM7 = ((0, 8, 0, 8), (0, 8, 4, 8), (4, 8, 0, 4), (0, 4, 2, 4),
          (2, 4, 0, 2), (0, 2, 1, 2), (1, 2, 0, 1))


def _interlace_adam7(img: np.ndarray, color_type: int = 0,
                     ftypes: list[int] | None = None) -> bytes:
    """Forward Adam7 interlacer (independent of the decoder): split the
    image into the seven passes, forward-filter each pass's scanlines,
    and assemble a valid interlaced PNG."""
    ftypes = ftypes or [0]
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    raw = bytearray()
    for r0, rs, c0, cs in _ADAM7:
        sub = img[r0::rs, c0::cs]
        if sub.size == 0:
            continue
        ph, pw = sub.shape[:2]
        flat = sub.reshape(ph, pw * ch).astype(np.int32)
        prev = np.zeros(pw * ch, np.int32)
        for r in range(ph):
            ft = ftypes[r % len(ftypes)]
            line = np.zeros(pw * ch, np.int32)
            for i in range(pw * ch):
                a = flat[r][i - ch] if i >= ch else 0
                b = prev[i]
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = a
                else:  # Up
                    pred = b
                line[i] = (flat[r][i] - pred) & 0xFF
            raw.append(ft)
            raw.extend(line.astype(np.uint8).tobytes())
            prev = flat[r]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1)
    return (_PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


@pytest.mark.parametrize("shape", [(16, 18), (7, 5), (1, 1), (3, 9),
                                   (8, 1), (9, 8)])
def test_adam7_interlaced_decodes(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    assert (decode_png(_interlace_adam7(img)) == img).all()
    # per-pass filters other than None
    assert (decode_png(_interlace_adam7(img, ftypes=[0, 1, 2])) == img).all()


def test_adam7_rgb_and_truncation():
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, (10, 11, 3), dtype=np.uint8)
    png = _interlace_adam7(rgb, color_type=2)
    assert (decode_png(png) == rgb).all()
    # cut bytes out of the IDAT stream: truncated pass must raise
    i = bytes(png).index(b"IDAT") - 4
    j = bytes(png).index(b"IEND") - 4
    idat = zlib.decompress(png[i + 8:j - 4])
    short = _chunk(b"IDAT", zlib.compress(idat[:-40]))
    with pytest.raises(ValueError, match="Adam7|truncated"):
        decode_png(png[:i] + short + png[j:])


def test_16bit_roundtrip_and_gray():
    rng = np.random.default_rng(4)
    g16 = rng.integers(0, 65536, (9, 7), dtype=np.uint16)
    back = decode_png(encode_png(g16))
    assert back.dtype == np.uint16 and (back == g16).all()
    rgb16 = rng.integers(0, 65536, (4, 5, 3), dtype=np.uint16)
    back = decode_png(encode_png(rgb16))
    assert back.dtype == np.uint16 and (back == rgb16).all()
    # hashes operate on relative structure — 16-bit grays hash fine
    assert isinstance(dhash64(to_gray(back)), int)
    # 1/2/4-bit depths still refuse by name
    ihdr = struct.pack(">IIBBBBB", 4, 4, 4, 0, 0, 0, 0)
    png = _PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="bit depth 4"):
        decode_png(png)


# ------------------------------------------------- property roundtrips


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(h=st.integers(1, 24), w=st.integers(1, 24),
       ch=st.sampled_from([1, 3, 4]), wide=st.booleans(),
       interlace=st.booleans(), seed=st.integers(0, 2**31 - 1))
def test_png_roundtrip_property(h, w, ch, wide, interlace, seed):
    """Any shape x channel count x bit depth survives encode -> decode
    bit-exactly; interlaced files (via the independent forward
    interlacer) decode to the original for every geometry."""
    rng = np.random.default_rng(seed)
    if wide:
        img = rng.integers(0, 65536, (h, w) if ch == 1 else (h, w, ch),
                           dtype=np.uint16)
        interlace = False  # the test interlacer is 8-bit-only
    else:
        img = rng.integers(0, 256, (h, w) if ch == 1 else (h, w, ch),
                           dtype=np.uint8)
    if interlace:
        ctype = {1: 0, 3: 2, 4: 6}[ch]
        out = decode_png(_interlace_adam7(img, color_type=ctype,
                                          ftypes=[0, 1, 2]))
    else:
        out = decode_png(encode_png(img))
    assert out.dtype == img.dtype and (out == img).all()


def test_decoders_total_under_byte_fuzz():
    """Mutation fuzz over every pure decoder: flip random bytes in
    valid files (and feed pure-random buffers) — decoders must return
    or raise, never hang or loop. Pipelines rely on this totality
    (on_error='skip' catches exceptions, not infinite loops)."""
    from muopdb_spark.operators.audio import decode_wav, encode_wav
    from muopdb_spark.operators.image import decode_image_bytes
    from muopdb_spark.operators.jpeg import encode_jpeg
    from muopdb_spark.operators.multimodal import _PROBES

    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (12, 14), dtype=np.uint8)
    from muopdb_spark.operators.bmp import encode_bmp
    from muopdb_spark.operators.gif import encode_gif

    seeds = [
        encode_png(img),
        encode_jpeg(img, quality=90),
        encode_jpeg(img, quality=90, progressive=True),
        encode_gif((img // 32 * 32)),
        encode_bmp(img),
        encode_wav(rng.integers(-100, 100, 200, dtype=np.int16), 8000),
    ]
    n_ok = n_err = 0
    for seed_blob in seeds:
        for _ in range(120):
            raw = bytearray(seed_blob)
            for _k in range(int(rng.integers(1, 6))):
                raw[int(rng.integers(0, len(raw)))] = int(rng.integers(0, 256))
            blob = bytes(raw)
            for fn in (decode_image_bytes, decode_wav):
                try:
                    fn(blob)
                    n_ok += 1
                except Exception:
                    n_err += 1
            for probe in _PROBES:
                try:
                    probe(blob)
                except Exception:
                    pass
    # pure-random buffers too
    for _ in range(60):
        blob = bytes(rng.integers(0, 256, int(rng.integers(0, 400)),
                                  dtype=np.uint8))
        for fn in (decode_image_bytes, decode_wav):
            try:
                fn(blob)
            except Exception:
                pass
    assert n_err > 0  # mutations really do break files
