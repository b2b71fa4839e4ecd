"""BMP codec (pure numpy/struct, Windows BITMAPINFOHEADER). BMP is
lossless, so every roundtrip is exact; hand-built files exercise the
palette depths and pixel layouts our 24-bit encoder never emits, and
the vendored foreign fixture must equal the PNG rendition of the same
image BIT-FOR-BIT (both lossless)."""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from muopdb_spark.operators.bmp import decode_bmp, encode_bmp

_FIX = os.path.join(os.path.dirname(__file__), "fixtures", "media")


@pytest.mark.parametrize("shape", [(16, 16, 3), (7, 13, 3), (1, 1, 3),
                                   (5, 3, 3), (33, 2, 3)])
def test_exact_roundtrip_24bit(shape):
    a = np.random.default_rng(shape[0]).integers(0, 256, shape, np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(a)), a)


def test_grayscale_broadcast():
    g = np.random.default_rng(1).integers(0, 256, (9, 11), np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(g)), np.stack([g] * 3, -1))


def _hand_bmp(w, h, bpp, pal, rows_bytes, *, comp=0, extra=b"",
              top_down=False):
    hdr_info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp, comp,
        len(rows_bytes), 0, 0, len(pal) // 4 if pal else 0, 0,
    )
    off = 14 + 40 + len(extra) + len(pal)
    return (b"BM" + struct.pack("<III", off + len(rows_bytes), 0, off)
            + hdr_info + extra + pal + rows_bytes)


def test_hand_built_8bit_palette_bottom_up():
    # 2x2, palette [red, green, blue, white]; bottom-up rows with
    # 4-byte padding: file rows are (bottom) [2,3], (top) [0,1]
    pal = bytes([0, 0, 255, 0,  0, 255, 0, 0,  255, 0, 0, 0,
                 255, 255, 255, 0])  # BGRA quads
    rows = bytes([2, 3, 0, 0]) + bytes([0, 1, 0, 0])
    out = decode_bmp(_hand_bmp(2, 2, 8, pal, rows))
    exp = np.array([[[255, 0, 0], [0, 255, 0]],
                    [[0, 0, 255], [255, 255, 255]]], np.uint8)
    assert np.array_equal(out, exp)


def test_hand_built_4bit_and_1bit():
    pal2 = bytes([0, 0, 0, 0, 255, 255, 255, 0])  # black, white (BGR)
    # 1-bit 9x1: bits 101010101 -> bytes 0b10101010, 0b10000000, pad
    rows = bytes([0b10101010, 0b10000000, 0, 0])
    out = decode_bmp(_hand_bmp(9, 1, 1, pal2, rows))
    assert out.shape == (1, 9, 3)
    assert (out[0, ::2] == 255).all() and (out[0, 1::2] == 0).all()
    # 4-bit 3x1: nibbles 1,0,1 -> bytes 0x10, 0x10 + pad
    rows4 = bytes([0x10, 0x10, 0, 0])
    out4 = decode_bmp(_hand_bmp(3, 1, 4, pal2, rows4))
    assert (out4[0, 0] == 255).all() and (out4[0, 1] == 0).all() \
        and (out4[0, 2] == 255).all()


def test_hand_built_16bit_555_and_top_down():
    # one pixel, X1R5G5B5: R=31 G=0 B=31 -> magenta (255,0,255 after
    # 5->8 scaling)
    v = (31 << 10) | 31
    rows = struct.pack("<H", v) + b"\x00\x00"
    out = decode_bmp(_hand_bmp(1, 1, 16, b"", rows))
    assert tuple(out[0, 0]) == (255, 0, 255)
    # top-down 1x2: first file row is the TOP row
    pal = bytes([0, 0, 255, 0, 255, 0, 0, 0])
    rows = bytes([0, 0, 0, 0]) + bytes([1, 0, 0, 0])
    out = decode_bmp(_hand_bmp(1, 2, 8, pal, rows, top_down=True))
    assert tuple(out[0, 0]) == (255, 0, 0)   # palette 0 = red (BGR)
    assert tuple(out[1, 0]) == (0, 0, 255)


def test_bitfields_32bit():
    # BI_BITFIELDS with the masks inline after the 40-byte header
    masks = struct.pack("<III", 0xFF0000, 0x00FF00, 0x0000FF)
    rows = struct.pack("<I", (10 << 16) | (20 << 8) | 30)
    out = decode_bmp(_hand_bmp(1, 1, 32, b"", rows, comp=3, extra=masks))
    assert tuple(out[0, 0]) == (10, 20, 30)


def test_refusals_by_name():
    with pytest.raises(ValueError, match="BM magic"):
        decode_bmp(b"NOPE" + bytes(60))
    with pytest.raises(NotImplementedError, match="BI_JPEG"):
        decode_bmp(_hand_bmp(1, 1, 24, b"", bytes(4), comp=4))
    with pytest.raises(ValueError, match="shape|empty"):
        encode_bmp(np.zeros((0, 3, 3), np.uint8))
    good = encode_bmp(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(good[:-8])


# ------------------------------------------------------------ RLE (r14)

_PAL4 = bytes([0, 0, 255, 0,  0, 255, 0, 0,  255, 0, 0, 0,
               255, 255, 255, 0])  # red, green, blue, white (BGRA)
_RGB4 = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                  [255, 255, 255]], np.uint8)


def test_rle8_roundtrip_via_writer_twin():
    from muopdb_spark.operators.bmp import encode_bmp_rle8

    rng = np.random.default_rng(7)
    for shape in ((1, 1), (3, 9), (16, 16), (5, 255)):
        idx = rng.integers(0, 4, shape).astype(np.uint8)
        # long runs too, so the encoder's run coalescing is exercised
        idx[:, : shape[1] // 2] = 2
        out = decode_bmp(encode_bmp_rle8(idx, _RGB4))
        assert np.array_equal(out, _RGB4[idx])


def test_rle8_hand_stream_absolute_delta_and_fill():
    # 5x3 bottom-up: row0(bottom): run 2x idx1, absolute [2,3,1]
    # (3 literals + word pad); row1: delta skips to x=1 (fill stays),
    # run 1x idx3; row2: EOL immediately (all fill); EOB
    stream = bytes(
        [2, 1, 0, 3, 2, 3, 1, 0, 0, 0]  # run, abs(3)+pad, EOL
        + [0, 2, 1, 0, 1, 3, 0, 0]      # delta(+1,0), run 1x idx3, EOL
        + [0, 0]                         # row2 empty (EOL)
        + [0, 1]                         # EOB
    )
    bmp = _hand_bmp(5, 3, 8, _PAL4, stream, comp=1)
    out = decode_bmp(bmp)
    exp_idx = np.array([
        [0, 0, 0, 0, 0],   # top (file row 2): all fill
        [0, 3, 0, 0, 0],   # file row 1: delta skipped x=0, idx3 at x=1
        [1, 1, 2, 3, 1],   # bottom (file row 0)
    ], np.uint8)
    assert np.array_equal(out, _RGB4[exp_idx])


def test_rle4_hand_stream():
    # 5x2 bottom-up RLE4: row0: run 4 alternating idx1/idx2 then run
    # 1 idx3; row1: absolute 3 nibbles [0,1,2] (2 bytes + 1 pad),
    # rest fill
    stream = bytes(
        [4, 0x12, 1, 0x30, 0, 0]
        + [0, 3, 0x01, 0x20, 0, 0]
        + [0, 1]
    )
    bmp = _hand_bmp(5, 2, 4, _PAL4, stream, comp=2)
    out = decode_bmp(bmp)
    exp_idx = np.array([
        [0, 1, 2, 0, 0],   # top (file row 1): absolute 0,1,2 + fill
        [1, 2, 1, 2, 3],   # bottom (file row 0)
    ], np.uint8)
    assert np.array_equal(out, _RGB4[exp_idx])


def test_rle_errors_by_name():
    from muopdb_spark.operators.bmp import encode_bmp_rle8

    with pytest.raises(ValueError, match="bottom-up"):
        decode_bmp(_hand_bmp(2, 2, 8, _PAL4, bytes([0, 1]), comp=1,
                             top_down=True))
    with pytest.raises(ValueError, match="requires 8-bit"):
        decode_bmp(_hand_bmp(2, 2, 4, _PAL4, bytes([0, 1]), comp=1))
    with pytest.raises(ValueError, match="requires 4-bit"):
        decode_bmp(_hand_bmp(2, 2, 8, _PAL4, bytes([0, 1]), comp=2))
    with pytest.raises(ValueError, match="truncated RLE"):
        decode_bmp(_hand_bmp(2, 2, 8, _PAL4, bytes([5]), comp=1))
    with pytest.raises(ValueError, match="past row end"):
        decode_bmp(_hand_bmp(2, 2, 8, _PAL4, bytes([3, 1, 0, 1]), comp=1))
    with pytest.raises(ValueError, match="out of bounds"):
        decode_bmp(_hand_bmp(2, 2, 8, _PAL4,
                             bytes([0, 2, 9, 9, 0, 1]), comp=1))
    with pytest.raises(ValueError, match="palette"):
        encode_bmp_rle8(np.full((2, 2), 9, np.uint8), _RGB4)


def test_foreign_fixture_equals_png_exactly():
    """python.bmp and python.png are the SAME image through two
    lossless formats — the decoders must agree bit-for-bit."""
    from muopdb_spark.operators.image import decode_png

    bmp = decode_bmp(open(os.path.join(_FIX, "python.bmp"), "rb").read())
    png = decode_png(open(os.path.join(_FIX, "python.png"), "rb").read())
    if png.ndim == 2:
        png = np.stack([png] * 3, -1)
    assert np.array_equal(bmp, png[:, :, :3])


def test_decode_image_bytes_dispatches_bmp():
    from muopdb_spark.operators.image import decode_image_bytes

    a = np.random.default_rng(2).integers(0, 256, (12, 14, 3), np.uint8)
    assert np.array_equal(decode_image_bytes(encode_bmp(a)), a)


def test_truncated_bitfield_masks_is_value_error():
    hdr = (b"BM" + struct.pack("<III", 60, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 32, 3, 4,
                         0, 0, 0, 0))
    with pytest.raises(ValueError, match="truncated bitfield"):
        decode_bmp(hdr)  # ends at byte 54 — no room for the masks
