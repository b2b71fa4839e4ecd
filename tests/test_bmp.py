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
    with pytest.raises(NotImplementedError, match="BI_RLE8"):
        decode_bmp(_hand_bmp(1, 1, 8, bytes(4), bytes(4), comp=1))
    with pytest.raises(ValueError, match="shape|empty"):
        encode_bmp(np.zeros((0, 3, 3), np.uint8))
    good = encode_bmp(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(good[:-8])


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
