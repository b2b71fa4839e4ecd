"""BMP codec — pure numpy + struct from the public Windows
BITMAPINFOHEADER format (Microsoft, documented since Windows 3.0) —
completing the image-format set (PNG/JPEG/GIF in their own modules).

Decoder coverage (honest gates, refused by name):
  - BITMAPFILEHEADER + BITMAPINFOHEADER (40-byte) and the larger
    V4/V5 headers (extra fields skipped), BI_RGB uncompressed:
    1/4/8-bit palette, 16-bit (X1R5G5B5), 24-bit and 32-bit rows,
    bottom-up and top-down (negative height), 4-byte row padding
  - BI_BITFIELDS with arbitrary 16/32-bit channel masks (inline V2+
    masks or the three DWORDs after a 40-byte header)
  - BI_RLE4/BI_RLE8/JPEG/PNG embeddings raise NotImplementedError
    naming the compression; structural problems raise ValueError

Encoder: 24-bit BI_RGB bottom-up (the universally readable variant),
lossless for RGB input — fingerprint tests get exact roundtrips.

The foreign-encoder fixture tests pin the decoder against a real
third-party BMP of a known image (the same logo as the vendored
PNG/GIF/JPEG renditions).
"""

from __future__ import annotations

import struct

import numpy as np

_COMPRESSION_NAMES = {
    1: "BI_RLE8", 2: "BI_RLE4", 3: "BI_BITFIELDS", 4: "BI_JPEG",
    5: "BI_PNG", 6: "BI_ALPHABITFIELDS",
}


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode BMP bytes to uint8 (H, W, 3) RGB."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("decode_bmp: not a BMP (missing BM magic)")
    (_fsz, _res, off) = struct.unpack("<III", data[2:14])
    (hsz,) = struct.unpack("<I", data[14:18])
    if hsz < 40:
        raise NotImplementedError(
            f"decode_bmp: {hsz}-byte core/OS2 header unsupported "
            "(BITMAPINFOHEADER and larger only)"
        )
    w, h_signed, planes, bpp, comp, _isz, _xp, _yp, clr_used, _imp = \
        struct.unpack("<iiHHIIiiII", data[18:54])
    masks = None
    if comp == 3:  # BI_BITFIELDS: explicit per-channel masks
        if bpp not in (16, 32):
            raise ValueError(
                f"decode_bmp: BI_BITFIELDS with {bpp}-bit pixels"
            )
        # V2+ headers carry the RGB masks inline at byte 54; with the
        # 40-byte header they immediately follow it — same offset
        if len(data) < 66:
            raise ValueError("decode_bmp: truncated bitfield masks")
        masks = struct.unpack("<III", data[54:66])
        if any(m == 0 for m in masks):
            raise ValueError("decode_bmp: zero channel mask")
    elif comp != 0:
        raise NotImplementedError(
            "decode_bmp: compression "
            f"{_COMPRESSION_NAMES.get(comp, comp)} unsupported "
            "(BI_RGB and BI_BITFIELDS only)"
        )
    if w <= 0 or h_signed == 0:
        raise ValueError("decode_bmp: invalid dimensions")
    h = abs(h_signed)
    top_down = h_signed < 0
    if bpp not in (1, 4, 8, 16, 24, 32):
        raise NotImplementedError(
            f"decode_bmp: {bpp}-bit pixels unsupported"
        )

    # palette (BGRA quads) directly after the header block
    pal = None
    if bpp <= 8:
        n = clr_used or (1 << bpp)
        pstart = 14 + hsz
        quads = data[pstart:pstart + 4 * n]
        if len(quads) < 4 * n:
            raise ValueError("decode_bmp: truncated palette")
        pal = np.frombuffer(quads, np.uint8).reshape(n, 4)[:, [2, 1, 0]]

    stride = (w * bpp + 31) // 32 * 4
    body = data[off:off + stride * h]
    if len(body) < stride * h:
        raise ValueError("decode_bmp: truncated pixel data")
    rows = np.frombuffer(body, np.uint8).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]

    if bpp == 24:
        px = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]
        return np.ascontiguousarray(px)
    if bpp in (16, 32):
        if masks is None:  # BI_RGB defaults: X1R5G5B5 / XRGB8888
            masks = (0x7C00, 0x03E0, 0x001F) if bpp == 16 else \
                (0xFF0000, 0x00FF00, 0x0000FF)
        nb = bpp // 8
        v = rows[:, :w * nb].reshape(h, w, nb).astype(np.uint32)
        word = v[:, :, 0]
        for k in range(1, nb):
            word = word | (v[:, :, k] << (8 * k))
        chans = []
        for m in masks:
            shift = (m & -m).bit_length() - 1
            width = int(m >> shift).bit_length()
            c = (word >> shift) & ((1 << width) - 1)
            if width != 8:  # scale to 8 bits (linear, rounded)
                c = (c * 255 + ((1 << width) - 1) // 2) // \
                    ((1 << width) - 1)
            chans.append(c.astype(np.uint8))
        return np.stack(chans, axis=-1)
    # 1/4/8-bit palette indices
    if bpp == 8:
        idx = rows[:, :w]
    elif bpp == 4:
        nib = np.repeat(rows, 2, axis=1)
        nib[:, 0::2] >>= 4
        nib[:, 1::2] &= 0x0F
        idx = nib[:, :w]
    else:  # 1-bit
        bits = np.unpackbits(rows, axis=1)
        idx = bits[:, :w]
    if (idx >= len(pal)).any():
        raise ValueError("decode_bmp: palette index out of range")
    return pal[idx]


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode uint8 (H, W, 3) RGB — or (H, W) grayscale, broadcast —
    as a 24-bit BI_RGB bottom-up BMP (lossless)."""
    from muopdb_spark.operators.image import as_rgb_u8

    a = as_rgb_u8(arr, "encode_bmp")
    h, w = a.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)
    off = 14 + 40
    body = rows.tobytes()
    hdr = (
        b"BM" + struct.pack("<III", off + len(body), 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    )
    return hdr + body
