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
  - BI_RLE8 / BI_RLE4 run-length decoding (r14): encoded runs,
    absolute mode (word-aligned), end-of-line / end-of-bitmap /
    delta escapes (skipped cells read palette index 0, the de-facto
    convention); RLE bitmaps must be bottom-up per the format
  - BI_JPEG/BI_PNG embeddings raise NotImplementedError naming the
    compression; structural problems raise ValueError

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


def _decode_rle(
    body: bytes, w: int, h: int, *, four_bit: bool
) -> np.ndarray:
    """BI_RLE8/BI_RLE4 stream -> (h, w) palette-index plane in FILE
    row order (row 0 = bottom scanline). Encoded runs, absolute mode
    (word-aligned), 00/00 end-of-line, 00/01 end-of-bitmap, 00/02
    delta; cells never written stay 0 (the de-facto fill). Runs or
    moves past the row/bitmap bounds raise ValueError."""
    idx = np.zeros((h, w), np.uint8)
    x = y = 0
    i = 0
    n = len(body)
    while True:
        if i + 2 > n:
            raise ValueError("decode_bmp: truncated RLE stream")
        b0, b1 = body[i], body[i + 1]
        i += 2
        if b0 > 0:  # encoded run
            if y >= h or x + b0 > w:
                raise ValueError("decode_bmp: RLE run past row end")
            if four_bit:
                pair = (b1 >> 4, b1 & 0x0F)
                for k in range(b0):
                    idx[y, x + k] = pair[k & 1]
            else:
                idx[y, x:x + b0] = b1
            x += b0
        elif b1 == 0:  # end of line
            x, y = 0, y + 1
        elif b1 == 1:  # end of bitmap
            return idx
        elif b1 == 2:  # delta
            if i + 2 > n:
                raise ValueError("decode_bmp: truncated RLE delta")
            dx, dy = body[i], body[i + 1]
            i += 2
            x, y = x + dx, y + dy
            if y > h or x > w:
                raise ValueError("decode_bmp: RLE delta out of bounds")
        else:  # absolute mode: b1 literal pixels, word-aligned
            cnt = b1
            if y >= h or x + cnt > w:
                raise ValueError("decode_bmp: RLE absolute past row end")
            if four_bit:
                nbytes = (cnt + 1) // 2
                chunk = body[i:i + nbytes]
                if len(chunk) < nbytes:
                    raise ValueError("decode_bmp: truncated RLE literals")
                i += nbytes + (nbytes & 1)
                for k in range(cnt):
                    b = chunk[k // 2]
                    idx[y, x + k] = (b >> 4) if k % 2 == 0 else (b & 0x0F)
            else:
                chunk = body[i:i + cnt]
                if len(chunk) < cnt:
                    raise ValueError("decode_bmp: truncated RLE literals")
                i += cnt + (cnt & 1)
                idx[y, x:x + cnt] = np.frombuffer(chunk, np.uint8)
            x += cnt


def encode_bmp_rle8(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """BI_RLE8 writer twin: (h, w) uint8 palette indices + (n, 3) RGB
    palette -> a bottom-up RLE8 BMP (encoded runs + EOL/EOB escapes;
    deterministic). The roundtrip referee for the RLE decoder."""
    idx = np.asarray(idx)
    palette = np.asarray(palette, np.uint8)
    if idx.ndim != 2 or idx.size == 0:
        raise ValueError(f"encode_bmp_rle8: bad index shape {idx.shape}")
    if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) > 256:
        raise ValueError(
            f"encode_bmp_rle8: bad palette shape {palette.shape}"
        )
    if idx.max(initial=0) >= len(palette):
        raise ValueError("encode_bmp_rle8: index out of palette range")
    h, w = idx.shape
    out = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up scanlines
        row = idx[y]
        x = 0
        while x < w:
            run = 1
            while x + run < w and row[x + run] == row[x] and run < 255:
                run += 1
            out += bytes((run, int(row[x])))
            x += run
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    pal = np.zeros((len(palette), 4), np.uint8)
    pal[:, :3] = palette[:, ::-1]  # BGRA quads
    off = 14 + 40 + pal.size
    header = b"BM" + struct.pack("<III", off + len(out), 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(out), 2835, 2835,
        len(palette), 0,
    )
    return header + info + pal.tobytes() + bytes(out)


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
    elif comp in (1, 2):
        if (comp == 1 and bpp != 8) or (comp == 2 and bpp != 4):
            raise ValueError(
                f"decode_bmp: {_COMPRESSION_NAMES[comp]} requires "
                f"{'8' if comp == 1 else '4'}-bit pixels, got {bpp}"
            )
        if h_signed < 0:
            raise ValueError(
                "decode_bmp: RLE bitmaps must be bottom-up"
            )
    elif comp != 0:
        raise NotImplementedError(
            "decode_bmp: compression "
            f"{_COMPRESSION_NAMES.get(comp, comp)} unsupported "
            "(BI_RGB, BI_BITFIELDS and BI_RLE8/BI_RLE4 only)"
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

    if comp in (1, 2):
        idx = _decode_rle(data[off:], w, h, four_bit=(comp == 2))
        # RLE scanlines run bottom-up: row 0 of the decoded index
        # plane is the bottom display row
        return pal[idx[::-1]]

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
