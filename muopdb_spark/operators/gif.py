"""GIF codec — pure numpy + struct from the public GIF87a/GIF89a
specification (CompuServe, 1990) — the treatment that made PNG, JPEG
and WAV real (operators/image.py, jpeg.py, audio.py).

Decoder coverage (honest gates, refused by name):
  - GIF87a and GIF89a, global + local color tables, interlaced and
    non-interlaced images, multi-frame animations with disposal
    methods 0/1 (none/keep), 2 (restore background) and 3 (restore
    previous), transparency via the Graphic Control Extension
  - full LZW decompression (variable code width 3..12 bits, clear /
    end-of-information codes, 4096-entry dictionary); structural
    inconsistencies raise ValueError
  - plain-text / application / comment extensions are skipped per
    spec (sub-block walks)

Encoder: single- or multi-frame GIF89a with a true LZW compressor
(dictionary rebuild on clear, 12-bit cap), auto-built palette for
inputs with <= 256 distinct colors (refuses busier inputs by name —
this engine needs lossless roundtrips for fingerprint tests, not a
quantizer). Multi-frame input gets a Netscape loop extension and a
per-frame delay GCE; the encoder writes no transparency (the DECODER
handles transparency and all disposal methods).

Scale note: like the other codecs, decode rides Arrow batches into
mapInPandas via image_features / decode_image — executor-side, never
a driver collect.

Reference parity note: the reference engine (hicder/muopdb) has no
image operators; this module is brief-driven (multimodal pipeline
requirement), mirroring rs/index_writer's "decode external formats
into columns" role for media payloads.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ------------------------------------------------------------------ LZW


def _lzw_decode(min_code_size: int, data: bytes, npix: int) -> np.ndarray:
    """GIF-flavor LZW: little-endian bit packing, variable code width
    starting at min_code_size+1, clear/EOI codes, 4096-entry cap.
    Returns exactly `npix` palette indices (uint8); short or
    structurally invalid streams raise ValueError."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(
            f"decode_gif: LZW minimum code size {min_code_size} out of range"
        )
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(npix, np.uint8)
    n_out = 0

    # dictionary as (prefix_code, last_byte) pairs; roots are implicit
    prefix = np.empty(4096, np.int32)
    suffix = np.empty(4096, np.uint8)
    next_code = eoi + 1
    width = min_code_size + 1
    prev = -1

    acc = 0
    nbits = 0
    pos = 0
    buf = bytearray(64)  # scratch for expanding one code's byte chain

    while n_out < npix:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("decode_gif: LZW stream exhausted")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break

        kwk = False
        n = 0
        if code < clear:
            first = code
        elif code < next_code or (code == next_code and prev >= 0):
            # walk the chain backwards into buf; the KwKwK case
            # (code == next_code) expands prev's chain + its first byte
            kwk = code == next_code
            c = prev if kwk else code
            while c >= clear:
                if n >= len(buf):
                    buf.extend(bytes(len(buf)))
                buf[n] = suffix[c]
                n += 1
                c = prefix[c]
            first = c
        else:
            raise ValueError("decode_gif: LZW code out of sequence")

        # emit: first, then buf reversed, then (KwKwK) first again
        total = 1 + n + (1 if kwk else 0)
        take = min(total, npix - n_out)
        seq = np.empty(total, np.uint8)
        seq[0] = first
        if n:
            seq[1:n + 1] = np.frombuffer(bytes(buf[:n]), np.uint8)[::-1]
        if kwk:
            seq[-1] = first
        out[n_out:n_out + take] = seq[:take]
        n_out += take

        if prev >= 0 and next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            # same post-increment check as the encoder; the decoder's
            # one-entry materialization lag is absorbed by the KwKwK
            # rule, not by an early width change (verified against a
            # foreign-encoder fixture — an "early change" here breaks
            # real files)
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    return out


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """GIF LZW compression with dictionary rebuild on overflow."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    width = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear, width)
    prev = -1
    for v in indices.ravel():
        v = int(v)
        if prev < 0:
            prev = v
            continue
        key = (prev, v)
        nxt = table.get(key)
        if nxt is not None:
            prev = nxt
            continue
        put(prev, width)
        if next_code < 4096:
            table[key] = next_code
            # pre-increment check: the encoder widens one entry LATER
            # than the decoder's post-increment check because the
            # decoder materializes each entry one code behind — this
            # pairing keeps the widths in lockstep at every boundary
            # (the decoder side is pinned against a foreign-encoder
            # fixture)
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            put(clear, width)
            table.clear()
            next_code = eoi + 1
            width = min_code_size + 1
        prev = v
    if prev >= 0:
        put(prev, width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------- decode


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain; returns (payload, pos after the
    0x00 terminator)."""
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("decode_gif: truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(data):
            raise ValueError("decode_gif: truncated sub-block")
        chunks.append(data[pos:pos + n])
        pos += n


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    ).astype(np.int64)
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif_frames(data: bytes, *, max_frames: int | None = None):
    """Yield composited RGB uint8 (H, W, 3) frames of a GIF87a/89a
    stream (logical-screen sized, disposal methods applied,
    transparency respected). Structural problems raise ValueError;
    genuinely unsupported spec corners refuse by NAME."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("decode_gif: not a GIF (missing GIF87a/89a magic)")
    if len(data) < 13:
        raise ValueError("decode_gif: truncated logical screen descriptor")
    sw, sh, packed, bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    if sw == 0 or sh == 0:
        raise ValueError("decode_gif: zero-dimension logical screen")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("decode_gif: truncated global color table")
        gct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    # canvas starts as the background color (or black without a GCT)
    if gct is not None and bg < len(gct):
        canvas = np.tile(gct[bg], (sh, sw, 1)).astype(np.uint8)
        bg_rgb = gct[bg].copy()
    else:
        canvas = np.zeros((sh, sw, 3), np.uint8)
        bg_rgb = np.zeros(3, np.uint8)

    transparent = None
    disposal = 0
    emitted = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("decode_gif: truncated extension")
            label = data[pos]
            pos += 1
            payload, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:  # GCE
                flags = payload[0]
                disposal = (flags >> 2) & 0x07
                transparent = payload[3] if flags & 0x01 else None
            continue
        if b != 0x2C:
            raise ValueError(
                f"decode_gif: unknown block introducer 0x{b:02X}"
            )
        # image descriptor
        if pos + 9 > len(data):
            raise ValueError("decode_gif: truncated image descriptor")
        left, top, iw, ih, ipacked = struct.unpack(
            "<HHHHB", data[pos:pos + 9]
        )
        pos += 9
        if iw == 0 or ih == 0:
            raise ValueError("decode_gif: zero-dimension frame")
        if left + iw > sw or top + ih > sh:
            raise ValueError("decode_gif: frame exceeds the logical screen")
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(data):
                raise ValueError("decode_gif: truncated local color table")
            ct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("decode_gif: frame without any color table")
        if pos >= len(data):
            raise ValueError("decode_gif: truncated LZW header")
        mcs = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        idx = _lzw_decode(mcs, lzw, iw * ih).reshape(ih, iw)
        if (idx >= len(ct)).any():
            raise ValueError("decode_gif: palette index out of range")
        if ipacked & 0x40:
            idx = _deinterlace(idx)

        prev_region = canvas[top:top + ih, left:left + iw].copy()
        rgb = ct[idx]
        region = canvas[top:top + ih, left:left + iw]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        yield canvas.copy()
        emitted += 1
        if max_frames is not None and emitted >= max_frames:
            return

        if disposal == 2:  # restore background
            canvas[top:top + ih, left:left + iw] = bg_rgb
        elif disposal == 3:  # restore previous
            canvas[top:top + ih, left:left + iw] = prev_region
        transparent = None
        disposal = 0
    raise ValueError("decode_gif: missing trailer")


def decode_gif(data: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF to uint8 (H, W, 3) RGB — the
    image_features contract (fingerprints hash the first frame; use
    decode_gif_frames for animation-aware sampling)."""
    for frame in decode_gif_frames(data, max_frames=1):
        return frame
    raise ValueError("decode_gif: no image data before trailer")


# ---------------------------------------------------------------- encode


def _build_palette(frames: list[np.ndarray]) -> tuple[np.ndarray, list]:
    flat_all = np.concatenate([f.reshape(-1, 3) for f in frames])
    pal, inv = np.unique(flat_all, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise NotImplementedError(
            "encode_gif: more than 256 distinct colors "
            "(palette quantization is out of scope — this "
            "encoder exists for lossless roundtrips)"
        )
    if len(pal) < 2:
        pal = np.vstack([pal, np.zeros((2 - len(pal), 3), np.uint8)])
    index_frames = []
    off = 0
    for f in frames:
        npx = f.shape[0] * f.shape[1]
        index_frames.append(
            inv[off:off + npx].astype(np.uint8).reshape(f.shape[:2])
        )
        off += npx
    return pal.astype(np.uint8), index_frames


def encode_gif(
    frames: np.ndarray | list[np.ndarray], *, delay_cs: int = 10,
    interlace: bool = False,
) -> bytes:
    """Encode one RGB uint8 (H, W, 3) array — or a list of same-shaped
    arrays as an animation — as GIF89a with a shared auto-built
    palette (inputs must have <= 256 distinct colors across all
    frames; lossless by construction). Grayscale (H, W) input is
    broadcast to RGB."""
    from muopdb_spark.operators.image import as_rgb_u8

    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("encode_gif: no frames")
    norm = [as_rgb_u8(f, "encode_gif") for f in frames]
    if any(f.shape != norm[0].shape for f in norm):
        raise ValueError("encode_gif: frames must share one shape")
    h, w = norm[0].shape[:2]
    if w > 0xFFFF or h > 0xFFFF:
        raise ValueError(
            f"encode_gif: dimensions {w}x{h} exceed the GIF89a 16-bit"
            " limit of 65535"
        )
    if not (0 <= delay_cs <= 0xFFFF):
        raise ValueError(
            f"encode_gif: delay_cs {delay_cs} outside the GIF89a"
            " 16-bit range 0..65535"
        )
    pal, index_frames = _build_palette(norm)
    # palette size: power of two >= len, >= 2; field stores log2-1
    bits = max(1, int(len(pal) - 1).bit_length())
    n = 1 << bits
    table = np.zeros((n, 3), np.uint8)
    table[:len(pal)] = pal

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += table.tobytes()
    if len(norm) > 1:
        # Netscape looping extension (public de-facto standard)
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for idx in index_frames:
        if len(norm) > 1:
            out += b"\x21\xf9\x04" + bytes([0x04]) \
                + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0x00
        )
        rows = idx
        if interlace:
            order = np.concatenate([
                np.arange(start, h, step)
                for start, step in _INTERLACE_PASSES
            ])
            rows = idx[order]
        mcs = max(2, bits)
        out.append(mcs)
        lzw = _lzw_encode(mcs, rows)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
