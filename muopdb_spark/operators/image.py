"""Image columns as first-class citizens: a pure-stdlib PNG codec,
perceptual fingerprints (aHash / dHash), and banded image near-dup.

The reference engine has no image operators; this module implements the
"multimodal columns" requirement of the training-data-pipeline brief
the way sources/hdf5.py implements HDF5 — from the PUBLIC file-format
spec (PNG, RFC 2083 / W3C PNG 2nd ed.) with nothing but stdlib zlib +
struct + numpy, so the decode step is REAL in this environment rather
than stub-gated behind PIL.

Coverage (honest gates, refused by name like the HDF5 filters):
  - bit depths 8 and 16 (16-bit decodes to uint16; 1/2/4 raise
    NotImplementedError by name)
  - color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
    6 (RGBA)
  - Adam7 interlacing (the seven-pass deinterlace of spec section 8)
  - every chunk CRC is verified — never a silent misread

Perceptual hashing (public algorithms, e.g. Krawetz's aHash/dHash
write-ups):
  - aHash: area-resize to 8x8 grayscale, bit = cell > mean
  - dHash: area-resize to 9x8 grayscale, bit = cell > right neighbor
Both are invariant under uniform brightness shift and robust to small
local edits; both pack to a signed int64 column.

Scale design: decode + hash ride Arrow record batches through
mapInPandas (no per-row Python round trips, no driver collect); the
near-dup join is banded — a 64-bit dHash splits into B equal bands and
only pairs sharing a band value are candidates (pigeonhole: a pair
within hamming <= B-1 shares at least one intact band, so recall is
EXACT for max_hamming <= B-1). Candidate verification is pure JVM
bit_count(xor). This is the same candidates-only-never-n^2 shape as
MinHash-LSH (dedup.py) and SimHash banding.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# Adam7 pass grid: (row_start, row_step, col_start, col_step) per pass
# (spec section 8.2 — the seven passes tile every pixel exactly once)
_ADAM7 = (
    (0, 8, 0, 8), (0, 8, 4, 8), (4, 8, 0, 4), (0, 4, 2, 4),
    (2, 4, 0, 2), (0, 2, 1, 2), (1, 2, 0, 1),
)


# --------------------------------------------------------------- codec


def encode_png(arr: np.ndarray, *, compresslevel: int = 6) -> bytes:
    """Encode a uint8 (bit depth 8) or uint16 (bit depth 16,
    network-byte-order samples) array as a PNG byte string.

    Accepts (H, W) grayscale, (H, W, 3) RGB, or (H, W, 4) RGBA. Every
    scanline uses filter type 0 (None) — simple, spec-valid output that
    any decoder (including ours) reads back bit-exactly.
    """
    a = np.asarray(arr)
    if a.dtype == np.uint16:
        depth = 16
        a = np.ascontiguousarray(a.astype(">u2"))
    else:
        depth = 8
        a = np.ascontiguousarray(a, dtype=np.uint8)
    if a.ndim == 2:
        color_type = 0
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type = 2
    elif a.ndim == 3 and a.shape[2] == 4:
        color_type = 6
    else:
        raise ValueError(
            f"encode_png: unsupported array shape {a.shape}; expected "
            "(H, W), (H, W, 3) or (H, W, 4)"
        )
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("encode_png: empty image")

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + a[r].tobytes() for r in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, compresslevel))
        + chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Invert the PNG scanline filters (types 0-4: None / Sub / Up /
    Average / Paeth). Returns (h, stride) uint8."""
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for r in range(h):
        base = r * (stride + 1)
        ft = raw[base]
        line = np.frombuffer(raw, np.uint8, stride, base + 1).astype(np.int32)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft == 1:  # Sub — serial in-row dependency
            cur = line
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ft == 3:  # Average
            cur = line
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = line
            for i in range(stride):
                pa = cur[i - bpp] if i >= bpp else 0
                pb = prev[i]
                pc = prev[i - bpp] if i >= bpp else 0
                p = pa + pb - pc
                da, db, dc = abs(p - pa), abs(p - pb), abs(p - pc)
                pred = pa if (da <= db and da <= dc) else (pb if db <= dc else pc)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"decode_png: unknown scanline filter {ft}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to a uint8 array: (H, W) for grayscale, else
    (H, W, C). Palette images resolve through PLTE to (H, W, 3).

    Chunk CRCs are verified and structural inconsistencies raise
    ValueError; spec features outside the supported subset raise
    NotImplementedError naming the feature (same contract as the HDF5
    reader).
    """
    if data[:8] != _PNG_MAGIC:
        raise ValueError("decode_png: not a PNG (bad signature)")
    pos, ihdr, plte, idat = 8, None, None, []
    while True:
        if pos + 8 > len(data):
            raise ValueError("decode_png: truncated chunk header")
        ln, typ = struct.unpack(">I4s", data[pos:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        if len(body) != ln or pos + 12 + ln > len(data):
            raise ValueError(f"decode_png: truncated {typ!r} chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"decode_png: CRC mismatch in {typ!r} chunk")
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"PLTE":
            if ln % 3:
                raise ValueError("decode_png: PLTE length not divisible by 3")
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped after CRC check
    if ihdr is None:
        raise ValueError("decode_png: missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(
            f"decode_png: compression/filter method {comp}/{filt} invalid"
        )
    if interlace not in (0, 1):
        raise ValueError(f"decode_png: interlace method {interlace} invalid")
    if depth not in (8, 16):
        raise NotImplementedError(
            f"decode_png: bit depth {depth} unsupported (8/16)"
        )
    if color_type not in _CHANNELS:
        raise NotImplementedError(
            f"decode_png: color type {color_type} unsupported"
        )
    if depth == 16 and color_type == 3:
        raise ValueError("decode_png: 16-bit palette images are not legal")
    if w == 0 or h == 0:
        raise ValueError("decode_png: zero-dimension image")
    ch = _CHANNELS[color_type]
    bpp = ch * (depth // 8)  # filters operate on BYTES, unit = ceil bytes/px
    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        if len(raw) != h * (1 + w * bpp):
            raise ValueError(
                f"decode_png: decompressed size {len(raw)} != expected "
                f"{h * (1 + w * bpp)} for {w}x{h}x{ch}@{depth}"
            )
        flat = _unfilter(raw, h, w * bpp, bpp)
    else:
        # Adam7: seven independently-filtered sub-images (spec sec. 8)
        # scattered onto the pass grid; empty passes contribute zero
        # bytes (not even filter bytes)
        cube = np.zeros((h, w, bpp), np.uint8)
        pos = 0
        for r0, rs, c0, cs in _ADAM7:
            ph = (h - r0 + rs - 1) // rs if h > r0 else 0
            pw = (w - c0 + cs - 1) // cs if w > c0 else 0
            if ph == 0 or pw == 0:
                continue
            need = ph * (1 + pw * bpp)
            if pos + need > len(raw):
                raise ValueError("decode_png: truncated Adam7 pass data")
            sub = _unfilter(raw[pos:pos + need], ph, pw * bpp, bpp)
            pos += need
            cube[r0::rs, c0::cs, :] = sub.reshape(ph, pw, bpp)
        if pos != len(raw):
            raise ValueError(
                f"decode_png: {len(raw) - pos} trailing bytes after the "
                "Adam7 passes"
            )
        flat = cube.reshape(h, w * bpp)
    if depth == 16:
        b = flat.reshape(h, w, ch, 2).astype(np.uint16)
        out = (b[..., 0] << np.uint16(8)) | b[..., 1]  # network byte order
        return out.reshape(h, w) if ch == 1 else out
    if color_type == 3:
        if plte is None:
            raise ValueError("decode_png: palette image without PLTE")
        idx = flat.reshape(h, w)
        if idx.max(initial=0) >= len(plte):
            raise ValueError(
                "decode_png: palette index out of range "
                f"({int(idx.max())} >= {len(plte)})"
            )
        return plte[idx]
    if ch == 1:
        return flat.reshape(h, w)
    return flat.reshape(h, w, ch)


def decode_image_bytes(data: bytes) -> np.ndarray:
    """Magic-dispatched image decode: PNG via decode_png, JPEG
    (baseline + progressive) via operators/jpeg.py, GIF (first frame,
    composited) via operators/gif.py. Other formats raise
    NotImplementedError naming the magic."""
    if data[:8] == _PNG_MAGIC:
        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        from muopdb_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from muopdb_spark.operators.gif import decode_gif

        return decode_gif(data)
    if data[:2] == b"BM":
        from muopdb_spark.operators.bmp import decode_bmp

        return decode_bmp(data)
    raise NotImplementedError(
        f"decode_image_bytes: unrecognized image magic {data[:4]!r} "
        "(PNG, JPEG, GIF and BMP supported)"
    )


# ----------------------------------------------- grayscale / resizing


def as_rgb_u8(arr: np.ndarray, who: str) -> np.ndarray:
    """Shared encoder input normalization: uint8 (H, W, 3) RGB, with
    grayscale (H, W) broadcast — used by the GIF/BMP encoders so the
    contract can't drift between codecs."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = np.stack([a] * 3, axis=-1)
    if a.ndim != 3 or a.shape[2] != 3 or a.dtype != np.uint8:
        raise ValueError(
            f"{who}: expected uint8 (H, W[, 3]); got {a.dtype} {a.shape}"
        )
    if a.shape[0] == 0 or a.shape[1] == 0:
        raise ValueError(f"{who}: empty image")
    return a


def to_gray(img: np.ndarray) -> np.ndarray:
    """Luma (ITU-R BT.601) as float64; alpha channels are dropped.

    Achromatic RGB (R==G==B everywhere — e.g. any gray image coming
    back through a palette codec as 3 channels) returns the channel
    VERBATIM: elementwise luma of equal channels is v*(0.299+0.587+
    0.114), which is not exactly v in float64, and that rounding is
    what broke dHash's exact brightness-shift invariance on
    gray-through-GIF content (m8, r16). The chromatic path computes
    the weighted sum with elementwise ufuncs in a fixed order rather
    than `rgb @ weights`: matmul may dispatch to BLAS, whose
    reduction order/FMA use varies by build, and fingerprints must
    not depend on the host's BLAS."""
    if img.ndim == 2:
        return img.astype(np.float64)
    if img.shape[2] == 2:  # gray + alpha
        return img[:, :, 0].astype(np.float64)
    r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
    if np.array_equal(r, g) and np.array_equal(r, b):
        return r.astype(np.float64)
    return (
        0.299 * r.astype(np.float64)
        + 0.587 * g.astype(np.float64)
        + 0.114 * b.astype(np.float64)
    )


def _overlap_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) fractional box-overlap weights; rows sum to 1.
    When n_in % n_out == 0 every weight is exactly representable, so
    downsampling is EXACT float64 arithmetic (the hash tests rely on
    brightness-shift invariance holding exactly in that case)."""
    W = np.zeros((n_out, n_in))
    scale = n_in / n_out
    for o in range(n_out):
        lo, hi = o * scale, (o + 1) * scale
        for i in range(int(np.floor(lo)), min(int(np.ceil(hi)), n_in)):
            W[o, i] = min(hi, i + 1) - max(lo, i)
    return W / scale


def area_resize(a: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-average (box) resample of a 2-D float array — the
    downsample PIL calls BOX/area; exact for integer ratios."""
    r = _overlap_weights(a.shape[0], out_h)
    c = _overlap_weights(a.shape[1], out_w)
    return r @ a @ c.T


# ------------------------------------------------- perceptual hashing


def _to_i64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def ahash64(gray: np.ndarray) -> int:
    """Average hash: 8x8 area-resize, bit (r*8+c) set iff cell > mean.
    Signed-int64 packed (column-storable)."""
    g = area_resize(gray, 8, 8)
    m = g.mean()
    v = 0
    for r in range(8):
        for c in range(8):
            if g[r, c] > m:
                v |= 1 << (r * 8 + c)
    return _to_i64(v)


def dhash64(gray: np.ndarray) -> int:
    """Difference hash: 9x8 area-resize (9 wide), bit (r*8+c) set iff
    cell[r,c] > cell[r,c+1]. Signed-int64 packed."""
    g = area_resize(gray, 8, 9)
    v = 0
    for r in range(8):
        for c in range(8):
            if g[r, c] > g[r, c + 1]:
                v |= 1 << (r * 8 + c)
    return _to_i64(v)


# --------------------------------------------------- Spark operators


FEATURE_SCHEMA = (
    "doc_id long, width int, height int, channels int, "
    "ahash long, dhash long"
)


def image_features(
    media: DataFrame,
    *,
    content_col: str = "content",
    id_col: str = "doc_id",
    on_error: str = "raise",
) -> DataFrame:
    """Decode image payloads (PNG or baseline JPEG, magic-dispatched)
    and emit perceptual fingerprints:
    (doc_id, width, height, channels, ahash, dhash).

    Arrow-batched mapInPandas — decode + hash run where the bytes live,
    executor-side; nothing returns to the driver but the fixed-width
    feature row. ``on_error='skip'`` drops undecodable rows instead of
    failing the job (web-scale corpora contain corrupt images); the
    default is loud.
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "width": [], "height": [],
                "channels": [], "ahash": [], "dhash": [],
            }
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    img = decode_image_bytes(bytes(blob))
                except Exception:
                    if on_error == "skip":
                        continue
                    raise
                gray = to_gray(img)
                out["doc_id"].append(did)
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                out["channels"].append(1 if img.ndim == 2 else img.shape[2])
                out["ahash"].append(ahash64(gray))
                out["dhash"].append(dhash64(gray))
            yield pd.DataFrame(out)

    return media.select(
        F.col(id_col).alias("doc_id"), F.col(content_col).alias(content_col)
    ).mapInPandas(gen, schema=FEATURE_SCHEMA)


def _pick_bands(max_hamming: int) -> int:
    """Smallest power-of-two band count B with B >= max_hamming + 1 and
    64 % B == 0 — pigeonhole then guarantees exact recall: a pair
    differing in <= B-1 bits leaves at least one band untouched."""
    for b in (1, 2, 4, 8, 16, 32, 64):
        if b >= max_hamming + 1:
            return b
    raise ValueError(f"max_hamming {max_hamming} out of range (0..63)")


def hash64_near_dup(
    feats: DataFrame,
    *,
    hash_col: str,
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs over any signed-int64 fingerprint column:
    (a_id, b_id, hamming) with hamming = popcount(a XOR b) <=
    max_hamming. Shared by image dHash and audio spectral fingerprints.

    Candidates come from banded equality buckets over the 64-bit hash
    (band count auto-chosen so recall is exact — see _pick_bands);
    verification is JVM bit_count on the XOR. Only bucket-mates are
    ever paired: no all-pairs stage at any scale, matching the
    MinHash-LSH / SimHash machinery in dedup.py.
    """
    if max_hamming < 0:
        raise ValueError(f"max_hamming must be >= 0, got {max_hamming}")
    bands = _pick_bands(max_hamming)
    width = 64 // bands
    mask = (1 << width) - 1
    sig = feats.select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("h")
    )
    if bands == 1:
        # exact-equality dedup (max_hamming=0): the single band IS the
        # hash — no shift/mask (a 64-bit all-ones mask does not fit a
        # long literal)
        band_exprs = [F.col("h")]
    else:
        band_exprs = [
            F.shiftright("h", b * width)
            .bitwiseAND(F.lit(mask)).cast("long")
            for b in range(bands)
        ]
    buck = sig.select(
        "id", "h",
        F.posexplode(F.array(*band_exprs)).alias("band_idx", "band_val"),
    )
    a, b = buck.alias("a"), buck.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"),
            F.col("a.h").alias("h_a"), F.col("b.h").alias("h_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def image_near_dup(
    media: DataFrame,
    *,
    content_col: str = "content",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    on_error: str = "raise",
    feats: DataFrame | None = None,
) -> DataFrame:
    """Perceptual near-duplicate image pairs: (a_id, b_id, hamming)
    with hamming = popcount(dhash_a XOR dhash_b) <= max_hamming —
    hash64_near_dup over image_features' dHash column. Pass ``feats``
    (an image_features output) to reuse an existing fingerprint table.
    """
    if feats is None:
        feats = image_features(
            media, content_col=content_col, id_col=id_col, on_error=on_error
        )
    return hash64_near_dup(
        feats, hash_col="dhash", id_col="doc_id", max_hamming=max_hamming
    )
