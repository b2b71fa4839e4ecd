"""Video frame extraction — MJPEG-in-AVI, pure numpy + struct from
the public RIFF/AVI container spec (Microsoft/IBM 1992, OpenDML) with
frames decoded by the baseline JPEG codec (operators/jpeg.py).

Scope (the r13 close-or-freeze decision for video):
  - MJPEG-in-AVI is the one video format a pure-Python engine can
    decode end-to-end: the container is a chunk walk (same RIFF
    machinery as WAV) and every frame is an independent JPEG.
  - Frames that omit their DHT segments (the MJPEG "implicit table"
    convention hardware encoders use) decode via the T.81 Annex K.3
    standard tables (decode_jpeg's fallback — the tables themselves
    are pinned against foreign files).
  - Everything else (MP4/H.264, VP9, AV1...) stays PROBE-ONLY via
    multimodal.media_probe: inter-frame codecs are out of reasonable
    pure-Python scope, permanently — see SURVEY §2 capability note.

Encoder: minimal spec-valid AVI writer (avih + strl(strh/strf) +
movi of 00dc JPEG chunks + idx1) so tests roundtrip real container
bytes; quality=100 flat frames roundtrip pixel-exactly (the JPEG
fidelity contract).

Scale note: frame extraction rides Arrow batches into mapInPandas
(video_frame_features) — executor-side, one task per media partition,
never a driver collect.

Reference parity note: the reference engine (hicder/muopdb) has no
video operators; this is brief-driven (multimodal pipeline
requirement): video payloads become opaque binary columns + typed
frames, the decode step real where feasible and refused by name where
not.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

try:  # Spark is optional at import: the codec half is pure Python
    import pandas as pd
    from pyspark.sql import DataFrame
except Exception:  # pragma: no cover
    pd = None
    DataFrame = None


# ---------------------------------------------------------------- encode


def encode_avi_mjpeg(
    frames: list[np.ndarray], *, fps: int = 10, quality: int = 90,
) -> bytes:
    """Encode same-shaped uint8 frames ((H, W) or (H, W, 3)) as an
    MJPEG AVI: each frame an independent baseline JPEG in a '00dc'
    chunk, with a spec-complete header pair (avih/strh/strf) and an
    idx1 index."""
    from muopdb_spark.operators.jpeg import encode_jpeg

    if not frames:
        raise ValueError("encode_avi_mjpeg: no frames")
    shape = np.asarray(frames[0]).shape
    if any(np.asarray(f).shape != shape for f in frames):
        raise ValueError("encode_avi_mjpeg: frames must share one shape")
    h, w = shape[:2]
    if fps <= 0:
        raise ValueError("encode_avi_mjpeg: fps must be positive")
    blobs = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0, 0, 0x10,        # MaxBytesPerSec, Padding, dwFlags (HASINDEX)
        len(blobs), 0, 1,  # TotalFrames, InitialFrames, Streams
        max(len(b) for b in blobs),
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                      len(blobs), max(len(b) for b in blobs),
                      0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
        len(blobs[0]), 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_chunks = [chunk(b"00dc", b) for b in blobs]
    movi = lst(b"movi", b"".join(movi_chunks))
    # idx1 offsets are relative to the start of the 'movi' kind tag
    idx = bytearray()
    off = 4
    for b, ck in zip(blobs, movi_chunks):
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(b))
        off += len(ck)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------- decode


def _riff_chunks(data: bytes, pos: int, end: int):
    """Yield (ckid, body_start, body_len) over a RIFF chunk span."""
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = pos + 8
        if body + ln > end:
            raise ValueError(f"decode_avi: truncated {cid!r} chunk")
        yield cid, body, ln
        pos = body + ln + (ln & 1)  # word alignment


def decode_avi_mjpeg_frames(
    data: bytes, *, every_n: int = 1, max_frames: int | None = None,
) -> Iterator[tuple[int, np.ndarray]]:
    """Yield (frame_idx, uint8 pixel array) for the MJPEG video frames
    of an AVI, keeping every n-th. Walks RIFF LIST structure (incl.
    'rec ' groupings), decodes '..dc' chunks with the baseline JPEG
    codec. DHT-less MJPEG frames (files carrying NO Huffman tables,
    the common MJPEG convention) decode via the T.81 Annex K.3
    standard-table fallback in decode_jpeg; non-MJPEG streams refuse
    by name; structural problems raise ValueError."""
    from muopdb_spark.operators.jpeg import decode_jpeg

    if every_n < 1:
        raise ValueError("decode_avi: every_n must be >= 1")
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("decode_avi: not a RIFF/AVI file")
    (riff_len,) = struct.unpack("<I", data[4:8])
    end = min(len(data), 8 + riff_len)

    def blobs(p: int, e: int, in_movi: bool):
        # in-order recursive walk: frames inside LIST 'rec ' groupings
        # keep their stream position
        for cid, body, ln in _riff_chunks(data, p, e):
            if cid == b"LIST":
                kind = data[body:body + 4]
                yield from blobs(
                    body + 4, body + ln,
                    in_movi or kind in (b"movi", b"rec "),
                )
            elif in_movi and cid[2:4] in (b"dc", b"db"):
                yield data[body:body + ln]

    emitted = 0
    for idx, blob in enumerate(blobs(12, end, False)):
        if idx % every_n:
            continue
        if blob[:2] != b"\xff\xd8":
            raise NotImplementedError(
                "decode_avi: non-JPEG frame payload (MJPEG streams only)"
            )
        # DHT-less frames (the hardware-encoder "implicit table"
        # convention) decode via decode_jpeg's Annex K.3 fallback
        yield idx, decode_jpeg(blob)
        emitted += 1
        if max_frames is not None and emitted >= max_frames:
            return


def probe_avi(data: bytes) -> dict | None:
    """Header-only AVI triage (the media_probe contract: total, never
    raises on garbage): width/height/frame count/duration from avih."""
    try:
        if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
            return None
        for cid, body, ln in _riff_chunks(data, 12, len(data)):
            if cid == b"LIST" and data[body:body + 4] == b"hdrl":
                for c2, b2, l2 in _riff_chunks(data, body + 4, body + ln):
                    if c2 == b"avih" and l2 >= 40:
                        (uspf, _mb, _pg, _fl, total, _init, _ns, _sb,
                         w, h) = struct.unpack("<10I", data[b2:b2 + 40])
                        if w == 0 or h == 0 or w > 1 << 16 or h > 1 << 16:
                            return None
                        return {
                            "format": "avi",
                            "width": int(w),
                            "height": int(h),
                            "channels": 3,
                            "duration_s": round(total * uspf / 1e6, 6)
                            if uspf else None,
                        }
                return None
        return None
    except Exception:
        return None


# --------------------------------------------------- Spark operators


FRAME_SCHEMA = (
    "doc_id long, frame_idx int, height int, width int, dhash long"
)


def video_frame_features(
    media: "DataFrame", *, every_n: int = 1,
    max_frames: int | None = None, content_col: str = "content",
    id_col: str = "doc_id", on_error: str = "raise",
) -> "DataFrame":
    """REAL video frame sampling (supersedes frame_sample's byte-slice
    plumbing for AVI payloads): extract every n-th MJPEG frame
    executor-side and emit (doc_id, frame_idx, height, width, dhash)
    — the per-frame perceptual hash feeds the same banded near-dup
    machinery as images (hash64_near_dup). Arrow-batched mapInPandas;
    on_error='skip' drops undecodable documents."""
    from muopdb_spark.operators.image import dhash64, to_gray

    if on_error not in ("raise", "skip"):
        raise ValueError(
            f"on_error must be 'raise' or 'skip', got {on_error!r}"
        )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "height": [],
                "width": [], "dhash": [],
            }
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    rows = []
                    for idx, px in decode_avi_mjpeg_frames(
                        bytes(blob), every_n=every_n,
                        max_frames=max_frames,
                    ):
                        rows.append(
                            (idx, px.shape[0], px.shape[1],
                             dhash64(to_gray(px)))
                        )
                except Exception:
                    if on_error == "skip":
                        continue
                    raise
                for idx, hh, ww, dh in rows:
                    out["doc_id"].append(did)
                    out["frame_idx"].append(idx)
                    out["height"].append(hh)
                    out["width"].append(ww)
                    out["dhash"].append(dh)
            yield pd.DataFrame(out)

    return media.mapInPandas(gen, FRAME_SCHEMA)
