"""Audio columns as first-class citizens: a pure-stdlib WAV (RIFF/PCM)
codec, a spectral band-energy fingerprint (numpy FFT), and banded
audio near-dup.

Companion to operators/image.py (PNG + perceptual hashes): the same
public-spec treatment makes the audio decode step REAL in this
environment — WAV/RIFF is parsed with struct alone; compressed audio
codecs (MP3/AAC/...) are refused by format-tag name, never misread.

Coverage (honest gates):
  - RIFF/WAVE containers, `fmt ` + `data` chunks (extra chunks like
    LIST/fact are skipped)
  - PCM integer samples at 8 (unsigned) / 16 / 24 / 32 bit and IEEE
    float 32 / 64 bit, directly tagged OR wrapped in
    WAVE_FORMAT_EXTENSIBLE (0xFFFE — the real tag is read from the
    SubFormat KSDATAFORMAT GUID); any other format tag (2=ADPCM,
    85=MP3, ...) raises NotImplementedError by name
  - any channel count (mixed down to mono by mean for analysis)

Fingerprint (the Haitsma-Kalker / Shazam-family band-energy sign
scheme, reduced to 64 bits): split the mono signal into 9 equal-time
frames, measure FFT magnitude-squared energy in 8 equal-width bands
per frame, and set bit (band, t) iff energy rises from frame t to
frame t+1 — 8 bands x 8 transitions = 64 bits. The SIGN of an energy
difference is invariant under amplitude scaling (gain/normalization),
the audio analog of the brightness-shift invariance the image hashes
have; scaling by powers of two is bit-exactly invariant in IEEE
arithmetic.

Scale design: identical to the image family — decode + FFT ride Arrow
batches through mapInPandas; near-dup pairs come from the shared
banded hash64_near_dup (pigeonhole-exact recall, JVM bit_count
verify); never an all-pairs stage.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from muopdb_spark.operators.image import _to_i64, hash64_near_dup

# WAVE format tags (RIFF spec / RFC 2361 registry)
_FMT_NAMES = {
    0x0002: "adpcm", 0x0006: "alaw", 0x0007: "mulaw", 0x0011: "ima-adpcm",
    0x0055: "mp3", 0xFFFE: "wave-format-extensible",
}


# --------------------------------------------------------------- codec


def encode_wav(
    samples: np.ndarray, sample_rate: int, *, bits: int = 16,
) -> bytes:
    """Encode samples as a PCM WAV byte string. Accepts (n,) mono or
    (n, channels); int16 input is written verbatim (bits=16), float
    input in [-1, 1] is scaled. Only 16-bit PCM output is needed by the
    tests/fixtures; other depths decode-only."""
    if bits != 16:
        raise ValueError("encode_wav writes 16-bit PCM only")
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2 or a.shape[0] == 0:
        raise ValueError(f"encode_wav: bad sample shape {a.shape}")
    if a.dtype.kind == "f":
        a = np.clip(np.rint(a * 32767.0), -32768, 32767)
    a = a.astype("<i2")
    n, ch = a.shape
    data = a.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode WAV bytes to (sample_rate, samples float64 (n, channels)).

    Integer PCM is normalized to [-1, 1) by its type range; float PCM
    passes through. Structural inconsistencies raise ValueError;
    compressed/unsupported format tags raise NotImplementedError by
    NAME (same contract as decode_png / the HDF5 filters).
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("decode_wav: not a RIFF/WAVE file")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid, ln = struct.unpack("<4sI", data[pos:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        if len(body) != ln:
            raise ValueError(f"decode_wav: truncated {cid!r} chunk")
        if cid == b"fmt ":
            if ln < 16:
                raise ValueError("decode_wav: fmt chunk shorter than 16 bytes")
            fmt = body
        elif cid == b"data":
            raw = body
        pos += 8 + ln + (ln & 1)  # RIFF chunks are 2-byte aligned
    if fmt is None or raw is None:
        raise ValueError("decode_wav: missing fmt or data chunk")
    tag, ch, rate, _brate, _balign, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE (the container form for >2 channels or
        # >16-bit depth): the REAL format tag lives in the first two
        # bytes of the SubFormat GUID; the GUID tail must be the
        # KSDATAFORMAT media-type constant or we refuse by value
        if len(fmt) < 40:
            raise ValueError(
                "decode_wav: extensible fmt chunk shorter than 40 bytes"
            )
        guid = fmt[24:40]
        if guid[2:] != (b"\x00\x00\x00\x00\x10\x00"
                        b"\x80\x00\x00\xAA\x00\x38\x9B\x71"):
            raise NotImplementedError(
                f"decode_wav: extensible subformat GUID {guid.hex()} "
                "unsupported (PCM/float KSDATAFORMAT subtypes only)"
            )
        tag = int.from_bytes(guid[:2], "little")
    if ch == 0:
        raise ValueError("decode_wav: zero channels")
    if rate == 0:
        raise ValueError("decode_wav: zero sample rate")
    if tag == 1:  # integer PCM
        if bits == 8:
            a = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            a = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            if len(raw) % 3:
                raise ValueError(
                    "decode_wav: 24-bit data chunk length "
                    f"{len(raw)} is not a multiple of 3"
                )
            b3 = np.frombuffer(raw, np.uint8)
            n3 = len(b3) // 3
            b3 = b3.reshape(n3, 3).astype(np.int64)
            v = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
            v = np.where(v & 0x800000, v - (1 << 24), v)
            a = v.astype(np.float64) / 8388608.0
        elif bits == 32:
            a = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
        else:
            raise NotImplementedError(
                f"decode_wav: {bits}-bit integer PCM unsupported (8/16/24/32)"
            )
    elif tag == 3:  # IEEE float
        if bits == 32:
            a = np.frombuffer(raw, "<f4").astype(np.float64)
        elif bits == 64:
            a = np.frombuffer(raw, "<f8")
        else:
            raise NotImplementedError(
                f"decode_wav: {bits}-bit float PCM unsupported (32/64)"
            )
    else:
        raise NotImplementedError(
            f"decode_wav: format tag {tag} "
            f"('{_FMT_NAMES.get(tag, 'unknown')}') unsupported (PCM only)"
        )
    frames = len(a) // ch
    if frames == 0:
        raise ValueError("decode_wav: empty data chunk")
    return rate, a[: frames * ch].reshape(frames, ch)


# ------------------------------------------------------- fingerprint


def audio_fingerprint64(mono: np.ndarray, *, frames: int = 9,
                        bands: int = 8) -> int:
    """64-bit band-energy sign fingerprint of a mono float signal:
    bit (b * (frames-1) + t) set iff band b's FFT energy rises from
    time frame t to t+1. Amplitude-scale invariant (sign of an energy
    difference); bit-exactly so for power-of-two gains."""
    n = len(mono)
    if n < frames:
        raise ValueError(
            f"audio_fingerprint64: need >= {frames} samples, got {n}"
        )
    flen = n // frames
    # ONE batched rfft over the (frames, flen) matrix instead of a
    # per-frame Python loop — same per-row transform (pocketfft plans
    # each row identically), so fingerprints are unchanged
    sig = np.asarray(mono[:frames * flen], np.float64).reshape(frames, flen)
    spec = np.abs(np.fft.rfft(sig, axis=1)) ** 2
    # drop DC, split the remaining bins into `bands` equal groups
    body = spec[:, 1:]
    if body.shape[1] < bands:
        body = np.pad(body, ((0, 0), (0, bands - body.shape[1])))
    edges = np.linspace(0, body.shape[1], bands + 1).astype(int)
    e = np.stack(
        [body[:, edges[b]:edges[b + 1]].sum(axis=1) for b in range(bands)],
        axis=1,
    )
    rises = (e[1:] > e[:-1]).T.ravel()  # index = b * (frames-1) + t
    v = 0
    for i in np.nonzero(rises)[0].tolist():
        v |= 1 << int(i)
    return _to_i64(v)


# --------------------------------------------------- Spark operators


FEATURE_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, channels int, "
    "duration_s double, rms double, peak double, fingerprint long"
)


def audio_features(
    media: DataFrame,
    *,
    content_col: str = "content",
    id_col: str = "doc_id",
    on_error: str = "raise",
) -> DataFrame:
    """Decode WAV payloads and emit per-document audio features:
    (doc_id, sample_rate, n_samples, channels, duration_s, rms, peak,
    fingerprint). Arrow-batched mapInPandas, executor-side decode;
    ``on_error='skip'`` drops undecodable rows (the image_features
    contract)."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "sample_rate": [], "n_samples": [],
                "channels": [], "duration_s": [], "rms": [], "peak": [],
                "fingerprint": [],
            }
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                # EVERY per-row computation lives inside the try:
                # on_error='skip' must survive any malformed payload,
                # not just the ones decode_wav anticipates
                try:
                    rate, a = decode_wav(bytes(blob))
                    mono = a.mean(axis=1)
                    fp = audio_fingerprint64(mono)
                    row = (
                        rate, a.shape[0], a.shape[1],
                        round(a.shape[0] / rate, 6),
                        round(float(np.sqrt((mono ** 2).mean())), 6),
                        round(float(np.abs(mono).max()), 6), fp,
                    )
                except Exception:
                    if on_error == "skip":
                        continue
                    raise
                out["doc_id"].append(did)
                for k, v in zip(("sample_rate", "n_samples", "channels",
                                 "duration_s", "rms", "peak",
                                 "fingerprint"), row):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.select(
        F.col(id_col).alias("doc_id"), F.col(content_col).alias(content_col)
    ).mapInPandas(gen, schema=FEATURE_SCHEMA)


def audio_near_dup(
    media: DataFrame,
    *,
    content_col: str = "content",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    on_error: str = "raise",
    feats: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate audio pairs: (a_id, b_id, hamming) over the
    spectral fingerprint — hash64_near_dup (banded candidates,
    pigeonhole-exact recall, bit_count verify). Pass ``feats`` (an
    audio_features output) to reuse an existing fingerprint table."""
    if feats is None:
        feats = audio_features(
            media, content_col=content_col, id_col=id_col, on_error=on_error
        )
    return hash64_near_dup(
        feats, hash_col="fingerprint", id_col="doc_id",
        max_hamming=max_hamming,
    )
