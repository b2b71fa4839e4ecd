"""Pure-stdlib WAV codec + spectral band-energy fingerprint + banded
audio near-dup (the multimodal audio decode step, made real without
codec libraries). Mirrors the image family's test strategy."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from muopdb_spark.operators.audio import (
    audio_features,
    audio_fingerprint64,
    audio_near_dup,
    decode_wav,
    encode_wav,
)


# ------------------------------------------------------------- codec


def test_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(7)
    s = rng.integers(-8000, 8000, 4410, dtype=np.int16)
    rate, back = decode_wav(encode_wav(s, 44100))
    assert rate == 44100 and back.shape == (4410, 1)
    assert np.array_equal(back[:, 0] * 32768.0, s.astype(np.float64))
    st = rng.integers(-8000, 8000, (2000, 2), dtype=np.int16)
    rate, back = decode_wav(encode_wav(st, 16000))
    assert rate == 16000 and back.shape == (2000, 2)
    assert np.array_equal(back * 32768.0, st.astype(np.float64))


def test_float_input_scaled_on_encode():
    s = np.array([0.0, 0.5, -0.5, 1.0, -1.0])
    _, back = decode_wav(encode_wav(s, 8000))
    assert np.allclose(back[:, 0], s, atol=1 / 32767)


def test_decode_8bit_and_float32():
    # hand-build an 8-bit unsigned PCM file and a float32 file
    def wav(fmt_tag, ch, rate, bits, payload):
        fmt = struct.pack("<HHIIHH", fmt_tag, ch, rate,
                          rate * ch * bits // 8, ch * bits // 8, bits)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(payload)) + payload)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    r, a = decode_wav(wav(1, 1, 8000, 8, bytes([0, 128, 255])))
    assert r == 8000 and np.allclose(a[:, 0], [-1.0, 0.0, 127 / 128])
    f32 = np.array([0.25, -0.75], dtype="<f4").tobytes()
    _, a = decode_wav(wav(3, 1, 8000, 32, f32))
    assert np.allclose(a[:, 0], [0.25, -0.75])


def test_extra_riff_chunks_skipped_and_odd_padding():
    s = np.arange(100, dtype=np.int16)
    raw = bytearray(encode_wav(s, 8000))
    # splice an odd-length LIST chunk (exercises 2-byte alignment)
    i = bytes(raw).index(b"data")
    chunk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    raw[i:i] = chunk
    raw[4:8] = struct.pack("<I", struct.unpack("<I", raw[4:8])[0] + len(chunk))
    _, back = decode_wav(bytes(raw))
    assert np.array_equal(back[:, 0] * 32768.0, s.astype(np.float64))


def test_unsupported_formats_refused_by_name():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS this is not a wav")
    s = np.zeros(10, dtype=np.int16)
    raw = bytearray(encode_wav(s, 8000))
    i = bytes(raw).index(b"fmt ") + 8
    raw[i:i + 2] = struct.pack("<H", 0x55)  # format tag 85 = MP3
    with pytest.raises(NotImplementedError, match="mp3"):
        decode_wav(bytes(raw))
    # 0xFFFE with a bare 16-byte fmt chunk is structurally invalid
    # (extensible requires the 40-byte form carrying the GUID)
    raw[i:i + 2] = struct.pack("<H", 0xFFFE)
    with pytest.raises(ValueError, match="40 bytes"):
        decode_wav(bytes(raw))
    # truncated data chunk
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(bytes(encode_wav(s, 8000))[:-4])


# ------------------------------------------------------- fingerprint


def test_fingerprint_invariant_under_power_of_two_gain():
    rng = np.random.default_rng(3)
    base = rng.integers(-8000, 8000, 8192).astype(np.float64)
    fp = audio_fingerprint64(base)
    for k in (2.0, 4.0, 0.5, 0.25):
        assert audio_fingerprint64(base * k) == fp, k


def test_fingerprint_distinct_signals_distant():
    rng = np.random.default_rng(11)
    fps = [audio_fingerprint64(rng.normal(size=4096)) for _ in range(20)]
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            d = bin((fps[i] ^ fps[j]) & ((1 << 64) - 1)).count("1")
            assert d > 8, (i, j, d)


def test_fingerprint_too_short_raises():
    with pytest.raises(ValueError, match="samples"):
        audio_fingerprint64(np.zeros(5))


# --------------------------------------------------- Spark operators


def _media(spark, sigs, rate=16000):
    return spark.createDataFrame(
        [(i, bytearray(encode_wav(s, rate))) for i, s in sigs],
        "doc_id long, content binary",
    )


def test_audio_features_matches_local(spark):
    rng = np.random.default_rng(5)
    sigs = [(i, rng.integers(-8000, 8000, 3200, dtype=np.int16))
            for i in range(4)]
    out = {r.doc_id: r for r in audio_features(_media(spark, sigs)).collect()}
    assert len(out) == 4
    for i, s in sigs:
        r = out[i]
        mono = s.astype(np.float64) / 32768.0
        assert (r.sample_rate, r.n_samples, r.channels) == (16000, 3200, 1)
        assert r.duration_s == round(3200 / 16000, 6)
        assert r.rms == round(float(np.sqrt((mono ** 2).mean())), 6)
        assert r.fingerprint == audio_fingerprint64(mono)


def test_audio_features_on_error_skip(spark):
    good = np.ones(100, dtype=np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(good, 8000))), (2, bytearray(b"junk"))],
        "doc_id long, content binary",
    )
    with pytest.raises(Exception):
        audio_features(df).collect()
    assert [r.doc_id for r in audio_features(df, on_error="skip").collect()] == [1]


def test_audio_near_dup_recovers_gain_copies(spark):
    rng = np.random.default_rng(9)
    a = rng.integers(-8000, 8000, 4096, dtype=np.int16)
    b = rng.integers(-8000, 8000, 4096, dtype=np.int16)
    pairs = audio_near_dup(_media(spark, [
        (0, a), (1, (a * 2).astype(np.int16)),  # x2 gain: hamming 0
        (2, b),
    ]), max_hamming=3).collect()
    got = {(r.a_id, r.b_id): r.hamming for r in pairs}
    assert got == {(0, 1): 0}


def test_zero_rate_wav_rejected_and_skippable(spark):
    # r12 review: a fmt chunk with sample_rate=0 must raise in
    # decode_wav (ValueError, not ZeroDivisionError downstream), and
    # on_error='skip' must survive it
    raw = bytearray(encode_wav(np.ones(64, dtype=np.int16), 8000))
    i = bytes(raw).index(b"fmt ") + 8 + 4  # fmt body: tag(2) ch(2) rate(4)
    raw[i:i + 4] = (0).to_bytes(4, "little")
    with pytest.raises(ValueError, match="sample rate"):
        decode_wav(bytes(raw))
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(np.ones(64, dtype=np.int16), 8000))),
         (2, raw)],
        "doc_id long, content binary",
    )
    rows = audio_features(df, on_error="skip").collect()
    assert [r.doc_id for r in rows] == [1]


_KS_TAIL = b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xAA\x00\x38\x9B\x71"


def _wav_raw(fmt_body, payload):
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
            + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_24bit_pcm():
    # r12: 24-bit PCM (ubiquitous in real recordings) — 3-byte LE
    # two's-complement samples
    vals = [0, 1, -1, 8388607, -8388608, 4242424]
    payload = b"".join(
        (v & 0xFFFFFF).to_bytes(3, "little") for v in vals
    )
    fmt = struct.pack("<HHIIHH", 1, 1, 48000, 48000 * 3, 3, 24)
    rate, a = decode_wav(_wav_raw(fmt, payload))
    assert rate == 48000
    assert np.allclose(a[:, 0] * 8388608.0, vals)


def test_decode_wave_format_extensible():
    # r12: the 0xFFFE container form routes through the SubFormat GUID
    # — PCM int16 and float32 subtypes decode; an unknown GUID refuses
    s = np.array([1000, -1000, 32767], dtype="<i2")
    ext = struct.pack("<HHH", 22, 16, 0) + b"\x00" + b"\x01\x00" + _KS_TAIL
    # cbSize(2) validbits(2) chmask(4) guid(16): rebuild precisely
    ext = (struct.pack("<H", 22) + struct.pack("<H", 16)
           + struct.pack("<I", 0) + b"\x01\x00" + _KS_TAIL)
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16) + ext
    rate, a = decode_wav(_wav_raw(fmt, s.tobytes()))
    assert rate == 8000 and np.allclose(a[:, 0] * 32768.0, s)
    # float32 subtype (tag 3)
    f = np.array([0.5, -0.25], dtype="<f4")
    fmt3 = (struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 32000, 4, 32)
            + struct.pack("<H", 22) + struct.pack("<H", 32)
            + struct.pack("<I", 0) + b"\x03\x00" + _KS_TAIL)
    _, a = decode_wav(_wav_raw(fmt3, f.tobytes()))
    assert np.allclose(a[:, 0], f)
    # unknown subformat GUID refuses by value
    bad = (struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
           + struct.pack("<H", 22) + struct.pack("<H", 16)
           + struct.pack("<I", 0) + b"\x01\x00" + b"\xde\xad" + _KS_TAIL[2:])
    with pytest.raises(NotImplementedError, match="GUID"):
        decode_wav(_wav_raw(bad, s.tobytes()))


# ------------------------------------------------- property roundtrips


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(n=st.integers(1, 5000), ch=st.integers(1, 3),
       rate=st.sampled_from([8000, 16000, 44100]),
       seed=st.integers(0, 2**31 - 1))
def test_wav_roundtrip_property(n, ch, rate, seed):
    """Any length x channel count x rate survives 16-bit PCM
    encode -> decode exactly (normalized by 32768)."""
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, (n, ch), dtype=np.int16)
    r, a = decode_wav(encode_wav(s, rate))
    assert r == rate and a.shape == (n, ch)
    assert np.array_equal(a * 32768.0, s.astype(np.float64))


def test_24bit_misaligned_data_rejected():
    # r12 review: a 24-bit data chunk not divisible by 3 must raise
    # like every other depth, not silently drop the partial sample
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 24000, 3, 24)
    with pytest.raises(ValueError, match="multiple of 3"):
        decode_wav(_wav_raw(fmt, b"\x01\x02\x03\x04"))
