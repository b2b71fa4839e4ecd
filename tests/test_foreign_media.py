"""Real-corpus multimodal smoke: every pure codec decodes files
authored by FOREIGN encoders (vendored in tests/fixtures/media — see
its README for provenance), closing the gap between "decodes our own
encoder's output" and "decodes the wild".

Cross-checks that need no golden pixels:
  - python.{png,gif,jpg} are the same 16x16 logo through three
    encoders -> pairwise mean-absolute-difference bounds and matching
    dHashes across formats
  - pluck-pcm{8,16,24,32}.wav are the same waveform at four PCM
    depths -> normalized samples agree within each depth's
    quantization step, and the spectral fingerprint is identical
  - media_probe agrees with the decoders on every fixture's
    dimensions/rate (triage never contradicts the full decode)
"""

from __future__ import annotations

import os

import numpy as np
import pytest

_FIX = os.path.join(os.path.dirname(__file__), "fixtures", "media")


def _read(name: str) -> bytes:
    with open(os.path.join(_FIX, name), "rb") as f:
        return f.read()


def _logo_pixels():
    from muopdb_spark.operators.gif import decode_gif
    from muopdb_spark.operators.image import decode_png
    from muopdb_spark.operators.jpeg import decode_jpeg

    png = decode_png(_read("python.png"))
    if png.ndim == 2:
        png = np.stack([png] * 3, -1)
    return {
        "png": png[:, :, :3],
        "gif": decode_gif(_read("python.gif")),
        "jpg": decode_jpeg(_read("python.jpg")),
    }


def test_foreign_image_decodes_and_shapes():
    imgs = _logo_pixels()
    for name, a in imgs.items():
        assert a.shape == (16, 16, 3), (name, a.shape)
        assert a.dtype == np.uint8


def test_same_logo_across_three_foreign_encoders():
    """PNG is lossless truth; GIF is 64-color quantized; JPEG is
    lossy — all three must still be recognizably the SAME image, both
    by pixel distance and by perceptual hash."""
    from muopdb_spark.operators.image import dhash64, to_gray

    imgs = _logo_pixels()
    ref = imgs["png"].astype(int)
    for name in ("gif", "jpg"):
        diff = np.abs(imgs[name].astype(int) - ref).mean()
        assert diff < 12.0, (name, diff)
    # dHash cross-check only vs GIF: the logo is mostly FLAT, where
    # dHash bits encode ~zero gradients — JPEG ringing legitimately
    # randomizes those bits, so pixel distance is the right bound
    # there (near-dup over photographic content is what dHash is for)
    h = {k: dhash64(to_gray(v)) for k, v in imgs.items()}
    hamming = bin(h["png"] ^ h["gif"]).count("1")
    assert hamming <= 6, hamming


def test_headerless_jpeg_variant_decodes():
    # python-raw.jpg lacks the JFIF APP0 segment entirely
    from muopdb_spark.operators.jpeg import decode_jpeg

    out = decode_jpeg(_read("python-raw.jpg"))
    assert out.shape == (16, 16, 3)


def test_same_waveform_across_four_pcm_depths():
    """CPython's pluck fixtures hold one waveform at 8/16/24/32-bit
    PCM. decode_wav normalizes to [-1, 1), so all four must agree
    within the coarsest depth's quantization step, and the spectral
    fingerprint (what audio near-dup buckets on) must be identical."""
    from muopdb_spark.operators.audio import audio_fingerprint64, decode_wav

    decoded = {}
    for bits in (8, 16, 24, 32):
        rate, samples = decode_wav(_read(f"pluck-pcm{bits}.wav"))
        assert rate == 11025
        assert samples.shape == (3307, 2)
        decoded[bits] = samples
    for bits in (16, 24, 32):
        err = np.abs(decoded[bits] - decoded[8]).max()
        assert err < 1.5 / 127, (bits, err)  # 8-bit quantization bound
    fps = {
        bits: audio_fingerprint64(s.mean(axis=1))
        for bits, s in decoded.items()
    }
    assert fps[16] == fps[24] == fps[32]
    # 8-bit quantization noise may flip a band-energy sign at most
    # marginally — bound it rather than requiring equality (mask to
    # 64 bits first: fingerprints are signed int64)
    xor = (fps[8] ^ fps[16]) & (2 ** 64 - 1)
    assert bin(xor).count("1") <= 4, fps


def test_probe_agrees_with_decoders_on_every_fixture():
    from muopdb_spark.operators.multimodal import (
        _probe_bmp,
        _probe_gif,
        _probe_jpeg,
        _probe_png,
        _probe_wav,
    )

    png = _probe_png(_read("python.png"))
    assert (png["width"], png["height"]) == (16, 16)
    gif = _probe_gif(_read("python.gif"))
    assert (gif["width"], gif["height"]) == (16, 16)
    for f in ("python.jpg", "python-raw.jpg"):
        jpg = _probe_jpeg(_read(f))
        assert (jpg["width"], jpg["height"], jpg["channels"]) == (16, 16, 3)
    bmp = _probe_bmp(_read("python.bmp"))
    assert (bmp["width"], bmp["height"]) == (16, 16)
    for bits in (8, 16, 24, 32):
        wav = _probe_wav(_read(f"pluck-pcm{bits}.wav"))
        assert wav["sample_rate"] == 11025
        assert wav["channels"] == 2
        assert abs(wav["duration_s"] - 3307 / 11025) < 1e-6


def test_image_features_pipeline_on_foreign_files(spark):
    """The Spark-side plumbing (mapInPandas decode + hash) works on
    foreign payloads end-to-end, mixed formats in one frame."""
    from muopdb_spark.operators.image import image_features

    rows = [
        (0, bytearray(_read("python.png"))),
        (1, bytearray(_read("python.gif"))),
        (2, bytearray(_read("python.jpg"))),
    ]
    media = spark.createDataFrame(rows, "doc_id long, content binary")
    feats = {r.doc_id: r for r in image_features(media).collect()}
    assert len(feats) == 3
    for did in (0, 1, 2):
        assert feats[did].width == 16 and feats[did].height == 16
    # cross-encoder near-dup: PNG and GIF renditions hash together
    # (JPEG's flat-region ringing randomizes near-zero dHash gradients
    # on this logo — see test_same_logo_across_three_foreign_encoders)
    xor = (feats[0].dhash ^ feats[1].dhash) & (2 ** 64 - 1)
    assert bin(xor).count("1") <= 6
