"""Cross-validation of every image codec against Java ImageIO via
Spark's built-in `image` data source — a fully independent third-party
implementation that ships with the JVM:

  - OUR ENCODERS under a FOREIGN DECODER: PNG/GIF/BMP files we write
    must decode bit-exactly in ImageIO (lossless formats); quality-100
    JPEG (baseline AND progressive) within codec rounding.
  - A FOREIGN ENCODER under OUR DECODER: the Spark distribution's
    sample photos (real camera JPEGs, 4:2:0) must decode to within
    IDCT/upsampling rounding of ImageIO's pixels, and fast.

Together with tests/fixtures/media (foreign files) this closes both
directions of the "decodes its own encoder only" gap for every format.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

_KITTENS = "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin"


def _imageio_decode(spark, path):
    r = spark.read.format("image").load(path).collect()[0].image
    if r.height == -1:  # ImageIO refused
        return None
    a = np.frombuffer(bytes(r.data), np.uint8)
    return a.reshape(r.height, r.width, r.nChannels)


def _write(tmp_path, name, blob):
    p = str(tmp_path / name)
    with open(p, "wb") as f:
        f.write(blob)
    return p


def test_lossless_encoders_bitexact_under_imageio(spark, tmp_path):
    from muopdb_spark.operators.bmp import encode_bmp
    from muopdb_spark.operators.gif import encode_gif
    from muopdb_spark.operators.image import encode_png

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (20, 30, 3), np.uint8)
    pal = rng.integers(0, 256, (7, 3), np.uint8)
    gif_img = pal[rng.integers(0, 7, (20, 30))]
    for name, blob, src in [
        ("a.png", encode_png(rgb), rgb),
        ("b.gif", encode_gif(gif_img), gif_img),
        ("c.bmp", encode_bmp(rgb), rgb),
    ]:
        java = _imageio_decode(spark, _write(tmp_path, name, blob))
        assert java is not None, f"ImageIO refused our {name}"
        assert np.array_equal(java, src[:, :, ::-1]), name  # BGR mode


def test_jpeg_encoders_close_under_imageio(spark, tmp_path):
    from muopdb_spark.operators.jpeg import encode_jpeg

    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (24, 40, 3), np.uint8)
    for name, blob in [
        ("base.jpg", encode_jpeg(rgb, quality=100)),
        ("prog.jpg", encode_jpeg(rgb, quality=100, progressive=True)),
    ]:
        java = _imageio_decode(spark, _write(tmp_path, name, blob))
        assert java is not None, f"ImageIO refused our {name}"
        diff = np.abs(java.astype(int) - rgb[:, :, ::-1].astype(int))
        # q100 quantizes by 1: remaining error is both sides' IDCT +
        # color-convert rounding
        assert diff.max() <= 3 and diff.mean() < 1.0, (
            name, diff.mean(), diff.max())


@pytest.mark.skipif(not os.path.isdir(_KITTENS),
                    reason="Spark sample images not present")
def test_wild_photos_match_imageio(spark):
    """Real camera JPEGs (4:2:0, optimized markers) through both
    decoders: agreement within IDCT + chroma-upsampling rounding
    (ImageIO interpolates chroma; we replicate — the visible effect is
    a sub-pixel shift at color edges, bounded in the mean)."""
    from muopdb_spark.operators.jpeg import decode_jpeg

    files = sorted(glob.glob(os.path.join(_KITTENS, "**", "*.jpg"),
                             recursive=True))
    assert files
    import time

    for f in files:
        java = _imageio_decode(spark, f)
        if java is None:  # pragma: no cover
            continue
        t = time.time()
        ours = decode_jpeg(open(f, "rb").read())
        wall = time.time() - t
        assert wall < 5.0, (f, wall)  # real photos must stay fast
        if ours.ndim == 2:
            ours = np.stack([ours] * 3, -1)
        diff = np.abs(java.astype(int) - ours[:, :, ::-1].astype(int))
        # photos sit ~0.5; the chromosome image (saturated color
        # edges, where replicate-vs-interpolate chroma upsampling
        # diverges most) measures 1.9
        assert diff.mean() < 2.5, (f, diff.mean())
