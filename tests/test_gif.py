"""GIF codec (pure numpy/struct, GIF87a/89a spec). GIF is palette-
lossless, so unlike JPEG every roundtrip is exact; the test strategy:
  - exact encode->decode roundtrips across palette sizes that force
    every LZW code width (3..12 bits), table overflow + clear cycles,
    the KwKwK special case, and interlacing
  - a FOREIGN-encoder fixture (vendored from CPython's test suite)
    pins the decoder's LZW width convention against a real encoder —
    an "early width change" decoder bug roundtrips our own files fine
    but breaks foreign ones
  - multi-frame compositing with every disposal method, transparency
  - dHash survives a palette roundtrip (what image near-dup needs)
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from muopdb_spark.operators.gif import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
)

_FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "media")


def _pal(n, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (n, 3), np.uint8)


# ------------------------------------------------------------ roundtrips


@pytest.mark.parametrize("ncolors,shape", [
    (2, (16, 256)), (7, (23, 31)), (7, (1, 1)), (256, (40, 60)),
    (256, (100, 120)),
])
@pytest.mark.parametrize("interlace", [False, True])
def test_exact_roundtrip(ncolors, shape, interlace):
    rng = np.random.default_rng(ncolors * 31 + shape[0])
    img = _pal(ncolors)[rng.integers(0, ncolors, shape)]
    out = decode_gif(encode_gif(img, interlace=interlace))
    assert np.array_equal(out, img)


def test_lzw_table_overflow_and_clear_cycle():
    # a 256x300 structured image pushes past 4096 dictionary entries,
    # forcing 12-bit codes plus at least one clear + rebuild
    pal = _pal(256)
    img = pal[(np.add.outer(np.arange(256), np.arange(300)) % 251)
              .astype(np.uint8)]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_kwkwk_long_runs():
    # long single-color runs make the encoder emit a code the decoder
    # has not materialized yet (code == next_code)
    pal = _pal(2)
    idx = np.zeros((16, 256), np.uint8)
    idx[:, ::7] = 1
    img = pal[idx]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_grayscale_broadcast_and_flat():
    g = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3)
    assert np.array_equal(decode_gif(encode_gif(g)), np.stack([g] * 3, -1))
    flat = np.full((5, 9, 3), 200, np.uint8)
    assert np.array_equal(decode_gif(encode_gif(flat)), flat)


# ---------------------------------------------------------- multi-frame


def test_animation_roundtrip_and_frame_iteration():
    pal = _pal(7)
    rng = np.random.default_rng(5)
    f1 = pal[rng.integers(0, 7, (10, 12))]
    f2 = pal[rng.integers(0, 7, (10, 12))]
    frames = list(decode_gif_frames(encode_gif([f1, f2])))
    assert len(frames) == 2
    assert np.array_equal(frames[0], f1)
    assert np.array_equal(frames[1], f2)
    # decode_gif = first frame only
    assert np.array_equal(decode_gif(encode_gif([f1, f2])), f1)


def _hand_gif(frames_spec, *, sw=4, sh=4, gct=None, loop=False):
    """Assemble a GIF89a by hand: frames_spec is a list of
    (left, top, w, h, indices, disposal, transparent_idx)."""
    from muopdb_spark.operators.gif import _lzw_encode

    gct = gct if gct is not None else np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
    )
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | 0x01, 0, 0)  # 4-color GCT
    out += gct.tobytes()
    for left, top, w, h, idx, disposal, trans in frames_spec:
        flags = (disposal & 7) << 2 | (1 if trans is not None else 0)
        out += b"\x21\xf9\x04" + bytes([flags, 0, 0, trans or 0, 0])
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        out.append(2)  # min code size
        lzw = _lzw_encode(2, np.asarray(idx, np.uint8))
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def test_disposal_methods_and_transparency():
    # frame 1 fills the screen with color 1; frame 2 overlays a 2x2
    # patch of color 2 at (1,1) with disposal 3 (restore previous);
    # frame 3 overlays color 3 at (0,0) with a transparent index —
    # transparent pixels must keep the underlying canvas
    f1 = (0, 0, 4, 4, np.full(16, 1, np.uint8), 1, None)
    f2 = (1, 1, 2, 2, np.full(4, 2, np.uint8), 3, None)
    f3 = (0, 0, 2, 2, np.array([3, 0, 0, 3], np.uint8), 0, 0)
    frames = list(decode_gif_frames(_hand_gif([f1, f2, f3])))
    assert len(frames) == 3
    assert (frames[0] == [255, 0, 0]).all()
    # frame 2: patch visible
    assert (frames[1][1:3, 1:3] == [0, 255, 0]).all()
    assert (frames[1][0, 0] == [255, 0, 0]).all()
    # frame 3: disposal 3 restored frame-1 content under frame 2's
    # patch; then frame 3's own 2x2 draws at (0,0) — its (1,1) is
    # opaque blue, its (0,1)/(1,0) are transparent index-0 pixels
    # showing the restored canvas (color 1)
    assert (frames[2][0, 0] == [0, 0, 255]).all()   # opaque 3
    assert (frames[2][1, 1] == [0, 0, 255]).all()   # opaque 3
    assert (frames[2][0, 1] == [255, 0, 0]).all()   # transparent
    assert (frames[2][1, 0] == [255, 0, 0]).all()   # transparent
    assert (frames[2][2:, :] == [255, 0, 0]).all()  # restored by d=3
    assert (frames[2][:, 2:] == [255, 0, 0]).all()


def test_disposal_2_restores_background():
    f1 = (1, 1, 2, 2, np.full(4, 2, np.uint8), 2, None)
    f2 = (0, 0, 1, 1, np.array([3], np.uint8), 0, None)
    frames = list(decode_gif_frames(_hand_gif([f1, f2])))
    # after disposal 2, the patch region returns to the background
    # color (GCT index 0 = black)
    assert (frames[1][1:3, 1:3] == [0, 0, 0]).all()
    assert (frames[1][0, 0] == [0, 0, 255]).all()


# ------------------------------------------------------------- dispatch


def test_decode_image_bytes_dispatches_gif():
    from muopdb_spark.operators.image import decode_image_bytes

    pal = _pal(5)
    img = pal[np.random.default_rng(1).integers(0, 5, (12, 14))]
    out = decode_image_bytes(encode_gif(img))
    assert np.array_equal(out, img)


def test_dhash_survives_gif_roundtrip():
    # the property image near-dup relies on: GIF is lossless for
    # palette content, so the perceptual hash is bit-identical
    from muopdb_spark.operators.image import dhash64, to_gray

    rng = np.random.default_rng(2)
    img = _pal(64)[rng.integers(0, 64, (32, 48))]
    assert dhash64(to_gray(decode_gif(encode_gif(img)))) == \
        dhash64(to_gray(img))


# ------------------------------------------------------------- refusals


def test_refusals_and_structural_errors():
    with pytest.raises(ValueError, match="magic"):
        decode_gif(b"NOTAGIF")
    with pytest.raises(NotImplementedError, match="256 distinct"):
        rgb = np.arange(3 * 300, dtype=np.uint8).reshape(-1, 3)
        encode_gif(np.tile(rgb, (2, 1)).reshape(2, 300, 3) * 0 +
                    np.random.default_rng(0).integers(
                        0, 256, (2, 300, 3), np.uint8))
    good = encode_gif(_pal(4)[np.zeros((4, 4), np.uint8)])
    with pytest.raises(ValueError):
        decode_gif(good[:-4])  # missing trailer / truncated
    with pytest.raises(ValueError, match="no image data"):
        decode_gif(b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0, 0, 0)
                   + b"\x3b")


def test_foreign_encoder_fixture_decodes():
    """python.gif (vendored from CPython's test suite — PSF-licensed,
    authored by a real-world GIF encoder) pins the LZW width
    convention; cross-checked against the PNG rendition of the same
    logo decoded by our PNG codec (GIF is 64-color quantized, so the
    comparison is a mean-absolute-difference bound, not equality)."""
    path = os.path.join(_FIXDIR, "python.gif")
    if not os.path.exists(path):  # pragma: no cover
        pytest.skip("foreign GIF fixture not vendored")
    d = decode_gif(open(path, "rb").read())
    assert d.shape == (16, 16, 3)
    from muopdb_spark.operators.image import decode_png

    png = decode_png(open(os.path.join(_FIXDIR, "python.png"), "rb").read())
    diff = np.abs(d.astype(int) - png.astype(int)).mean()
    assert diff < 10.0, diff


def test_encode_gif_oversize_dims_refuse_by_name():
    import numpy as np
    import pytest
    from muopdb_spark.operators.gif import encode_gif

    wide = np.zeros((1, 70000, 3), np.uint8)
    with pytest.raises(ValueError, match="encode_gif.*65535"):
        encode_gif(wide)
    ok = np.zeros((2, 2, 3), np.uint8)
    with pytest.raises(ValueError, match="encode_gif.*delay_cs"):
        encode_gif([ok, ok], delay_cs=70000)
    with pytest.raises(ValueError, match="encode_gif.*delay_cs"):
        encode_gif([ok, ok], delay_cs=-1)
