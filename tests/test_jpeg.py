"""Baseline JPEG codec (pure numpy/struct, ITU-T T.81). JPEG is lossy,
so the test strategy differs from PNG/WAV byte-roundtrips:
  - quality=100 quantizes everything by 1, so FLAT blocks roundtrip
    bit-exactly (DC-only, float64 IDCT error < 0.5)
  - smooth content pins PSNR floors; perceptual dHash must survive
    the codec unchanged (that is what image near-dup relies on)
  - a HAND-built file with variable-length Huffman tables pins the
    canonical DHT reconstruction against manually derived codes (real
    encoders ship optimized tables, not our fixed-length ones)
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from muopdb_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _psnr(a, b):
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255 ** 2 / mse)


def _smooth_rgb(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([
        (255 * x / max(1, w - 1)),
        (255 * y / max(1, h - 1)),
        (255 * (x + y) / max(1, h + w - 2)),
    ], axis=-1).astype(np.uint8)


# ------------------------------------------------------------ fidelity


@pytest.mark.parametrize("v", [0, 7, 128, 200, 255])
def test_uniform_q100_roundtrips_exactly(v):
    img = np.full((24, 24), v, np.uint8)
    assert (decode_jpeg(encode_jpeg(img, quality=100)) == img).all()
    rgb = np.full((16, 8, 3), v, np.uint8)
    assert (decode_jpeg(encode_jpeg(rgb, quality=100)) == rgb).all()


def test_smooth_gradient_psnr():
    rgb = _smooth_rgb(33, 41)
    out = decode_jpeg(encode_jpeg(rgb, quality=95))
    assert out.shape == rgb.shape and out.dtype == np.uint8
    assert _psnr(rgb, out) > 40, _psnr(rgb, out)
    gray = _smooth_rgb(40, 56)[:, :, 0]
    out = decode_jpeg(encode_jpeg(gray, quality=95))
    assert out.shape == gray.shape
    assert _psnr(gray, out) > 40


def test_noise_psnr_and_odd_dims():
    rng = np.random.default_rng(0)
    g = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    assert _psnr(g, decode_jpeg(encode_jpeg(g, quality=95))) > 35
    odd = rng.integers(0, 256, (7, 13, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(odd, quality=100))
    assert out.shape == odd.shape
    assert _psnr(odd, out) > 45
    one = np.array([[137]], dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(one, quality=100))[0, 0] == 137


def test_420_subsampling_and_restarts():
    # 4:2:0 halves chroma resolution: exact for flat chroma, PSNR-gated
    # for smooth chroma; restart markers must not perturb anything
    rgb = _smooth_rgb(33, 41)
    out = decode_jpeg(encode_jpeg(rgb, quality=95, subsample=True))
    assert out.shape == rgb.shape and _psnr(rgb, out) > 35
    flat = np.full((20, 30, 3), 77, np.uint8)
    assert (decode_jpeg(encode_jpeg(flat, quality=100,
                                    subsample=True)) == flat).all()
    a = decode_jpeg(encode_jpeg(rgb, quality=95))
    b = decode_jpeg(encode_jpeg(rgb, quality=95, restart_interval=3))
    assert (a == b).all()  # restarts change framing, not content
    out = decode_jpeg(encode_jpeg(rgb, quality=95, subsample=True,
                                  restart_interval=1))
    assert _psnr(rgb, out) > 35


def test_perceptual_hash_survives_codec():
    # the property image near-dup actually needs: dHash of a smooth
    # image is unchanged by a JPEG roundtrip at high quality
    from muopdb_spark.operators.image import dhash64, to_gray

    rgb = _smooth_rgb(48, 64)
    out = decode_jpeg(encode_jpeg(rgb, quality=90))
    assert dhash64(to_gray(out)) == dhash64(to_gray(rgb))


# ----------------------------------------------------------- hand-built


def _seg(marker, payload):
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def test_decodes_hand_built_variable_length_tables():
    """8x8 gray, value 130, quant all-1s, HAND-assembled entropy data
    under variable-length Huffman tables (DC: '0'->size0 is NOT used;
    sizes 1 and 2 at lengths 1/2; AC: EOB at length 1). Pins the
    canonical code reconstruction walk across code lengths — our own
    encoder only emits fixed-length tables."""
    # DC table: counts len1=1 (symbol 2), len2=1 (symbol 1)
    #   canonical: '0' -> size 2, '10' -> size 1
    dc = bytes([1, 1] + [0] * 14) + bytes([2, 1])
    # AC table: counts len1=1 (symbol 0x00 = EOB): '0' -> EOB
    ac = bytes([1] + [0] * 15) + bytes([0x00])
    # block: constant 130 -> level-shifted 2 -> DC coefficient 16
    #   (orthonormal FDCT of a flat block: 8 * value), quant 1 -> 16;
    #   DC size of 16 is 5... too big for our toy table. Use DC diff
    #   category 2: value 2 or 3 -> flat decoded value 128 + v/8.
    #   Pick DC=2 (category 2, bits '10'): decoded flat block =
    #   128 + 2/8 = 128.25 -> rounds to 128.
    # entropy: DC code '0' (size 2) + bits '10' (value 2) + EOB '0'
    #   = 0 10 0 + pad 1111 -> 0b01001111 = 0x4F
    data = (
        b"\xff\xd8"
        + _seg(0xFFDB, bytes([0]) + bytes([1] * 64))
        + _seg(0xFFC0, bytes([8]) + struct.pack(">HH", 8, 8)
               + bytes([1, 1, 0x11, 0]))
        + _seg(0xFFC4, bytes([0x00]) + dc)
        + _seg(0xFFC4, bytes([0x10]) + ac)
        + _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes([0x4F])
        + b"\xff\xd9"
    )
    out = decode_jpeg(data)
    assert out.shape == (8, 8)
    assert (out == 128).all()


# ------------------------------------------------------------ refusals


def test_unsupported_features_refused_by_name():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    base = encode_jpeg(np.zeros((8, 8), np.uint8))
    # flip SOF0 -> SOF1 (extended sequential — still refused by name)
    i = base.index(b"\xff\xc0")
    ext = base[:i] + b"\xff\xc1" + base[i + 2:]
    with pytest.raises(NotImplementedError, match="extended sequential"):
        decode_jpeg(ext)
    # truncated entropy stream
    with pytest.raises(ValueError, match="truncated|exhausted"):
        decode_jpeg(base[:-8])


def test_scan_component_not_in_sof_is_value_error():
    """An SOS selecting a component id the SOF never declared must be
    a ValueError (structural-inconsistency contract), not a KeyError."""
    base = encode_jpeg(np.zeros((8, 8), np.uint8))
    i = base.index(b"\xff\xda")
    # SOS payload: [ns=1, cs=1, tabs] — corrupt cs to 9
    bad = bytearray(base)
    assert bad[i + 5] == 1
    bad[i + 5] = 9
    with pytest.raises(ValueError, match="not declared in SOF"):
        decode_jpeg(bytes(bad))


def test_bad_shapes_rejected():
    with pytest.raises(ValueError, match="shape"):
        encode_jpeg(np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError, match="empty"):
        encode_jpeg(np.zeros((0, 4), np.uint8))


# ------------------------------------------------- operator integration


def test_image_features_and_near_dup_on_jpeg(spark):
    from muopdb_spark.operators.image import (
        dhash64, image_features, image_near_dup, to_gray,
    )

    base = _smooth_rgb(32, 36)
    shifted = np.clip(base.astype(np.int64) + 5, 0, 255).astype(np.uint8)
    other = 255 - _smooth_rgb(36, 32)
    media = spark.createDataFrame(
        [(0, bytearray(encode_jpeg(base, quality=95))),
         (1, bytearray(encode_jpeg(shifted, quality=95))),
         (2, bytearray(encode_jpeg(other, quality=95)))],
        "doc_id long, content binary",
    )
    feats = {r.doc_id: r for r in image_features(media).collect()}
    assert feats[0].width == 36 and feats[0].height == 32
    assert feats[0].dhash == dhash64(to_gray(base))
    pairs = image_near_dup(media, max_hamming=3).collect()
    got = {(r.a_id, r.b_id) for r in pairs}
    assert (0, 1) in got and not any(2 in p for p in got)


def test_decode_image_routes_jpeg_without_pil(spark):
    from muopdb_spark.operators.multimodal import decode_image

    rgb = _smooth_rgb(12, 10)
    media = spark.createDataFrame(
        [(1, "image/jpeg", bytearray(encode_jpeg(rgb, quality=100)), 0)],
        "doc_id long, media_type string, content binary, n_bytes long",
    )
    r = decode_image(media, max_side=256).collect()[0]
    assert (r.width, r.height) == (10, 12)
    assert len(r.pixels) == 12 * 10 * 3


def test_decode_speed_linear_in_entropy_bytes():
    # r12 review: the bit reader must mask consumed bits out of its
    # accumulator — without it, decode cost is quadratic in entropy
    # bytes (an unbounded bigint shifted per fill) and a single normal
    # photo effectively hangs an executor. 256x256 noise at q95 is
    # ~100 KB of entropy data; generous wall bound for a slow box.
    import time

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (256, 256), dtype=np.uint8)
    blob = encode_jpeg(img, quality=95)
    t0 = time.time()
    out = decode_jpeg(blob)
    assert time.time() - t0 < 30, "quadratic bit-reader regression"
    assert _psnr(img, out) > 35


def test_fill_bytes_before_markers_accepted():
    # T.81 B.1.1.2: 0xFF fill bytes may pad before any marker
    base = encode_jpeg(np.full((8, 8), 50, np.uint8), quality=100)
    i = base.index(b"\xff\xdb")  # pad before DQT and before SOS
    j = base.index(b"\xff\xda")
    padded = base[:i] + b"\xff\xff" + base[i:j] + b"\xff" + base[j:]
    out = decode_jpeg(padded)
    assert (out == 50).all()


def test_non_integer_sampling_ratio_refused_by_name():
    base = bytearray(encode_jpeg(np.zeros((8, 8, 3), np.uint8)))
    i = bytes(base).index(b"\xff\xc0")
    # component 0's sampling byte sits at SOF payload offset 6+1
    # (marker 2 + len 2 + prec 1 + h 2 + w 2 + ncomp 1 + cid 1)
    base[i + 4 + 5 + 1 + 1] = 0x31  # luma 3x1 with chroma 1x1 -> 3/1 ok;
    # chroma at 2x1 makes 3/2 non-integer
    base[i + 4 + 5 + 1 + 1 + 3] = 0x21
    with pytest.raises(NotImplementedError, match="sampling ratio"):
        decode_jpeg(bytes(base))


# ----------------------------------------------------------- progressive


@pytest.mark.parametrize("shape,subsample", [
    ((8, 8), False), ((17, 23), False), ((32, 48, 3), False),
    ((15, 31, 3), True), ((9, 9, 3), True), ((1, 1), False),
])
def test_progressive_decodes_identically_to_baseline(shape, subsample):
    """Progressive and baseline encodings hold the SAME quantized
    coefficients, so a correct progressive decoder (spectral selection
    + successive approximation + AC refinement + EOB runs) must
    reproduce the baseline decode bit-for-bit."""
    rng = np.random.default_rng(hash(shape) % 2**32)
    a = rng.integers(0, 256, shape, dtype=np.uint8)
    for q in (30, 90):
        d0 = decode_jpeg(encode_jpeg(a, quality=q, subsample=subsample))
        dp = decode_jpeg(
            encode_jpeg(a, quality=q, subsample=subsample, progressive=True)
        )
        assert np.array_equal(d0, dp)


def test_progressive_with_restart_markers():
    """RSTn inside progressive scans resets DC predictors AND the EOB
    run; both interleaved (DC) and non-interleaved (AC) scans restart."""
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, (33, 49, 3), dtype=np.uint8)
    d0 = decode_jpeg(encode_jpeg(a, quality=75, restart_interval=2))
    dp = decode_jpeg(
        encode_jpeg(a, quality=75, restart_interval=2, progressive=True)
    )
    assert np.array_equal(d0, dp)
    # smooth content maximizes EOB runs crossing restart boundaries
    sm = np.clip(
        np.add.outer(np.linspace(0, 40, 32), np.linspace(0, 30, 64)),
        0, 255,
    ).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(sm, quality=90, restart_interval=1)),
        decode_jpeg(
            encode_jpeg(sm, quality=90, restart_interval=1, progressive=True)
        ),
    )


def _idct_block(zz_coefs):
    """Reference IDCT of one hand-specified zigzag coefficient block
    (quant all-1s), via the module's orthonormal basis."""
    from muopdb_spark.operators.jpeg import _T, _ZZ
    raster = np.zeros(64)
    raster[_ZZ] = zz_coefs
    px = _T.T @ raster.reshape(8, 8) @ _T + 128.0
    return np.clip(np.rint(px), 0, 255).astype(np.uint8)


def test_progressive_hand_built_eobrun_vector():
    """HAND-assembled SOF2 file pinning the spec EOBn semantics
    (T.81 G.1.2.2: EOBn = run of n all-further-zero blocks INCLUDING
    the current one; n in [2^r, 2^(r+1)-1], r extra bits) against a
    decoder+encoder pair that could otherwise share an off-by-one.
    40x8 gray, 5 blocks: block 1 has AC, blocks 2-4 are an EOB run of
    4 (with block 1's tail), block 5 has AC after the run — so both a
    -1 and a +1 error in the decoder's EOBn formula corrupt block 5."""
    # DC table: '0' -> cat 2, '10' -> cat 0
    dc = bytes([1, 1] + [0] * 14) + bytes([2, 0])
    # AC table: len-2 codes '00'->0x03 '01'->0x20 '10'->0x12,
    # len-3 code '110'->0x00 (EOB0)
    ac = bytes([0, 3, 1] + [0] * 13) + bytes([0x03, 0x20, 0x12, 0x00])
    # scan 1 (DC, Al=0): diffs 2,0,0,0,0
    #   '0'+'10' then 4x'10' -> 010101010 10 -> 0101 0101 010 +pad(11111)
    dc_bits = bytes([0b01010101, 0b01011111])
    # scan 2 (AC, Ss=1..63, Al=1):
    #   block1: (r=0,s=3)='00' + value 5='101'
    #   EOBn n=4: r=2 -> symbol 0x20='01' + extra '00'
    #   block5: (r=1,s=2)='10' + value 3='11'
    #   EOBn n=1: r=0 -> symbol 0x00='110'
    #   -> 00 101 01 00 10 11 110 (16 bits, no pad)
    ac_bits = bytes([0b00101010, 0b01011110])
    data = (
        b"\xff\xd8"
        + _seg(0xFFDB, bytes([0]) + bytes([1] * 64))
        + _seg(0xFFC2, bytes([8]) + struct.pack(">HH", 8, 40)
               + bytes([1, 1, 0x11, 0]))
        + _seg(0xFFC4, bytes([0x00]) + dc)
        + _seg(0xFFC4, bytes([0x10]) + ac)
        + _seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0x00])) + dc_bits
        + _seg(0xFFDA, bytes([1, 1, 0x00, 1, 63, 0x01])) + ac_bits
        + b"\xff\xd9"
    )
    out = decode_jpeg(data)
    assert out.shape == (8, 40)
    exp = np.zeros((8, 40), np.uint8)
    b_mid = _idct_block([2] + [0] * 63)
    for bx in range(5):
        exp[:, bx * 8:(bx + 1) * 8] = b_mid
    # block 1: zigzag k=1 -> 10 after <<Al; block 5: zigzag k=2 -> 6
    exp[:, 0:8] = _idct_block([2, 10] + [0] * 62)
    exp[:, 32:40] = _idct_block([2, 0, 6] + [0] * 61)
    assert np.array_equal(out, exp)


def test_progressive_hand_built_ac_refinement_vector():
    """HAND-assembled AC refinement scan pinning the correction-bit
    protocol (T.81 G.1.2.3): the (run,1) symbol's sign bit precedes the
    correction bits of passed-over nonzero-history coefficients, and
    history coefficients do not count toward the zero run. Block:
    AC[1]=5 arrives as 4 at Al=1 then +1 correction; AC[3]=-1 appears
    newly at Al=0 after a genuine zero run of 1."""
    dc = bytes([1] + [0] * 15) + bytes([0])          # '0' -> cat 0
    # AC: '00'->0x02 '01'->0x00(EOB0) '10'->0x11
    ac = bytes([0, 3] + [0] * 14) + bytes([0x02, 0x00, 0x11])
    dc_bits = bytes([0b01111111])                     # '0' + pad
    # first AC scan (Al=1): (0,2)='00' + value 2='10', EOB0='01' -> pad
    ac1_bits = bytes([0b00100111])
    # refine (Ah=1, Al=0): 0x11='10' + sign'0'(neg) + corr'1' +
    #   EOB0='01' -> 100101 + pad '11'
    ac2_bits = bytes([0b10010111])
    data = (
        b"\xff\xd8"
        + _seg(0xFFDB, bytes([0]) + bytes([1] * 64))
        + _seg(0xFFC2, bytes([8]) + struct.pack(">HH", 8, 8)
               + bytes([1, 1, 0x11, 0]))
        + _seg(0xFFC4, bytes([0x00]) + dc)
        + _seg(0xFFC4, bytes([0x10]) + ac)
        + _seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0x00])) + dc_bits
        + _seg(0xFFDA, bytes([1, 1, 0x00, 1, 63, 0x01])) + ac1_bits
        + _seg(0xFFDA, bytes([1, 1, 0x00, 1, 63, 0x10])) + ac2_bits
        + b"\xff\xd9"
    )
    out = decode_jpeg(data)
    assert np.array_equal(out, _idct_block([0, 5, 0, -1] + [0] * 60))


def test_progressive_nonconformant_scans_rejected():
    a = np.zeros((8, 8), np.uint8)
    prog = encode_jpeg(a, progressive=True)
    # interleaved AC scan: find the first single-component SOS (AC)
    # and the DC scan; corrupt headers in place
    base = encode_jpeg(np.full((16, 16, 3), 77, np.uint8), progressive=True)
    i = base.index(b"\xff\xda")  # DC scan, ns=3
    # make the interleaved DC scan claim a spectral band (Ss=1)
    bad = bytearray(base)
    ns = bad[i + 4]
    assert ns == 3
    bad[i + 5 + 2 * ns] = 1       # Ss
    bad[i + 6 + 2 * ns] = 63      # Se
    with pytest.raises(ValueError, match="interleaved progressive AC"):
        decode_jpeg(bytes(bad))
    # successive approximation must refine exactly one bit (Ah == Al+1)
    bad2 = bytearray(prog)
    j = bad2.index(b"\xff\xda")   # gray DC scan, ns=1
    bad2[j + 7 + 2] = (3 << 4) | 1  # Ah=3, Al=1 on the DC scan
    with pytest.raises(ValueError, match="one bit"):
        decode_jpeg(bytes(bad2))


def test_progressive_perceptual_hash_matches_baseline(spark):
    """dHash computed through the progressive decode path equals the
    baseline path's (the decoded pixels are identical)."""
    from muopdb_spark.operators.image import dhash64, to_gray
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    h0 = dhash64(to_gray(decode_jpeg(encode_jpeg(a, quality=85))))
    hp = dhash64(to_gray(decode_jpeg(
        encode_jpeg(a, quality=85, progressive=True)
    )))
    assert h0 == hp


def test_clipped_tail_decodes_leniently():
    """A JPEG with complete entropy data but a clipped tail (missing
    EOI, or truncated trailing segment) decodes — the real-crawl case;
    truncation BEFORE any scan stays an error."""
    a = np.random.default_rng(4).integers(0, 256, (24, 24), np.uint8)
    full = encode_jpeg(a, quality=90)
    assert np.array_equal(decode_jpeg(full[:-2]), decode_jpeg(full))
    prog = encode_jpeg(a, quality=90, progressive=True)
    assert np.array_equal(decode_jpeg(prog[:-2]), decode_jpeg(prog))
    # clipped mid-entropy still raises
    with pytest.raises(ValueError):
        decode_jpeg(full[:len(full) // 2])


def test_k3_fallback_only_for_fully_dht_less_files():
    """A file with NO DHT at all gets the Annex K.3 tables (the MJPEG
    implicit-table convention); a file carrying SOME tables but
    missing one is corrupt and must stay a loud error, never a silent
    mixed-table decode."""
    base = encode_jpeg(np.zeros((8, 8), np.uint8), quality=100)
    # strip only the AC table (class 1): DC stays -> must raise
    out = bytearray()
    pos = 0
    data = bytes(base)
    out += data[:2]
    pos = 2
    while pos + 4 <= len(data):
        m = data[pos + 1]
        if m == 0xDA:
            out += data[pos:]
            break
        (ln,) = struct.unpack(">H", data[pos + 2:pos + 4])
        keep = True
        if m == 0xC4 and data[pos + 4] >> 4 == 1:  # AC class
            keep = False
        if keep:
            out += data[pos:pos + 2 + ln]
        pos += 2 + ln
    with pytest.raises(ValueError, match="missing DHT"):
        decode_jpeg(bytes(out))


def test_mutation_fuzz_only_named_refusals():
    """r16 mutation-fuzz hardening: flipping random bytes in a valid
    JPEG must yield ONLY successful decodes or the two named refusal
    types (ValueError for malformed input, NotImplementedError for
    unsupported features) — never a raw IndexError/OverflowError out
    of the Huffman walk: at crawl scale one bit-flipped record would
    kill the whole mapInPandas job. (Pre-fix: 98 IndexError + 4
    OverflowError in 800 mutations.)"""
    import random

    import numpy as np

    from muopdb_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = random.Random(23)
    img = (np.arange(24 * 24 * 3, dtype=np.uint8).reshape(24, 24, 3) * 7) % 255
    own = encode_jpeg(img)
    foreign = open(
        "tests/fixtures/media/python-raw.jpg", "rb"
    ).read()
    for blob in (own, foreign):
        for _ in range(150):
            b = bytearray(blob)
            for _ in range(rng.randint(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                out = decode_jpeg(bytes(b))
                assert out.dtype == np.uint8
            except (ValueError, NotImplementedError):
                pass  # the only legal refusals
