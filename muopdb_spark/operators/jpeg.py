"""Baseline JPEG codec — pure numpy + struct, from the public
ITU-T T.81 / ISO 10918-1 specification (the treatment that made PNG
real in operators/image.py and WAV in operators/audio.py).

Decoder coverage (honest gates, refused by name):
  - baseline sequential DCT (SOF0), 8-bit samples, grayscale or YCbCr
    with ANY sampling factors (4:4:4, 4:2:2, 4:2:0, ...), restart
    markers (DRI/RSTn), multi-table DQT/DHT segments, 16-bit quant
    tables (Pq=1), multi-scan sequential files (non-interleaved
    per-component scans)
  - progressive DCT (SOF2) per T.81 G.1.2: spectral selection,
    successive approximation (DC and AC first + refinement scans,
    EOB runs, correction bits), restart markers inside any scan kind.
    Scans accumulate into per-component coefficient buffers; a single
    vectorized dequantize+IDCT pass finishes.
  - the other SOFn frame types raise NotImplementedError naming the
    frame type; arithmetic coding (DAC) raises by name
  - Huffman tables are read from the FILE's DHT segments (canonical
    code reconstruction), so files from any conformant encoder decode

Encoder: baseline or progressive (SOF2), quality-scaled Annex-K
quantization matrices, optional 4:2:0 subsampling and restart
intervals. The progressive scan script uses spectral selection
(1..5 / 6..63) AND successive approximation (DC Al=1->0, AC Al=2->0
with true refinement scans), so it exercises every decode path; both
modes hold identical quantized coefficients, so progressive output
decodes pixel-identically to baseline (tests pin exact equality).
Entropy tables are fixed-length canonical Huffman codes built here
and EMBEDDED in the output's DHT segments — spec-valid (any decoder
reads tables from DHT), deliberately simple, ~1 byte/symbol larger
than optimized tables. JPEG is lossy: roundtrips are exact only for
quality=100 DC-flat content; tests pin PSNR and perceptual-hash
stability instead of byte equality.

Scale note: like the PNG/WAV codecs, decode rides Arrow batches into
mapInPandas via image_features/decode_image — executor-side, never a
driver collect.
"""

from __future__ import annotations

import struct
from array import array

import numpy as np

# zigzag scan order: zz[k] = (row, col) of the k-th coefficient
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.1/K.2 reference quantization matrices (raster order)
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# orthonormal 8-point DCT-II basis: T @ T.T == I, FDCT = T B T',
# IDCT = T' D T (float64 — exact enough that q=100 roundtrips flat
# blocks bit-exactly after rounding)
_T = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = np.sqrt(0.125) if _u == 0 else 0.5
        _T[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K matrices (1..100)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    ql = np.clip((_QL * scale + 50) // 100, 1, 255)
    qc = np.clip((_QC * scale + 50) // 100, 1, 255)
    return ql, qc


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    return np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)


# --------------------------------------------------- entropy (encode)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _fixed_table(symbols: list[int]) -> tuple[dict, bytes]:
    """Fixed-length canonical Huffman table: every symbol gets a code
    of length L = ceil(log2(n+1)) (so the all-ones code stays unused —
    spec convention). Returns ({symbol: (code, L)}, DHT payload
    (16 count bytes + symbol bytes))."""
    n = len(symbols)
    L = max(2, int(np.ceil(np.log2(n + 1))))
    codes = {s: (i, L) for i, s in enumerate(symbols)}
    counts = bytearray(16)
    counts[L - 1] = n
    return codes, bytes(counts) + bytes(symbols)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_blocks(
    w: _BitWriter, coefs: np.ndarray, dc_tab: dict, ac_tab: dict,
    pred: int,
) -> int:
    """Entropy-encode one component block's zigzag coefficients."""
    zz = coefs
    diff = int(zz[0]) - pred
    size = _category(diff)
    w.put(*dc_tab[size])
    if size:
        bits = diff if diff > 0 else diff + (1 << size) - 1
        w.put(bits, size)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            w.put(*ac_tab[0xF0])  # ZRL
            run -= 16
        size = _category(v)
        w.put(*ac_tab[(run << 4) | size])
        bits = v if v > 0 else v + (1 << size) - 1
        w.put(bits, size)
        run = 0
    if last < 63:
        w.put(*ac_tab[0x00])  # EOB
    return int(zz[0])


# ------------------------------------------- entropy (encode, progressive)
#
# Scan script: DC first (Al=1, interleaved) -> per-component AC first
# scans with spectral selection (1..5, 6..63 at Al=2) -> AC refinement
# passes (Al 2->1, 1->0) -> DC refinement. Exercises every progressive
# decode path incl. EOB runs and correction bits.


def _enc_dc_first(w: _BitWriter, zz, dc_tab: dict, pred: int, al: int) -> int:
    """DC first scan: predictor runs in the point-transformed domain
    (arithmetic shift per T.81 G.1.2.1)."""
    v = int(zz[0]) >> al
    diff = v - pred
    size = _category(diff)
    w.put(*dc_tab[size])
    if size:
        bits = diff if diff > 0 else diff + (1 << size) - 1
        w.put(bits, size)
    return v


def _enc_dc_refine(w: _BitWriter, zz, al: int) -> None:
    w.put((int(zz[0]) >> al) & 1, 1)


def _emit_eobrun(w: _BitWriter, ac_tab: dict, st: dict) -> None:
    """Flush a pending EOB run: EOBn symbol, its extra bits, then the
    correction bits buffered for the run's blocks (refinement scans)."""
    n = st["eobrun"]
    if n:
        r = n.bit_length() - 1
        w.put(*ac_tab[r << 4])
        if r:
            w.put(n - (1 << r), r)
        for b in st["be"]:
            w.put(b, 1)
        st["eobrun"] = 0
        st["be"] = []


def _enc_ac_first_block(
    w: _BitWriter, zz, ss: int, se: int, al: int, ac_tab: dict, st: dict,
) -> None:
    """AC first scan for one block (T.81 G.1.2.2): magnitude point
    transform, run-length symbols, EOB-run accumulation across blocks."""
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = (v if v >= 0 else -v) >> al
        if t == 0:
            r += 1
            continue
        _emit_eobrun(w, ac_tab, st)
        while r > 15:
            w.put(*ac_tab[0xF0])
            r -= 16
        s = t.bit_length()
        w.put(*ac_tab[(r << 4) | s])
        tv = t if v > 0 else -t
        bits = tv if tv > 0 else tv + (1 << s) - 1
        w.put(bits, s)
        r = 0
    if r > 0:
        st["eobrun"] += 1
        if st["eobrun"] == 0x7FFF:
            _emit_eobrun(w, ac_tab, st)


def _enc_ac_refine_block(
    w: _BitWriter, zz, ss: int, se: int, al: int, ac_tab: dict, st: dict,
) -> None:
    """AC refinement for one block (T.81 G.1.2.3): |v|>>Al == 1 is
    newly nonzero ((run,1) symbol + sign); |v|>>Al > 1 has history and
    contributes one correction bit, buffered and emitted after the next
    symbol (or with the EOB run it folds into). ZRL covers 16
    zero-history positions and is only worth emitting before the last
    newly-nonzero coefficient; trailing content folds into the run."""
    absv = []
    eob = ss - 1
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = (v if v >= 0 else -v) >> al
        absv.append(t)
        if t == 1:
            eob = k
    r = 0
    br_bits: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            _emit_eobrun(w, ac_tab, st)
            w.put(*ac_tab[0xF0])
            r -= 16
            for b in br_bits:
                w.put(b, 1)
            br_bits = []
        if t > 1:
            br_bits.append(t & 1)
            continue
        _emit_eobrun(w, ac_tab, st)
        w.put(*ac_tab[(r << 4) | 1])
        w.put(1 if int(zz[k]) > 0 else 0, 1)
        for b in br_bits:
            w.put(b, 1)
        br_bits = []
        r = 0
    if r > 0 or br_bits:
        st["eobrun"] += 1
        st["be"].extend(br_bits)
        if st["eobrun"] == 0x7FFF:
            _emit_eobrun(w, ac_tab, st)


def _prog_scan_data(
    kind: str, cis: list[int], ss: int, se: int, al: int, coefs: list,
    samp: list, ri: int, mcux: int, mcuy: int, hmax: int, vmax: int,
    h: int, w: int, dc_tab: dict, ac_tab: dict,
) -> bytes:
    """Entropy-coded data for one progressive scan, with restart
    markers every `ri` units (MCUs when interleaved, blocks when not)."""
    out = bytearray()
    wtr = _BitWriter()
    st = {"eobrun": 0, "be": []}
    preds = {ci: 0 for ci in cis}
    rst = 0
    interleaved = len(cis) > 1
    if interleaved:
        nunits = mcux * mcuy
        bw0 = 0
    else:
        sh0, sv0 = samp[cis[0]]
        bw0 = (-(-(w * sh0) // hmax) + 7) // 8
        bh0 = (-(-(h * sv0) // vmax) + 7) // 8
        nunits = bw0 * bh0
    for unit in range(nunits):
        if ri and unit and unit % ri == 0:
            _emit_eobrun(wtr, ac_tab, st)
            wtr.flush()
            out += wtr.out
            wtr = _BitWriter()
            out += struct.pack(">H", 0xFFD0 + (rst & 7))
            rst += 1
            preds = {ci: 0 for ci in cis}
        if interleaved:
            my, mx = divmod(unit, mcux)
            for ci in cis:
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        zz = coefs[ci][my * sv + by, mx * sh + bx]
                        if kind == "dc_first":
                            preds[ci] = _enc_dc_first(
                                wtr, zz, dc_tab, preds[ci], al
                            )
                        else:
                            _enc_dc_refine(wtr, zz, al)
        else:
            ci = cis[0]
            by, bx = divmod(unit, bw0)
            zz = coefs[ci][by, bx]
            if kind == "dc_first":
                preds[ci] = _enc_dc_first(wtr, zz, dc_tab, preds[ci], al)
            elif kind == "dc_refine":
                _enc_dc_refine(wtr, zz, al)
            elif kind == "ac_first":
                _enc_ac_first_block(wtr, zz, ss, se, al, ac_tab, st)
            else:
                _enc_ac_refine_block(wtr, zz, ss, se, al, ac_tab, st)
    _emit_eobrun(wtr, ac_tab, st)
    wtr.flush()
    out += wtr.out
    return bytes(out)


def encode_jpeg(
    arr: np.ndarray, *, quality: int = 90, subsample: bool = False,
    restart_interval: int = 0, progressive: bool = False,
) -> bytes:
    """Encode a uint8 (H, W) grayscale or (H, W, 3) RGB array as a
    baseline JPEG. `subsample=True` writes 4:2:0 chroma; JPEG is lossy
    — see the module docstring for the fidelity contract.
    `progressive=True` writes an SOF2 file (spectral selection +
    successive approximation scans, incl. AC refinement) holding the
    SAME quantized coefficients, so it decodes pixel-identically to the
    baseline encoding of the same input."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 2:
        comps = [a]
        gray = True
    elif a.ndim == 3 and a.shape[2] == 3:
        ycc = _rgb_to_ycbcr(a)
        comps = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        gray = False
    else:
        raise ValueError(
            f"encode_jpeg: unsupported shape {np.asarray(arr).shape}; "
            "expected (H, W) or (H, W, 3) uint8"
        )
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("encode_jpeg: empty image")
    ql, qc = _quality_tables(quality)
    qts = [ql] + ([] if gray else [qc])

    # sampling factors per component
    if gray:
        samp = [(1, 1)]
    elif subsample:
        samp = [(2, 2), (1, 1), (1, 1)]
        # box-subsample chroma
        ph = (h + 1) // 2 * 2
        pw = (w + 1) // 2 * 2
        for ci in (1, 2):
            c = comps[ci]
            c = np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge")
            comps[ci] = c.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    else:
        samp = [(1, 1)] * 3
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    # pad every component plane to the full MCU grid (a luma plane in
    # 4:2:0 needs mcuy*2 x mcux*2 blocks even when the image only
    # partially covers the last MCU row/column)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for ci, c in enumerate(comps):
        sh, sv = samp[ci]
        dh = -(-h * sv // vmax)
        dw = -(-w * sh // hmax)
        c = c[:dh, :dw]
        ph = mcuy * sv * 8
        pw = mcux * sh * 8
        planes.append(
            np.pad(c, ((0, ph - c.shape[0]), (0, pw - c.shape[1])),
                   mode="edge")
        )

    # quantized zigzag coefficients per component, block-row-major
    def blocks(plane: np.ndarray, q: np.ndarray):
        # one batched FDCT over every block (the decoder-side _finish
        # treatment): per-block Python matmuls dominated small-image
        # encode throughput
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        lvl = (plane - 128.0).reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        d = np.einsum("ux,ijxy,vy->ijuv", _T, lvl, _T)
        deq = d / q.reshape(8, 8)[None, None, :, :]
        return np.rint(
            deq.reshape(bh, bw, 64)[..., _ZZ]
        ).astype(np.int64)

    qidx = [0] + ([] if gray else [1, 1])
    coefs = [blocks(planes[i], qts[qidx[i]]) for i in range(len(planes))]

    # entropy tables: DC sizes 0..11, AC all (run, size) symbols;
    # progressive scans additionally need the EOBn symbols (r<<4 | 0,
    # r = 1..14 — 0x00 doubles as EOB0)
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    if progressive:
        ac_syms += [r << 4 for r in range(1, 15)]
    dc_tab, dc_payload = _fixed_table(dc_syms)
    ac_tab, ac_payload = _fixed_table(ac_syms)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qts):
        out += seg(0xFFDB, bytes([ti]) + bytes(int(x) for x in q[_ZZ]))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qidx[ci]])
    out += seg(0xFFC2 if progressive else 0xFFC0, sof)
    # DHT: class 0 (DC) id 0, class 1 (AC) id 0 — shared by all comps
    out += seg(0xFFC4, bytes([0x00]) + dc_payload)
    out += seg(0xFFC4, bytes([0x10]) + ac_payload)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))

    if progressive:
        script = [("dc_first", list(range(ncomp)), 0, 0, 0, 1)]
        for ci in range(ncomp):
            script.append(("ac_first", [ci], 1, 5, 0, 2))
            script.append(("ac_first", [ci], 6, 63, 0, 2))
        for ci in range(ncomp):
            script.append(("ac_refine", [ci], 1, 63, 2, 1))
        for ci in range(ncomp):
            script.append(("ac_refine", [ci], 1, 63, 1, 0))
        script.append(("dc_refine", list(range(ncomp)), 0, 0, 1, 0))
        for kind, cis, ss, se, ah, al in script:
            sos = bytes([len(cis)])
            for ci in cis:
                sos += bytes([ci + 1, 0x00])
            sos += bytes([ss, se, (ah << 4) | al])
            out += seg(0xFFDA, sos)
            out += _prog_scan_data(
                kind, cis, ss, se, al, coefs, samp, restart_interval,
                mcux, mcuy, hmax, vmax, h, w, dc_tab, ac_tab,
            )
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)

    wtr = _BitWriter()
    preds = [0] * ncomp
    mcu_n = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                wtr.flush()
                out += wtr.out
                wtr = _BitWriter()
                out += struct.pack(">H", 0xFFD0 + (rst & 7))
                rst += 1
                preds = [0] * ncomp
            for ci in range(ncomp):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        zz = coefs[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_blocks(
                            wtr, zz, dc_tab, ac_tab, preds[ci]
                        )
            mcu_n += 1
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------- entropy (decode)


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _try_fill(self) -> bool:
        """Pull one byte into acc; False at end-of-data or a marker."""
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                return False  # a real marker: entropy data is over
        else:
            self.pos += 1
        # keep acc bounded to the live bits (consumed high bits are
        # masked away) — without this, acc grows into an unbounded
        # bigint and every shift turns O(bytes decoded): quadratic
        self.acc = ((self.acc & ((1 << self.nbits) - 1)) << 8) | b
        self.nbits += 8
        return True

    def _fill(self) -> None:
        if not self._try_fill():
            raise ValueError("decode_jpeg: entropy data exhausted")

    def peek16(self) -> tuple[int, int]:
        """(next 16 bits MSB-first, number of REAL bits among them).
        Near the end of the stream the missing low bits are padded
        with 1s — the spec's pad convention — but a decode may only
        CONSUME real bits (the caller checks the returned count)."""
        while self.nbits < 16:
            if not self._try_fill():
                pad = 16 - self.nbits
                return (
                    ((self.acc << pad) | ((1 << pad) - 1)) & 0xFFFF,
                    self.nbits,
                )
        return (self.acc >> (self.nbits - 16)) & 0xFFFF, 16

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def align_to_marker(self) -> int:
        """Discard padding bits, expect a marker, return its second
        byte and position after it."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1
        if p + 1 >= len(d) or d[p] != 0xFF:
            raise ValueError("decode_jpeg: expected a restart marker")
        m = d[p + 1]
        self.pos = p + 2
        return m


# ITU-T T.81 Annex K.3 "typical" Huffman tables (DC/AC, luminance/
# chrominance), as (16 count bytes + symbol bytes) DHT payloads. NOT
# transcribed from memory: extracted from real-world JPEG files and
# cross-validated byte-identical across four independently-authored
# files (CPython/IPython test data, the Spark distribution's sample
# photos, third-party docs images); tests pin these constants against
# the vendored foreign fixture's own DHT segments. They back the
# MJPEG/OpenDML "implicit table" convention: AVI MJPEG frames may omit
# their DHT segments entirely, in which case decoders supply exactly
# these tables.
_STD_DHT = {
    (0, 0): bytes([
        0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0,
        0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11,
    ]),
    (0, 1): bytes([
        0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0,
        0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11,
    ]),
    (1, 0): bytes([
        0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125,
        1, 2, 3, 0, 4, 17, 5, 18, 33, 49, 65, 6, 19, 81, 97, 7,
        34, 113, 20, 50, 129, 145, 161, 8, 35, 66, 177, 193, 21, 82,
        209, 240, 36, 51, 98, 114, 130, 9, 10, 22, 23, 24, 25, 26,
        37, 38, 39, 40, 41, 42, 52, 53, 54, 55, 56, 57, 58, 67, 68,
        69, 70, 71, 72, 73, 74, 83, 84, 85, 86, 87, 88, 89, 90, 99,
        100, 101, 102, 103, 104, 105, 106, 115, 116, 117, 118, 119,
        120, 121, 122, 131, 132, 133, 134, 135, 136, 137, 138, 146,
        147, 148, 149, 150, 151, 152, 153, 154, 162, 163, 164, 165,
        166, 167, 168, 169, 170, 178, 179, 180, 181, 182, 183, 184,
        185, 186, 194, 195, 196, 197, 198, 199, 200, 201, 202, 210,
        211, 212, 213, 214, 215, 216, 217, 218, 225, 226, 227, 228,
        229, 230, 231, 232, 233, 234, 241, 242, 243, 244, 245, 246,
        247, 248, 249, 250,
    ]),
    (1, 1): bytes([
        0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119,
        0, 1, 2, 3, 17, 4, 5, 33, 49, 6, 18, 65, 81, 7, 97, 113,
        19, 34, 50, 129, 8, 20, 66, 145, 161, 177, 193, 9, 35, 51,
        82, 240, 21, 98, 114, 209, 10, 22, 36, 52, 225, 37, 241, 23,
        24, 25, 26, 38, 39, 40, 41, 42, 53, 54, 55, 56, 57, 58, 67,
        68, 69, 70, 71, 72, 73, 74, 83, 84, 85, 86, 87, 88, 89, 90,
        99, 100, 101, 102, 103, 104, 105, 106, 115, 116, 117, 118,
        119, 120, 121, 122, 130, 131, 132, 133, 134, 135, 136, 137,
        138, 146, 147, 148, 149, 150, 151, 152, 153, 154, 162, 163,
        164, 165, 166, 167, 168, 169, 170, 178, 179, 180, 181, 182,
        183, 184, 185, 186, 194, 195, 196, 197, 198, 199, 200, 201,
        202, 210, 211, 212, 213, 214, 215, 216, 217, 218, 226, 227,
        228, 229, 230, 231, 232, 233, 234, 242, 243, 244, 245, 246,
        247, 248, 249, 250,
    ]),
}
_STD_HUFF_CACHE: dict = {}


def _std_huff(tc: int, th: int) -> dict | None:
    """Decoded standard table for (class, id), or None outside the
    conventional id range."""
    key = (tc, th)
    if key not in _STD_DHT:
        return None
    if key not in _STD_HUFF_CACHE:
        blob = _STD_DHT[key]
        _STD_HUFF_CACHE[key] = _huff_from_dht(blob[:16], blob[16:])
    return _STD_HUFF_CACHE[key]


_LUT_CACHE: dict[bytes, "array"] = {}


def _huff_from_dht(counts: bytes, symbols: bytes) -> array:
    """Canonical Huffman reconstruction as a flat 16-bit-prefix LUT:
    lut[prefix] = (symbol << 5) | code_length, 0 = invalid prefix.
    One list lookup decodes any code (vs a bit-by-bit tree walk) —
    the dominant cost of real-photo entropy decode. Malformed DHTs
    whose canonical codes overflow 16 bits simply leave slots invalid
    (same observable behavior as the old dict: a decode-time
    ValueError).

    Built LUTs are cached by table bytes: for TINY images the 64k
    build would otherwise dominate the decode, and batch pipelines
    (one encoder, many files — the m9/m6 shape) reuse a handful of
    distinct tables across every file. Stored as array('i') — 256 KB
    per table with list-like scalar indexing speed (a Python int list
    of 65536 boxed ints would be ~2 MB each); eviction pops the
    oldest entry rather than clearing the cache."""
    key = bytes(counts) + bytes(symbols)
    cached = _LUT_CACHE.get(key)
    if cached is not None:
        return cached
    lut = np.zeros(1 << 16, np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            if hi <= (1 << 16):
                lut[lo:hi] = (symbols[k] << 5) | length
            code += 1
            k += 1
        code <<= 1
    out = array("i", lut.tobytes())
    if len(_LUT_CACHE) >= 64:  # bound: 64 x 256 KB per worker
        _LUT_CACHE.pop(next(iter(_LUT_CACHE)))  # FIFO, not clear-all
    _LUT_CACHE[key] = out
    return out


def _huff_decode(br: _BitReader, lut: array) -> int:
    p, avail = br.peek16()
    v = lut[p]
    length = v & 31
    if length == 0:
        raise ValueError("decode_jpeg: invalid Huffman code in entropy data")
    if length > avail:
        raise ValueError("decode_jpeg: entropy data exhausted")
    br.nbits -= length
    return v >> 5


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


_SOF_NAMES = {
    0xC1: "extended sequential (SOF1)",
    0xC3: "lossless (SOF3)", 0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)", 0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)", 0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
}


def _blk_sequential(br, blk, dc_t, ac_t, preds, ci) -> None:
    """Full-band DC+AC decode of one block (baseline / SOF0 scans)."""
    s = _huff_decode(br, dc_t)
    if s:
        preds[ci] += _extend(br.bits(s), s)
    blk[0] = preds[ci]
    k = 1
    while k < 64:
        rs = _huff_decode(br, ac_t)
        if rs == 0x00:  # EOB
            return
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += rs >> 4
        size = rs & 0x0F
        if k > 63 or size == 0:
            raise ValueError("decode_jpeg: AC coefficient overrun")
        blk[k] = _extend(br.bits(size), size)
        k += 1


def _blk_dc_first(br, blk, dc_t, preds, ci, al) -> None:
    """Progressive DC first scan (T.81 G.1.2.1): the predictor runs in
    the point-transformed domain; the stored value is shifted back."""
    s = _huff_decode(br, dc_t)
    if s:
        preds[ci] += _extend(br.bits(s), s)
    blk[0] = preds[ci] << al


def _blk_dc_refine(br, blk, al) -> None:
    """One raw bit per block: appends two's-complement bit `al` of the
    DC coefficient (works for negative values because first-scan
    storage was an arithmetic-shift round-trip)."""
    if br.bit():
        blk[0] |= 1 << al


def _blk_ac_first(br, blk, ac_t, ss, se, al, eobrun) -> int:
    """Progressive AC first scan for one block; returns updated EOB
    run (run counts FURTHER all-zero blocks beyond this one)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(br, ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.bits(r)
            break
        k += r
        if k > se:
            raise ValueError("decode_jpeg: AC coefficient overrun")
        blk[k] = _extend(br.bits(s), s) << al
        k += 1
    return eobrun


def _blk_ac_refine(br, blk, ac_t, ss, se, al, eobrun) -> int:
    """Progressive AC refinement (T.81 G.1.2.3): newly nonzero
    coefficients arrive as (run, 1) symbols + a sign bit; every
    coefficient with nonzero history passed over contributes one
    correction bit. EOB runs still carry the correction bits of their
    blocks' nonzero coefficients."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(br, ac_t)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            elif s == 1:
                val = p1 if br.bit() else -p1
            else:
                raise ValueError(
                    "decode_jpeg: refinement scan magnitude must be 1"
                )
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if br.bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c > 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("decode_jpeg: AC refinement overrun")
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(blk[k])
            if c != 0 and br.bit() and (c & p1) == 0:
                blk[k] = c + (p1 if c > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(
    data: bytes, pos: int, scan: list, ss: int, se: int, ah: int,
    al: int, frame: dict, huff: dict, dri: int, coefs: list,
) -> int:
    """Decode one scan's entropy data into the coefficient buffers;
    returns the stream position of the next marker. Handles
    interleaved (ns > 1, MCU order) and non-interleaved (ns == 1, the
    component's own block grid) scans, restart markers, and all four
    progressive scan kinds plus sequential full-band scans."""
    progressive = frame["progressive"]
    comps = frame["comps"]
    order = {cid: i for i, (cid, _h, _v, _q) in enumerate(comps)}
    hmax, vmax = frame["hmax"], frame["vmax"]
    mcux, mcuy = frame["mcux"], frame["mcuy"]
    h, w = frame["h"], frame["w"]

    # resolve + validate scan components and their tables
    sel = []
    for cs, td, ta in scan:
        ci = order.get(cs)
        if ci is None:
            raise ValueError(
                "decode_jpeg: scan component not declared in SOF"
            )
        needs_dc = ss == 0 and ah == 0
        needs_ac = se > 0 if progressive else True
        # the T.81 Annex K.3 typical tables back the MJPEG/OpenDML
        # implicit-table convention — which means a file carrying NO
        # DHT segments at all. A file that carries some tables but is
        # missing one is corrupt and must stay a loud error, not a
        # silent mixed-table decode.
        no_dht = not huff
        dc_t = huff.get((0, td)) or (_std_huff(0, td) if no_dht else None)
        ac_t = huff.get((1, ta)) or (_std_huff(1, ta) if no_dht else None)
        if needs_dc and dc_t is None:
            raise ValueError("decode_jpeg: missing DHT table")
        if needs_ac and ac_t is None:
            raise ValueError("decode_jpeg: missing DHT table")
        sel.append((ci, dc_t, ac_t))

    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("decode_jpeg: progressive DC scan with Se != 0")
        if ss > 0 and len(scan) != 1:
            raise ValueError("decode_jpeg: interleaved progressive AC scan")
        if ss > 63 or se > 63 or se < ss:
            raise ValueError("decode_jpeg: bad spectral selection bounds")
        if ah and ah != al + 1:
            raise ValueError(
                "decode_jpeg: successive approximation must refine one bit"
            )
    elif (ss, se, ah, al) != (0, 63, 0, 0):
        raise ValueError("decode_jpeg: non-full-band sequential scan")

    br = _BitReader(data, pos)
    preds = {ci: 0 for ci, _d, _a in sel}
    eobrun = 0
    rst_n = 0

    if len(sel) > 1:
        # interleaved: MCU order over the full MCU grid
        nunits = mcux * mcuy
        interleaved = True
        bw0 = 0
    else:
        # non-interleaved: the component's own block grid, which may
        # be smaller than its slice of the MCU grid (T.81 A.2.2 —
        # ceil(ceil(w*ch/hmax)/8) x ceil(ceil(h*cv/vmax)/8) blocks)
        ci0 = sel[0][0]
        _cid, ch0, cv0, _q = comps[ci0]
        bw0 = (-(-(w * ch0) // hmax) + 7) // 8
        bh0 = (-(-(h * cv0) // vmax) + 7) // 8
        nunits = bw0 * bh0
        interleaved = False

    for unit in range(nunits):
        if dri and unit and unit % dri == 0:
            m = br.align_to_marker()
            if not (0xD0 <= m <= 0xD7):
                raise ValueError(
                    f"decode_jpeg: expected RST marker, got 0xFF{m:02X}"
                )
            if m - 0xD0 != (rst_n & 7):
                raise ValueError("decode_jpeg: restart marker out of order")
            rst_n += 1
            preds = {ci: 0 for ci, _d, _a in sel}
            eobrun = 0
        if interleaved:
            my, mx = divmod(unit, mcux)
            for ci, dc_t, ac_t in sel:
                _cid, ch_, cv, _q = comps[ci]
                for by in range(cv):
                    for bx in range(ch_):
                        blk = coefs[ci][my * cv + by, mx * ch_ + bx]
                        if not progressive:
                            _blk_sequential(br, blk, dc_t, ac_t, preds, ci)
                        elif ah == 0:
                            _blk_dc_first(br, blk, dc_t, preds, ci, al)
                        else:
                            _blk_dc_refine(br, blk, al)
        else:
            ci, dc_t, ac_t = sel[0]
            by, bx = divmod(unit, bw0)
            blk = coefs[ci][by, bx]
            if not progressive:
                _blk_sequential(br, blk, dc_t, ac_t, preds, ci)
            elif ss == 0:
                if ah == 0:
                    _blk_dc_first(br, blk, dc_t, preds, ci, al)
                else:
                    _blk_dc_refine(br, blk, al)
            elif ah == 0:
                eobrun = _blk_ac_first(br, blk, ac_t, ss, se, al, eobrun)
            else:
                eobrun = _blk_ac_refine(br, blk, ac_t, ss, se, al, eobrun)

    # advance to the next marker (skip pad bits and stuffed 0xFF00)
    p = br.pos
    while p + 1 < len(data) and (data[p] != 0xFF or data[p + 1] == 0x00):
        p += 1
    return p


def _finish(frame: dict, qt: dict, coefs: list) -> np.ndarray:
    """Dequantize + batch IDCT every block, assemble / upsample the
    component planes, crop, and color-convert."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    full = []
    for ci, (_cid, ch_, cv, tq) in enumerate(comps):
        if tq not in qt:
            raise ValueError("decode_jpeg: missing DQT table")
        c = coefs[ci]
        bh, bw = c.shape[:2]
        raster = np.zeros((bh, bw, 64), np.int64)
        raster[..., _ZZ] = c
        deq = (raster * qt[tq][None, None, :]).reshape(bh, bw, 8, 8)
        px = np.einsum(
            "ux,ijuv,vy->ijxy", _T, deq.astype(np.float64), _T
        ) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        if ch_ < hmax or cv < vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // cv, axis=0), hmax // ch_, axis=1
            )
        full.append(plane[:h, :w])
    if len(comps) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
    if len(comps) != 3:
        raise NotImplementedError(
            f"decode_jpeg: {len(comps)}-component images unsupported "
            "(grayscale or YCbCr)"
        )
    rgb = _ycbcr_to_rgb(full[0], full[1], full[2])
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline (SOF0) or progressive (SOF2) JPEG bytes to
    uint8 (H, W) grayscale or (H, W, 3) RGB. Tables come from the
    file's own DQT/DHT segments; scans accumulate into per-component
    coefficient buffers (spectral selection + successive approximation
    per T.81 G.1.2, incl. AC refinement and EOB runs), then one
    vectorized dequantize+IDCT pass finishes. Other frame types refuse
    by name.

    Error taxonomy (r16, mutation-fuzz hardening): malformed input is
    ALWAYS a ValueError and unsupported features a NotImplementedError
    — a corrupted entropy stream must read as a refusable bad record,
    not an engine crash: at crawl scale one bit-flipped JPEG raising a
    raw IndexError out of the Huffman walk would kill the whole
    mapInPandas job. Internal unstructured failures (index/overflow/
    key/struct errors) are converted here; the two named types pass
    through."""
    try:
        return _decode_jpeg_impl(data)
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, OverflowError, KeyError, struct.error) as e:
        raise ValueError(
            f"decode_jpeg: corrupt stream ({type(e).__name__}: {e})"
        ) from e


def _decode_jpeg_impl(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("decode_jpeg: not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame: dict | None = None
    coefs: list | None = None
    dri = 0
    nscans = 0
    while True:
        # data ending after >= 1 complete scan decodes leniently (a
        # clipped tail — missing EOI — is common in real crawls and
        # the pre-r13 single-scan decoder handled it); truncation
        # before any scan stays an error
        if pos + 2 > len(data):
            if nscans:
                break
            raise ValueError("decode_jpeg: truncated marker stream")
        if data[pos] != 0xFF:
            raise ValueError("decode_jpeg: marker desync")
        # spec-legal 0xFF fill bytes may pad before any marker
        # (T.81 B.1.1.2) — same handling as media_probe's JPEG walk
        while pos + 2 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(data):
            if nscans:
                break
            raise ValueError("decode_jpeg: truncated marker stream")
        m = data[pos + 1]
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:  # standalone TEM / stray RST
            pos += 2
            continue
        if pos + 4 > len(data):
            if nscans:
                break
            raise ValueError("decode_jpeg: truncated marker stream")
        (ln,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + ln]
        if len(body) != ln - 2:
            if nscans:
                break
            raise ValueError("decode_jpeg: truncated segment")
        if m == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq == 0:
                    tab = np.frombuffer(
                        body[p:p + 64], np.uint8
                    ).astype(np.int64)
                    p += 64
                else:
                    tab = np.frombuffer(
                        body[p:p + 128], ">u2"
                    ).astype(np.int64)
                    p += 128
                raster = np.empty(64, np.int64)
                raster[_ZZ] = tab
                qt[tq] = raster
        elif m == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                counts = body[p + 1:p + 17]
                n = sum(counts)
                symbols = body[p + 17:p + 17 + n]
                huff[(tc, th)] = _huff_from_dht(counts, symbols)
                p += 17 + n
        elif m in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if frame is not None:
                raise ValueError("decode_jpeg: multiple SOF frames")
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(
                    f"decode_jpeg: {prec}-bit precision unsupported"
                )
            h, w = struct.unpack(">HH", body[1:5])
            if h == 0 or w == 0:
                raise ValueError("decode_jpeg: zero-dimension image")
            nc = body[5]
            comps = []
            for i in range(nc):
                cid, sampb, tq0 = body[6 + 3 * i:9 + 3 * i]
                comps.append((cid, sampb >> 4, sampb & 0x0F, tq0))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for _cid, ch_, cv, _q in comps:
                if ch_ == 0 or cv == 0 or hmax % ch_ or vmax % cv:
                    raise NotImplementedError(
                        f"decode_jpeg: non-integer sampling ratio "
                        f"({ch_}x{cv} vs max {hmax}x{vmax}) unsupported "
                        "(integer-ratio chroma subsampling only)"
                    )
            frame = {
                "h": h, "w": w, "comps": comps, "hmax": hmax,
                "vmax": vmax, "mcux": -(-w // (8 * hmax)),
                "mcuy": -(-h // (8 * vmax)),
                "progressive": m == 0xC2,
            }
            coefs = [
                np.zeros(
                    (frame["mcuy"] * cv, frame["mcux"] * ch_, 64),
                    np.int32,
                )
                for (_cid, ch_, cv, _q) in comps
            ]
        elif m in _SOF_NAMES:
            raise NotImplementedError(
                f"decode_jpeg: {_SOF_NAMES[m]} unsupported (baseline "
                "SOF0 and progressive SOF2 only)"
            )
        elif m == 0xCC:
            raise NotImplementedError(
                "decode_jpeg: arithmetic coding (DAC) unsupported"
            )
        elif m == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", body[:2])
        elif m == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("decode_jpeg: SOS before SOF")
            ns = body[0]
            if ns < 1 or len(body) < 4 + 2 * ns:
                raise ValueError("decode_jpeg: malformed scan header")
            scan = []
            for i in range(ns):
                cs, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cs, tabs >> 4, tabs & 0x0F))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            pos = _decode_scan(
                data, pos + 2 + ln, scan, ss, se, ahal >> 4,
                ahal & 0x0F, frame, huff, dri, coefs,
            )
            nscans += 1
            continue
        pos += 2 + ln

    if frame is None or nscans == 0:
        raise ValueError("decode_jpeg: no scan data before EOI")
    return _finish(frame, qt, coefs)
