"""Baseline JPEG codec — pure numpy + struct, from the public
ITU-T T.81 / ISO 10918-1 specification (the treatment that made PNG
real in operators/image.py and WAV in operators/audio.py).

Decoder coverage (honest gates, refused by name):
  - baseline sequential DCT (SOF0), 8-bit samples, grayscale or YCbCr
    with ANY sampling factors (4:4:4, 4:2:2, 4:2:0, ...), restart
    markers (DRI/RSTn), multi-table DQT/DHT segments, 16-bit quant
    tables (Pq=1)
  - progressive (SOF2) and the other SOFn frame types raise
    NotImplementedError naming the frame type; arithmetic coding
    (DAC) raises by name
  - Huffman tables are read from the FILE's DHT segments (canonical
    code reconstruction), so files from any conformant encoder decode

Encoder: baseline, quality-scaled Annex-K quantization matrices,
optional 4:2:0 subsampling and restart intervals. Entropy tables are
fixed-length canonical Huffman codes built here and EMBEDDED in the
output's DHT segments — spec-valid (any decoder reads tables from
DHT), deliberately simple, ~1 byte/symbol larger than optimized
tables. JPEG is lossy: roundtrips are exact only for quality=100
DC-flat content; tests pin PSNR and perceptual-hash stability instead
of byte equality.

Scale note: like the PNG/WAV codecs, decode rides Arrow batches into
mapInPandas via image_features/decode_image — executor-side, never a
driver collect.
"""

from __future__ import annotations

import struct

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


def encode_jpeg(
    arr: np.ndarray, *, quality: int = 90, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode a uint8 (H, W) grayscale or (H, W, 3) RGB array as a
    baseline JPEG. `subsample=True` writes 4:2:0 chroma; JPEG is lossy
    — see the module docstring for the fidelity contract."""
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
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        lvl = plane - 128.0
        out = np.empty((bh, bw, 64), np.int64)
        qm = q.reshape(8, 8)
        for by in range(bh):
            for bx in range(bw):
                blk = lvl[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                d = _T @ blk @ _T.T
                out[by, bx] = np.rint(
                    (d / qm).ravel()[_ZZ]
                ).astype(np.int64)
        return out

    qidx = [0] + ([] if gray else [1, 1])
    coefs = [blocks(planes[i], qts[qidx[i]]) for i in range(len(planes))]

    # entropy tables: DC sizes 0..11, AC all (run, size) symbols
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
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
    out += seg(0xFFC0, sof)
    # DHT: class 0 (DC) id 0, class 1 (AC) id 0 — shared by all comps
    out += seg(0xFFC4, bytes([0x00]) + dc_payload)
    out += seg(0xFFC4, bytes([0x10]) + ac_payload)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
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

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("decode_jpeg: entropy data exhausted")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError(
                    "decode_jpeg: entropy data exhausted at marker"
                )
        else:
            self.pos += 1
        # keep acc bounded to the live bits (consumed high bits are
        # masked away) — without this, acc grows into an unbounded
        # bigint and every shift turns O(bytes decoded): quadratic
        self.acc = ((self.acc & ((1 << self.nbits) - 1)) << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

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


def _huff_from_dht(counts: bytes, symbols: bytes) -> dict:
    """Canonical Huffman reconstruction: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("decode_jpeg: invalid Huffman code in entropy data")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


_SOF_NAMES = {
    0xC1: "extended sequential (SOF1)", 0xC2: "progressive (SOF2)",
    0xC3: "lossless (SOF3)", 0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)", 0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)", 0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
}


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes to uint8 (H, W) grayscale or
    (H, W, 3) RGB. Tables come from the file's own DQT/DHT segments;
    non-baseline frame types refuse by name."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("decode_jpeg: not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    dri = 0
    while True:
        if pos + 4 > len(data):
            raise ValueError("decode_jpeg: truncated marker stream")
        if data[pos] != 0xFF:
            raise ValueError("decode_jpeg: marker desync")
        # spec-legal 0xFF fill bytes may pad before any marker
        # (T.81 B.1.1.2) — same handling as media_probe's JPEG walk
        while pos + 2 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(data):
            raise ValueError("decode_jpeg: truncated marker stream")
        m = data[pos + 1]
        if m == 0xD9:  # EOI before SOS
            raise ValueError("decode_jpeg: no scan data before EOI")
        (ln,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + ln]
        if len(body) != ln - 2:
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
        elif m == 0xC0:  # SOF0 baseline
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(
                    f"decode_jpeg: {prec}-bit precision unsupported"
                )
            h, w = struct.unpack(">HH", body[1:5])
            nc = body[5]
            comps = []
            for i in range(nc):
                cid, sampb, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append((cid, sampb >> 4, sampb & 0x0F, tq))
            sof = (h, w, comps)
        elif m in _SOF_NAMES:
            raise NotImplementedError(
                f"decode_jpeg: {_SOF_NAMES[m]} unsupported (baseline "
                "SOF0 only)"
            )
        elif m == 0xCC:
            raise NotImplementedError(
                "decode_jpeg: arithmetic coding (DAC) unsupported"
            )
        elif m == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", body[:2])
        elif m == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("decode_jpeg: SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cs, tabs >> 4, tabs & 0x0F))
            pos = pos + 2 + ln
            break
        pos += 2 + ln

    h, w, comps = sof
    if len(scan) != len(comps):
        raise NotImplementedError(
            "decode_jpeg: multi-scan files unsupported (baseline "
            "interleaved scan only)"
        )
    if h == 0 or w == 0:
        raise ValueError("decode_jpeg: zero-dimension image")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for _cid, ch_, cv, _q in comps:
        if ch_ == 0 or cv == 0 or hmax % ch_ or vmax % cv:
            raise NotImplementedError(
                f"decode_jpeg: non-integer sampling ratio "
                f"({ch_}x{cv} vs max {hmax}x{vmax}) unsupported "
                "(integer-ratio chroma subsampling only)"
            )
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    order = {cid: i for i, (cid, _h, _v, _q) in enumerate(comps)}
    planes = [
        np.zeros((mcuy * cv * 8, mcux * ch_ * 8))
        for (_cid, ch_, cv, _q) in comps
    ]
    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    rst_n = 0
    for mcu in range(mcux * mcuy):
        if dri and mcu and mcu % dri == 0:
            m = br.align_to_marker()
            if not (0xD0 <= m <= 0xD7):
                raise ValueError(
                    f"decode_jpeg: expected RST marker, got 0xFF{m:02X}"
                )
            if m - 0xD0 != (rst_n & 7):
                raise ValueError("decode_jpeg: restart marker out of order")
            rst_n += 1
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for cs, td, ta in scan:
            ci = order[cs]
            _cid, ch_, cv, tq = comps[ci]
            if tq not in qt or (0, td) not in huff or (1, ta) not in huff:
                raise ValueError("decode_jpeg: missing DQT/DHT table")
            for by in range(cv):
                for bx in range(ch_):
                    zz = np.zeros(64, np.int64)
                    s = _huff_decode(br, huff[(0, td)])
                    if s:
                        zz[0] = _extend(br.bits(s), s)
                    zz[0] += preds[ci]
                    preds[ci] = int(zz[0])
                    k = 1
                    while k < 64:
                        rs = _huff_decode(br, huff[(1, ta)])
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += rs >> 4
                        size = rs & 0x0F
                        if k > 63 or size == 0:
                            raise ValueError(
                                "decode_jpeg: AC coefficient overrun"
                            )
                        zz[k] = _extend(br.bits(size), size)
                        k += 1
                    raster = np.zeros(64, np.int64)
                    raster[_ZZ] = zz
                    blk = (raster * qt[tq]).reshape(8, 8).astype(np.float64)
                    px = _T.T @ blk @ _T + 128.0
                    y0 = (my * cv + by) * 8
                    x0 = (mx * ch_ + bx) * 8
                    planes[order[cs]][y0:y0 + 8, x0:x0 + 8] = px

    # upsample each component plane to full size and crop
    full = []
    for ci, (_cid, ch_, cv, _q) in enumerate(comps):
        p = planes[ci]
        if ch_ < hmax or cv < vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0),
                          hmax // ch_, axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
    if len(comps) != 3:
        raise NotImplementedError(
            f"decode_jpeg: {len(comps)}-component images unsupported "
            "(grayscale or YCbCr)"
        )
    rgb = _ycbcr_to_rgb(full[0], full[1], full[2])
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
