"""HDF5 offline vector source (S8) — pure-Python subset reader/writer.

The reference's index_writer ingests training vectors from HDF5 files
(rs/index_writer/src/input/hdf5.rs:20-49 `Hdf5Reader::new/fetch_next_chunk`,
driven by index_writer.rs; fixtures rs/index_writer/resources/*.hdf5
written by py/create_test_hdf5.py with default h5py settings). This
environment ships no HDF5 bindings (h5py/pytables absent), so the
metadata layer here is implemented directly from the PUBLIC HDF5 File
Format Specification (HDF Group, "HDF5 File Format Specification
Version 3.0" — the same layout h5py emits by default):

  superblock v0/v1 (+ v2/v3), old-style groups (symbol-table message ->
  v1 B-tree 'TREE' + local heap 'HEAP' -> 'SNOD' symbol nodes), v1
  object headers (+ continuation blocks), dataspace v1/v2, fixed-point
  and IEEE-float datatypes, data layout v3 CONTIGUOUS and CHUNKED
  (v1 B-tree chunk index, node type 1) with the deflate (gzip), LZF
  (h5py's bundled third-party filter, id 32000 — pure-Python
  codec from the public-domain libLZF format), shuffle, and
  fletcher32 filters — i.e. everything
  `h5py.create_dataset(..., chunks=..., compression='gzip'|'lzf',
  shuffle=True, fletcher32=True)` emits under the default libver.

plus (r16) the version-4 data layout message and all five of its
typed chunk indexes — single chunk, implicit, fixed array ('FAHD' /
'FADB', paged), extensible array ('EAHD'/'EAIB'/'EASB'/'EADB',
paged), and version-2 B-tree ('BTHD'/'BTIN'/'BTLF') — i.e. what
h5py emits under libver='latest', with every lookup3 block checksum
verified. Dense (fractal-heap) groups — the 'latest'-libver link
storage past the compact bound — are walked too (r16: 'FRHP' header,
doubling-table direct blocks under a root direct or indirect block,
type-5 name-index v2 B-tree; whole-block checksums verified with the
field-zeroed H5HF convention). That covers the reference fixtures AND
the chunked/gzip files public vector corpora usually ship as.
Non-trivial datatypes, other filters (szip, nbit, scaleoffset,
blosc, ...), huge/filtered heap objects, and nested indirect heap
blocks raise a NotImplementedError naming the feature, never a
silent misread.

Scale note (the reason the reader is worth having): like
sources/fvecs.py, the DRIVER touches only the few KB of metadata;
the contiguous data region is read by EXECUTORS in disjoint byte-range
chunks via mapInPandas — a 100 GB HDF5 corpus file ingests with the
same parallelism as a parquet scan, no single-node h5py pass.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF

# registered filter ids this reader can invert (spec section IV.A.2.l)
_F_DEFLATE, _F_SHUFFLE, _F_FLETCHER32 = 1, 2, 3
_F_LZF = 32000  # h5py's bundled third-party filter (libLZF format)
_FILTER_NAMES = {
    1: "deflate", 2: "shuffle", 3: "fletcher32", 4: "szip", 5: "nbit",
    6: "scaleoffset", 32000: "lzf", 32001: "blosc", 32004: "lz4",
    32015: "zstd",
}


def _u(b: bytes, off: int, n: int) -> int:
    return int.from_bytes(b[off:off + n], "little")


def _fletcher32(data: bytes) -> int:
    """HDF5's H5_checksum_fletcher32: Fletcher-32 over big-endian
    16-bit words (odd trailing byte high-shifted), ones-complement
    folded — the checksum the fletcher32 filter appends per chunk.

    The weighted sum s2 = sum(w_i * (n - i)) is accumulated per
    2^20-word block in Python ints: a single uint64 dot product wraps
    silently once n exceeds ~2^24.5 words (~47 MB chunks), which would
    reject valid large-chunk files as corrupt."""
    b = np.frombuffer(data, np.uint8)
    nw = len(b) // 2
    w = (b[: nw * 2 : 2].astype(np.uint64) << np.uint64(8)) | b[1 : nw * 2 : 2]
    if len(b) % 2:
        w = np.append(w, np.uint64(int(b[-1]) << 8))
    n = len(w)
    s1 = 0
    s2 = 0
    blk_words = 1 << 20
    for a in range(0, n, blk_words):
        blk = w[a:a + blk_words]
        lb = len(blk)
        bs = int(blk.sum())
        # sum over the block of w_j * (n - a - j)
        #   = sum(w_j * (lb - j)) + (n - a - lb) * sum(w_j)
        # each term stays < 2^57, well inside uint64
        inner = int(
            (blk * np.arange(lb, 0, -1, dtype=np.uint64)).sum()
        )
        s1 += bs
        s2 += inner + (n - a - lb) * bs
    # repeated (x & 0xffff) + (x >> 16) folding of a positive value
    # yields the residue mod 65535, except residue 0 folds to 0xffff
    f1 = s1 % 65535 or (0xFFFF if s1 else 0)
    f2 = s2 % 65535 or (0xFFFF if s2 else 0)
    return (f2 << 16) | f1


def _lookup3(data: bytes, init: int = 0) -> int:
    """Bob Jenkins' lookup3 hashlittle() (public domain, lookup3.c) —
    the checksum libhdf5 stamps on every version-2+ metadata block
    (H5_checksum_lookup3 in H5checksum.c): v2 object headers, fixed /
    extensible array blocks, v2 B-tree nodes. Pinned against the
    published lookup3.c self-test vectors in tests."""
    M = 0xFFFFFFFF

    def rot(x: int, k: int) -> int:
        return ((x << k) | (x >> (32 - k))) & M

    length = len(data)
    a = b = c = (0xDEADBEEF + length + init) & M
    p = 0
    while length > 12:
        a = (a + _u(data, p, 4)) & M
        b = (b + _u(data, p + 4, 4)) & M
        c = (c + _u(data, p + 8, 4)) & M
        # mix(a, b, c)
        a = (a - c) & M; a ^= rot(c, 4); c = (c + b) & M
        b = (b - a) & M; b ^= rot(a, 6); a = (a + c) & M
        c = (c - b) & M; c ^= rot(b, 8); b = (b + a) & M
        a = (a - c) & M; a ^= rot(c, 16); c = (c + b) & M
        b = (b - a) & M; b ^= rot(a, 19); a = (a + c) & M
        c = (c - b) & M; c ^= rot(b, 4); b = (b + a) & M
        p += 12
        length -= 12
    # the 1..12-byte tail: hashlittle's byte-wise switch sums equal
    # zero-padded little-endian words, then final(a, b, c); a zero-
    # length input skips final() and returns the initialized c
    if length:
        tail = data[p:] + b"\x00" * (12 - length)
        a = (a + _u(tail, 0, 4)) & M
        b = (b + _u(tail, 4, 4)) & M
        c = (c + _u(tail, 8, 4)) & M
        # final(a, b, c)
        c ^= b; c = (c - rot(b, 14)) & M
        a ^= c; a = (a - rot(c, 11)) & M
        b ^= a; b = (b - rot(a, 25)) & M
        c ^= b; c = (c - rot(b, 16)) & M
        a ^= c; a = (a - rot(c, 4)) & M
        b ^= a; b = (b - rot(a, 14)) & M
        c ^= b; c = (c - rot(b, 24)) & M
    return c


def _lzf_decompress(data: bytes) -> bytes:
    """Decompress a libLZF stream (the payload format of h5py's LZF
    filter, id 32000 — public-domain format by Marc Lehmann):
    control byte < 0x20 = literal run of ctrl+1 bytes; otherwise a
    back-reference of length (ctrl >> 5) + 2 (a length field of 7
    extends by the next byte, max 264) at distance
    (((ctrl & 0x1F) << 8) | next) + 1 (max 8192), copied byte-wise so
    overlapping (RLE-style) references work. Malformed streams raise
    ValueError — never a silent misread."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        ctrl = data[i]
        i += 1
        if ctrl < 0x20:
            ln = ctrl + 1
            if i + ln > n:
                raise ValueError("lzf: truncated literal run")
            out += data[i:i + ln]
            i += ln
        else:
            ln = ctrl >> 5
            if ln == 7:
                if i >= n:
                    raise ValueError("lzf: truncated extended length")
                ln += data[i]
                i += 1
            if i >= n:
                raise ValueError("lzf: truncated back-reference")
            ref = len(out) - (((ctrl & 0x1F) << 8) | data[i]) - 1
            i += 1
            if ref < 0:
                raise ValueError("lzf: back-reference before stream start")
            for _ in range(ln + 2):
                out.append(out[ref])
                ref += 1
    return bytes(out)


def _lzf_compress(data: bytes) -> bytes:
    """Greedy libLZF compressor (hash-chain of 3-byte prefixes, last
    occurrence wins): emits literal runs (<=32) and back-references
    (length 3..264, distance 1..8192). Output is a valid LZF stream for
    ANY input; callers apply the OPTIONAL-filter rule (store raw with
    the mask bit when compression does not help), matching h5py."""
    n = len(data)
    out = bytearray()
    lit = bytearray()

    def flush_literals() -> None:
        j = 0
        while j < len(lit):
            seg = lit[j:j + 32]
            out.append(len(seg) - 1)
            out.extend(seg)
            j += 32
        lit.clear()

    htab: dict[bytes, int] = {}
    i = 0
    while i < n:
        if i + 3 <= n:
            key = data[i:i + 3]
            cand = htab.get(key, -1)
            htab[key] = i
            if cand >= 0 and i - cand - 1 < 8192:
                ln = 3
                maxl = min(n - i, 264)
                while ln < maxl and data[cand + ln] == data[i + ln]:
                    ln += 1
                flush_literals()
                off = i - cand - 1
                enc = ln - 2
                if enc < 7:
                    out.append((enc << 5) | (off >> 8))
                else:
                    out.append((7 << 5) | (off >> 8))
                    out.append(enc - 7)
                out.append(off & 0xFF)
                i += ln
                continue
        lit.append(data[i])
        i += 1
    flush_literals()
    return bytes(out)


def _decode_chunk(raw: bytes, filters: list, mask: int) -> bytes:
    """Invert the filter pipeline for one chunk (reverse order; a set
    bit i in the chunk's filter mask means filter i was skipped)."""
    import zlib

    for idx in range(len(filters) - 1, -1, -1):
        if mask & (1 << idx):
            continue
        fid, cdata = filters[idx][0], filters[idx][3]
        if fid == _F_DEFLATE:
            raw = zlib.decompress(raw)
        elif fid == _F_LZF:
            raw = _lzf_decompress(raw)
        elif fid == _F_SHUFFLE:
            es = cdata[0] if cdata else 1
            nelem = len(raw) // es if es else 0
            if es > 1 and nelem > 1:
                body, rem = raw[: nelem * es], raw[nelem * es:]
                a = np.frombuffer(body, np.uint8).reshape(es, nelem)
                raw = a.T.tobytes() + rem
        elif fid == _F_FLETCHER32:
            body, stored = raw[:-4], _u(raw, len(raw) - 4, 4)
            if _fletcher32(body) != stored:
                raise ValueError(
                    f"fletcher32 checksum mismatch on a {len(body)}-byte "
                    "chunk (corrupt file?)"
                )
            raw = body
        else:  # unreachable: probe refuses unsupported filters by name
            raise NotImplementedError(f"filter id {fid} unsupported")
    return raw


def _encode_chunk(raw: bytes, filters: list) -> tuple[bytes, int]:
    """Apply the filter pipeline forward for one chunk; returns
    (bytes, filter_mask). deflate is written with the OPTIONAL flag,
    so an incompressible chunk is stored raw with its mask bit set —
    the libhdf5 behavior."""
    import zlib

    mask = 0
    for idx, (fid, _name, flags, cdata) in enumerate(filters):
        if fid == _F_DEFLATE:
            level = cdata[0] if cdata else 4
            comp = zlib.compress(raw, level)
            if len(comp) >= len(raw) and (flags & 0x1):
                mask |= 1 << idx
            else:
                raw = comp
        elif fid == _F_LZF:
            comp = _lzf_compress(raw)
            if len(comp) >= len(raw) and (flags & 0x1):
                mask |= 1 << idx
            else:
                raw = comp
        elif fid == _F_SHUFFLE:
            es = cdata[0] if cdata else 1
            nelem = len(raw) // es if es else 0
            if es > 1 and nelem > 1:
                body, rem = raw[: nelem * es], raw[nelem * es:]
                a = np.frombuffer(body, np.uint8).reshape(nelem, es)
                raw = a.T.tobytes() + rem
        elif fid == _F_FLETCHER32:
            raw = raw + _fletcher32(raw).to_bytes(4, "little")
        else:
            raise NotImplementedError(f"filter id {fid} unsupported")
    return raw, mask


def _decode_idx_elmt(eb: bytes, filtered: bool, csl: int):
    """Decode one fixed/extensible-array chunk element: address-only
    for client 0 (non-filtered; stored size is the nominal chunk size),
    address + stored size + filter mask for client 1. An undefined
    address means the chunk was never allocated (reads as fill)."""
    a = _u(eb, 0, 8)
    if a == _UNDEF:
        return None
    if filtered:
        return a, _u(eb, 8, csl), _u(eb, 8 + csl, 4)
    return a, None, 0


def _limit_enc_size(n: int) -> int:
    """Minimum bytes to encode n (H5VM_limit_enc_size): the width of
    the variable-size record-count fields in v2 B-tree child
    pointers."""
    return max(1, (n.bit_length() + 7) // 8)


def _ea_geometry(mbits: int, ielmts: int, dmin: int, smin: int):
    """Extensible-array block geometry (H5EAhdr/H5EAiblock): super
    block u holds ndblks[u] = 2^(u//2) data blocks of dnel[u] =
    dmin * 2^((u+1)//2) elements; element indices start at ielmts (the
    index-block-resident elements); the index block directly addresses
    the data blocks of the first 2*log2(smin) super blocks. Shared by
    the reader and the fixture writer so the two cannot drift.
    Returns (nsblks, ndblks, dnel, start_idx, start_dblk, ibl_nsblks)."""
    nsblks = 1 + mbits - (dmin.bit_length() - 1)
    ndblks = [1 << (u // 2) for u in range(nsblks)]
    dnel = [dmin << ((u + 1) // 2) for u in range(nsblks)]
    start_idx, start_dblk = [], []
    si, sd = ielmts, 0
    for u in range(nsblks):
        start_idx.append(si)
        start_dblk.append(sd)
        si += ndblks[u] * dnel[u]
        sd += ndblks[u]
    ibl_nsblks = min(2 * (smin.bit_length() - 1), nsblks)
    return nsblks, ndblks, dnel, start_idx, start_dblk, ibl_nsblks


def _bt2_node_info(node_size: int, rec_size: int, depth: int):
    """Per-depth v2 B-tree node capacities (H5B2hdr node_info): leaf
    capacity from the 10-byte fixed overhead (sig+version+type+
    checksum); internal capacity accounts for the per-child pointer of
    8 address bytes + a record count sized for the child's capacity +
    (above depth 1) a cumulative count sized for the child subtree.
    Returns (max_nrec, count_size, cum_count_size) lists indexed by
    depth."""
    max_nrec = [(node_size - 10) // rec_size]
    cum = [max_nrec[0]]
    sz = [_limit_enc_size(max_nrec[0])]
    cum_sz = [0]
    for d in range(1, depth + 1):
        ptr = 8 + sz[d - 1] + cum_sz[d - 1]
        cap = (node_size - (10 + ptr)) // (rec_size + ptr)
        if cap < 1:
            raise ValueError(
                f"v2 B-tree node size {node_size} cannot hold an "
                f"internal record at depth {d}"
            )
        max_nrec.append(cap)
        cum.append((cap + 1) * cum[d - 1] + cap)
        sz.append(_limit_enc_size(cap))
        cum_sz.append(_limit_enc_size(cum[d]))
    return max_nrec, sz, cum_sz


@dataclass
class Hdf5Dataset:
    """Metadata of one contiguous dataset: everything an executor needs
    to pread its row range without re-touching the metadata."""

    name: str
    shape: tuple[int, ...]
    dtype: str            # numpy dtype string, e.g. '<f4'
    data_offset: int      # contiguous: absolute file offset; chunked: -1
    data_size: int        # contiguous: stored bytes; chunked: logical bytes
    attrs: dict = field(default_factory=dict)
    # chunked layout only:
    chunk_shape: tuple[int, ...] | None = None
    # [(coords, file_offset, stored_bytes, filter_mask)] — coords are
    # the chunk's start indices in dataset space (element dim stripped)
    chunks: list = field(default_factory=list)
    # [(filter_id, name, flags, client_data)] in pipeline order
    filters: list = field(default_factory=list)
    # raw bytes of one element's defined fill value (message 0x0005);
    # None = undefined -> the library default of all-zeros
    fill: bytes | None = None

    @property
    def nrows(self) -> int:
        return self.shape[0] if self.shape else 1

    @property
    def row_bytes(self) -> int:
        per = np.dtype(self.dtype).itemsize
        for d in self.shape[1:]:
            per *= d
        return per


class _Parser:
    def __init__(self, path: str):
        self.path = path
        self.f = open(path, "rb")
        self.datasets: dict[str, Hdf5Dataset] = {}

    # ------------------------------------------------------ primitives

    def _read(self, off: int, n: int) -> bytes:
        self.f.seek(off)
        b = self.f.read(n)
        if len(b) < n:
            raise ValueError(
                f"{self.path}: truncated read at offset {off} "
                f"({len(b)}/{n} bytes)"
            )
        return b

    # ------------------------------------------------------ superblock

    def parse(self) -> dict[str, Hdf5Dataset]:
        head = self._read(0, 8)
        if head != _SIG:
            raise ValueError(
                f"{self.path}: not an HDF5 file (bad signature; superblocks "
                "at non-zero offsets are not supported)"
            )
        ver = self._read(8, 1)[0]
        if ver in (0, 1):
            b = self._read(8, 24)
            so, sl = b[5], b[6]
            if (so, sl) != (8, 8):
                raise NotImplementedError(
                    f"{self.path}: size_of_offsets/lengths {so}/{sl} "
                    "unsupported (only 8/8, the h5py default)"
                )
            # fixed fields (8) + btree k's/flags (8) [+4 v1] + 4 addrs,
            # then the root group symbol table entry
            entry_off = 16 + (4 if ver == 1 else 0) + 8 * 4
            e = self._read(8 + entry_off, 40)
            root_hdr = _u(e, 8, 8)
            self._object_header(root_hdr, prefix="")
        elif ver in (2, 3):
            b = self._read(8, 40)
            so, sl = b[1], b[2]
            if (so, sl) != (8, 8):
                raise NotImplementedError(
                    f"{self.path}: size_of_offsets/lengths {so}/{sl} "
                    "unsupported"
                )
            root_hdr = _u(b, 28, 8)
            self._object_header(root_hdr, prefix="")
        else:
            raise NotImplementedError(
                f"{self.path}: superblock version {ver} unsupported"
            )
        return self.datasets

    # --------------------------------------------------- object headers

    def _object_header(self, addr: int, prefix: str) -> None:
        if self._read(addr, 4) == b"OHDR":
            msgs = self._ohdr_v2_messages(addr)
        else:
            msgs = self._ohdr_v1_messages(addr)
        self._interpret(msgs, prefix)

    def _ohdr_v1_messages(self, addr: int) -> list[tuple[int, bytes]]:
        hdr = self._read(addr, 16)
        if hdr[0] != 1:
            raise NotImplementedError(
                f"{self.path}: object header version {hdr[0]} at {addr} "
                "unsupported"
            )
        nmsgs = _u(hdr, 2, 2)
        blocks = [(addr + 16, _u(hdr, 8, 4))]
        msgs: list[tuple[int, bytes]] = []
        while blocks and len(msgs) < nmsgs:
            off, length = blocks.pop(0)
            b = self._read(off, length)
            p = 0
            while p + 8 <= length and len(msgs) < nmsgs:
                mtype, msize = _u(b, p, 2), _u(b, p + 2, 2)
                body = b[p + 8:p + 8 + msize]
                p += 8 + msize
                if mtype == 0x0010:  # continuation
                    blocks.append((_u(body, 0, 8), _u(body, 8, 8)))
                else:
                    msgs.append((mtype, body))
        return msgs

    def _ohdr_v2_messages(self, addr: int) -> list[tuple[int, bytes]]:
        b = self._read(addr, 16)
        flags = b[5]
        p = 6
        if flags & 0x20:
            p += 16
        if flags & 0x10:
            p += 4
        csize_bytes = 1 << (flags & 0x3)
        chunk0 = _u(self._read(addr + p, csize_bytes), 0, csize_bytes)
        p += csize_bytes
        # The stored chunk-0 size covers messages + gap ONLY — libhdf5
        # counts the prefix and the trailing 4-byte checksum separately
        # (H5O_SIZEOF_HDR in H5Ocache.c). The pre-r16 reader treated it
        # as checksum-inclusive, silently dropping a trailing message
        # shorter than 8 bytes. The checksum spans prefix + messages.
        stored = _u(self._read(addr + p + chunk0, 4), 0, 4)
        if _lookup3(self._read(addr, p + chunk0)) != stored:
            raise ValueError(
                f"{self.path}: bad checksum on v2 object header at {addr}"
            )
        blocks = [(addr + p, chunk0)]
        msgs: list[tuple[int, bytes]] = []
        track = bool(flags & 0x04)
        while blocks:
            off, length = blocks.pop(0)
            b = self._read(off, length)
            p2, end = 0, length
            while p2 + 4 <= end:
                mtype, msize, _mf = b[p2], _u(b, p2 + 1, 2), b[p2 + 3]
                p2 += 4 + (2 if track else 0)
                if p2 + msize > end:
                    raise ValueError(
                        f"{self.path}: v2 object header message at "
                        f"{off + p2} overruns its chunk (corrupt size?)"
                    )
                body = b[p2:p2 + msize]
                p2 += msize
                if mtype == 0x10:
                    # v2 continuation block: OCHK sig + msgs + checksum;
                    # the message-carrying span excludes both
                    coff, clen = _u(body, 0, 8), _u(body, 8, 8)
                    blk = self._read(coff, clen)
                    if blk[:4] != b"OCHK":
                        raise ValueError(
                            f"{self.path}: bad continuation block at {coff}"
                        )
                    if _lookup3(blk[:-4]) != _u(blk, clen - 4, 4):
                        raise ValueError(
                            f"{self.path}: bad checksum on continuation "
                            f"block at {coff}"
                        )
                    blocks.append((coff + 4, clen - 8))
                elif mtype != 0:
                    msgs.append((mtype, body))
        return msgs

    def _checksummed(self, off: int, n: int, what: str) -> bytes:
        """Read `n` bytes plus the trailing 4-byte lookup3 checksum that
        every v2+ metadata block carries, verify, and return the body."""
        b = self._read(off, n + 4)
        if _lookup3(b[:n]) != _u(b, n, 4):
            raise ValueError(
                f"{self.path}: bad checksum on {what} at offset {off}"
            )
        return b[:n]

    # ------------------------------------------------- message walkers

    def _interpret(self, msgs: list[tuple[int, bytes]], prefix: str) -> None:
        by_type: dict[int, list[bytes]] = {}
        for t, body in msgs:
            by_type.setdefault(t, []).append(body)

        if 0x0011 in by_type:  # old-style group
            body = by_type[0x0011][0]
            self._symbol_table(_u(body, 0, 8), _u(body, 8, 8), prefix)
            return
        if 0x0006 in by_type:  # new-style group, compact links
            for body in by_type[0x0006]:
                name, child = self._link_message(body)
                if child is not None:
                    self._object_header(child, f"{prefix}{name}/")
            return
        if 0x0002 in by_type and 0x0008 not in by_type:
            # new-style group, DENSE links (fractal heap + name index).
            # Pre-r16 this fell through to the empty-group branch — a
            # silent misread of every dataset in such a group.
            self._dense_links(by_type[0x0002][0], prefix)
            return
        if 0x0001 in by_type and 0x0008 in by_type:  # dataset
            name = prefix.rstrip("/") or "/"
            shape, maxshape = self._dataspace(by_type[0x0001][0])
            dtype = self._datatype(by_type[0x0003][0], name)
            lay = self._layout(by_type[0x0008][0], name)
            filters = (
                self._pipeline(by_type[0x000B][0], name)
                if 0x000B in by_type else []
            )
            fill = (
                self._fill_value(by_type[0x0005][0], name)
                if 0x0005 in by_type else None
            )
            attrs = {}
            for abody in by_type.get(0x000C, []):
                try:
                    k, v = self._attribute(abody)
                    attrs[k] = v
                except Exception:  # tolerated: attrs are advisory
                    pass
            itemsize = np.dtype(dtype).itemsize
            n_elem = 1
            for dd in shape:
                n_elem *= dd
            if lay[0] == "contiguous":
                if filters:
                    # filters are only legal on chunked layouts; a
                    # contiguous dataset carrying a pipeline message
                    # must not be read as raw bytes silently
                    raise ValueError(
                        f"{self.path}:{name}: filter pipeline present "
                        "on a contiguous layout (corrupt file?)"
                    )
                _, off, size = lay
                self.datasets[name] = Hdf5Dataset(
                    name=name, shape=shape, dtype=dtype,
                    data_offset=off, data_size=size, attrs=attrs,
                )
            else:
                cdims = lay[2]
                chunk_shape, esize = tuple(cdims[:-1]), cdims[-1]
                if len(chunk_shape) != len(shape) or esize != itemsize:
                    raise ValueError(
                        f"{self.path}:{name}: chunk dims {cdims} do not "
                        f"match shape {shape} x itemsize {itemsize}"
                    )
                if lay[0] == "chunked":
                    chunks = self._chunk_btree(lay[1], rank=len(shape))
                else:
                    chunks = self._chunks_v4(
                        lay[1], name, shape, maxshape, chunk_shape,
                        itemsize, filters,
                    )
                # Every chunk coordinate must sit on the chunk grid and
                # inside the dataset shape: the readers assemble output
                # by looking chunks up AT grid positions (e.g.
                # _read_chunked's by_row.get over range(0, rows, cr)),
                # so an unaligned/out-of-range coord from a corrupt or
                # non-canonical B-tree would otherwise be silently
                # dropped and read back as fill — violating the
                # module's never-a-silent-misread contract (r11 ADVICE).
                for coords, _off, _nb, _mask in chunks:
                    if any(
                        cs == 0 or c % cs != 0 or c >= d
                        for c, cs, d in zip(coords, chunk_shape, shape)
                    ):
                        raise ValueError(
                            f"{self.path}:{name}: chunk coordinate "
                            f"{coords} is not grid-aligned to chunk "
                            f"shape {chunk_shape} within dataset shape "
                            f"{shape} (corrupt chunk B-tree?)"
                        )
                self.datasets[name] = Hdf5Dataset(
                    name=name, shape=shape, dtype=dtype,
                    data_offset=-1, data_size=n_elem * itemsize,
                    attrs=attrs, chunk_shape=chunk_shape, chunks=chunks,
                    filters=filters, fill=fill,
                )
        # else: group with only link-info/empty — nothing to record

    def _symbol_table(self, btree_addr: int, heap_addr: int,
                      prefix: str) -> None:
        hb = self._read(heap_addr, 32)
        if hb[:4] != b"HEAP":
            raise ValueError(f"{self.path}: bad local heap at {heap_addr}")
        heap_size = _u(hb, 8, 8)
        heap_data = _u(hb, 24, 8)
        # read the whole data segment once (KBs): names near EOF would
        # make a fixed-width 256-byte read fail on a valid file
        heap_bytes = self._read(heap_data, heap_size)

        def name_at(offset: int) -> str:
            if offset >= heap_size:
                raise ValueError(
                    f"{self.path}: link name offset {offset} outside the "
                    f"{heap_size}-byte local heap"
                )
            name, sep, _ = heap_bytes[offset:].partition(b"\x00")
            if not sep:
                raise ValueError(
                    f"{self.path}: unterminated link name at heap offset "
                    f"{offset}"
                )
            return name.decode("utf-8")

        def walk_btree(addr: int) -> None:
            nb = self._read(addr, 24)
            if nb[:4] != b"TREE":
                raise ValueError(f"{self.path}: bad B-tree node at {addr}")
            level, used = nb[5], _u(nb, 6, 2)
            # keys/children: key0, child0, key1, ..., childN-1, keyN
            body = self._read(addr + 24, (2 * used + 1) * 8)
            children = [_u(body, 8 + i * 16, 8) for i in range(used)]
            for child in children:
                if level > 0:
                    walk_btree(child)
                else:
                    sb = self._read(child, 8)
                    if sb[:4] != b"SNOD":
                        raise ValueError(
                            f"{self.path}: bad symbol node at {child}"
                        )
                    nsym = _u(sb, 6, 2)
                    eb = self._read(child + 8, nsym * 40)
                    for i in range(nsym):
                        noff = _u(eb, i * 40, 8)
                        ohdr = _u(eb, i * 40 + 8, 8)
                        self._object_header(
                            ohdr, f"{prefix}{name_at(noff)}/"
                        )

        walk_btree(btree_addr)

    def _link_message(self, body: bytes) -> tuple[str, int | None]:
        ver, flags = body[0], body[1]
        p = 2
        ltype = 0
        if flags & 0x08:
            ltype = body[p]; p += 1
        if flags & 0x04:
            p += 8
        if flags & 0x10:
            p += 1
        nsize = 1 << (flags & 0x3)
        nlen = _u(body, p, nsize); p += nsize
        name = body[p:p + nlen].decode("utf-8"); p += nlen
        if ltype != 0:  # soft/external links carry no object header
            return name, None
        return name, _u(body, p, 8)

    # ----------------------------------------------- dataset components

    def _dataspace(
        self, body: bytes
    ) -> tuple[tuple[int, ...], tuple[int, ...]]:
        """Returns (dims, maxdims). maxdims entries of _UNDEF mean
        unlimited; when the message stores no max dimensions (flags bit
        0 clear) maxdims == dims. The v4 chunk indexes linearize the
        chunk grid over the MAX dimensions (H5Dfarray/H5Dearray use
        max_down_chunks), so maxdims is load-bearing there."""
        ver, rank, flags = body[0], body[1], body[2]
        p = 8 if ver == 1 else 4
        dims = tuple(_u(body, p + i * 8, 8) for i in range(rank))
        if flags & 0x1:
            q = p + rank * 8
            maxdims = tuple(_u(body, q + i * 8, 8) for i in range(rank))
        else:
            maxdims = dims
        return dims, maxdims

    def _datatype(self, body: bytes, name: str) -> str:
        cls, size = body[0] & 0x0F, _u(body, 4, 4)
        bits0 = body[1]
        order = ">" if bits0 & 0x1 else "<"
        if cls == 0:  # fixed-point
            kind = "i" if bits0 & 0x08 else "u"
        elif cls == 1:  # IEEE float
            kind = "f"
        else:
            raise NotImplementedError(
                f"{self.path}:{name}: datatype class {cls} unsupported "
                "(only fixed-point and IEEE float)"
            )
        if size not in (1, 2, 4, 8):
            raise NotImplementedError(
                f"{self.path}:{name}: datatype size {size} unsupported"
            )
        return f"{order}{kind}{size}"

    def _layout(self, body: bytes, name: str) -> tuple:
        ver = body[0]
        if ver not in (3, 4):
            raise NotImplementedError(
                f"{self.path}:{name}: data layout message version {ver} "
                "unsupported (only v3 and v4)"
            )
        lclass = body[1]
        if lclass == 1:  # contiguous (same field layout in v3 and v4)
            addr, size = _u(body, 2, 8), _u(body, 10, 8)
            if addr == _UNDEF:
                raise ValueError(f"{self.path}:{name}: data not allocated")
            return "contiguous", addr, size
        if lclass == 2 and ver == 3:  # chunked: v1 B-tree index
            ndims = body[2]  # dataset rank + 1 (trailing element dim)
            btree_addr = _u(body, 3, 8)
            cdims = tuple(_u(body, 11 + i * 4, 4) for i in range(ndims))
            return "chunked", btree_addr, cdims
        if lclass == 2:  # version 4 chunked: typed chunk index
            return self._layout_v4_chunked(body, name)
        raise NotImplementedError(
            f"{self.path}:{name}: layout class "
            f"{ {0: 'compact'}.get(lclass, lclass) } unsupported "
            "(only contiguous and chunked)"
        )

    def _layout_v4_chunked(self, body: bytes, name: str) -> tuple:
        """Version 4 data layout message, class 2 (spec IV.A.2.i; the
        'latest' libver form): flags, variable-width chunk dims (rank+1,
        trailing element size), a chunk index type byte, index-specific
        creation parameters, and the index address. Index types
        (H5D_chunk_index_t): 1 single chunk, 2 implicit, 3 fixed array,
        4 extensible array, 5 version-2 B-tree."""
        flags = body[2]
        ndims = body[3]
        enc = body[4]
        if enc not in (1, 2, 4, 8):
            raise ValueError(
                f"{self.path}:{name}: bad chunk-dimension encoding size "
                f"{enc} in v4 layout message"
            )
        p = 5
        cdims = tuple(_u(body, p + i * enc, enc) for i in range(ndims))
        p += ndims * enc
        itype = body[p]
        p += 1
        info: dict = {"flags": flags, "type": itype}
        if itype == 1:  # single chunk
            if flags & 0x02:  # SINGLE_INDEX_WITH_FILTER
                info["filt_size"] = _u(body, p, 8)
                info["filt_mask"] = _u(body, p + 8, 4)
                p += 12
        elif itype == 2:  # implicit
            pass
        elif itype == 3:  # fixed array
            info["page_bits"] = body[p]
            p += 1
        elif itype == 4:  # extensible array
            (
                info["max_nelmts_bits"],
                info["idx_blk_elmts"],
                info["sup_blk_min_data_ptrs"],
                info["data_blk_min_elmts"],
                info["page_nelmts_bits"],
            ) = body[p:p + 5]
            p += 5
        elif itype == 5:  # version 2 B-tree
            info["node_size"] = _u(body, p, 4)
            info["split"], info["merge"] = body[p + 4], body[p + 5]
            p += 6
        else:
            raise NotImplementedError(
                f"{self.path}:{name}: v4 chunk index type {itype} "
                "unsupported (known types: 1 single, 2 implicit, "
                "3 fixed array, 4 extensible array, 5 v2 B-tree)"
            )
        info["addr"] = _u(body, p, 8)
        return "chunked4", info, cdims

    def _pipeline(self, body: bytes, name: str) -> list:
        """Filter pipeline message (0x000B), v1/v2: [(id, name, flags,
        client_data)] in pipeline order. Refuses filters this module
        cannot invert BY NAME — never a silent misread."""
        ver, nf = body[0], body[1]
        if ver not in (1, 2):
            raise NotImplementedError(
                f"{self.path}:{name}: filter pipeline message version "
                f"{ver} unsupported"
            )
        p = 8 if ver == 1 else 2
        filters = []
        for _ in range(nf):
            fid = _u(body, p, 2); p += 2
            if ver == 1 or fid >= 256:
                nlen = _u(body, p, 2); p += 2
            else:
                nlen = 0
            flags, ncd = _u(body, p, 2), _u(body, p + 2, 2)
            p += 4
            fname = body[p:p + nlen].split(b"\x00")[0].decode(
                "utf-8", "replace"
            )
            p += nlen
            cdata = tuple(_u(body, p + 4 * i, 4) for i in range(ncd))
            p += 4 * ncd
            if ver == 1 and ncd % 2:
                p += 4  # client data padded to an 8-byte multiple
            if fid not in (_F_DEFLATE, _F_SHUFFLE, _F_FLETCHER32, _F_LZF):
                label = fname or _FILTER_NAMES.get(fid, f"id {fid}")
                raise NotImplementedError(
                    f"{self.path}:{name}: filter '{label}' (id {fid}) "
                    "unsupported (only deflate/lzf/shuffle/fletcher32; "
                    "re-export with compression='gzip')"
                )
            filters.append((fid, fname, flags, cdata))
        return filters

    def _fill_value(self, body: bytes, name: str) -> bytes | None:
        """Fill value message (0x0005), v1/v2/v3: the element bytes a
        missing chunk must read as, or None when undefined (-> the
        library default of all zeros). Ignoring a DEFINED non-zero fill
        would be a silent misread on sparse chunked files."""
        ver = body[0]
        if ver in (1, 2):
            defined = body[3]
            if ver == 1 or defined == 1:
                size = _u(body, 4, 4)
                return bytes(body[8:8 + size]) if size else None
            return None
        if ver == 3:
            flags = body[1]
            if flags & 0x20:  # fill value defined
                size = _u(body, 2, 4)
                return bytes(body[6:6 + size]) if size else None
            return None
        raise NotImplementedError(
            f"{self.path}:{name}: fill value message version {ver} "
            "unsupported"
        )

    def _chunk_btree(self, addr: int, rank: int) -> list:
        """Walk a v1 B-tree of raw-data chunks (node type 1): returns
        [(coords, file_offset, stored_bytes, filter_mask)] for every
        allocated chunk. Keys carry rank+1 offsets (trailing element
        dim, always 0 — stripped). Driver-side: KBs per thousand
        chunks."""
        key_size = 8 + 8 * (rank + 1)
        out: list = []
        if addr == _UNDEF:
            return out  # no chunk written yet: all-fill dataset

        def walk(a: int) -> None:
            nb = self._read(a, 24)
            if nb[:4] != b"TREE":
                raise ValueError(
                    f"{self.path}: bad chunk B-tree node at {a}"
                )
            if nb[4] != 1:
                raise ValueError(
                    f"{self.path}: B-tree node at {a} has type {nb[4]}, "
                    "expected 1 (raw data chunks)"
                )
            level, used = nb[5], _u(nb, 6, 2)
            body = self._read(a + 24, used * (key_size + 8) + key_size)
            for i in range(used):
                k = i * (key_size + 8)
                nbytes, mask = _u(body, k, 4), _u(body, k + 4, 4)
                coords = tuple(
                    _u(body, k + 8 + j * 8, 8) for j in range(rank)
                )
                child = _u(body, k + key_size, 8)
                if level > 0:
                    walk(child)
                else:
                    out.append((coords, child, nbytes, mask))

        walk(addr)
        return out

    # ------------------------------------------- v4 chunk indexes (r16)
    #
    # The five typed chunk indexes of the version-4 data layout message
    # (the 'latest'-libver form libhdf5 writes; reference parity:
    # rs/index_writer/src/input/hdf5.rs reads ANY libhdf5 file, so
    # files written with h5py libver='latest' must not be refused).
    # All structures below are implemented from the public HDF5 File
    # Format Specification v3.0: III.K fixed array, III.J extensible
    # array, III.A.2 v2 B-tree; every block carries a Jenkins-lookup3
    # checksum which this reader VERIFIES (corrupt block -> ValueError,
    # never a silent misread). Chunk grids are linearized over the MAX
    # dimensions with any unlimited dimension varying slowest — the
    # H5Dfarray/H5Dearray max_down_chunks + swizzle convention.

    def _chunks_v4(self, info: dict, name: str, shape, maxshape,
                   chunk_shape, itemsize: int, filters: list) -> list:
        import itertools

        rank = len(shape)
        itype = info["type"]
        filtered = bool(filters)
        if any(c == 0 for c in chunk_shape):
            raise ValueError(
                f"{self.path}:{name}: zero-length chunk dimension in "
                f"{chunk_shape}"
            )
        nominal = itemsize
        for c in chunk_shape:
            nominal *= c
        unlim = [i for i in range(rank) if maxshape[i] == _UNDEF]
        if itype in (1, 2, 3) and unlim:
            raise ValueError(
                f"{self.path}:{name}: v4 chunk index type {itype} with "
                "an unlimited dimension (corrupt layout: single/implicit"
                "/fixed-array indexes require fixed max dimensions)"
            )
        if itype == 4 and len(unlim) > 1:
            raise ValueError(
                f"{self.path}:{name}: extensible array index with "
                f"{len(unlim)} unlimited dimensions (at most one legal)"
            )
        cur = [-(-s // c) for s, c in zip(shape, chunk_shape)]
        maxg = [
            cur[i] if maxshape[i] == _UNDEF
            else -(-maxshape[i] // chunk_shape[i])
            for i in range(rank)
        ]
        for i in range(rank):
            if maxshape[i] != _UNDEF and cur[i] > maxg[i]:
                raise ValueError(
                    f"{self.path}:{name}: dataset extent {shape} exceeds "
                    f"max dimensions {maxshape}"
                )
        order = unlim + [i for i in range(rank) if maxshape[i] != _UNDEF]

        def lin(g: tuple) -> int:
            idx = 0
            for d in order:
                idx = idx * maxg[d] + g[d]
            return idx

        flags = info["flags"]
        skip_all = (1 << len(filters)) - 1

        def emask(coords: tuple, stored: int) -> int:
            # flag bit 0 = DONT_FILTER_PARTIAL_BOUND_CHUNKS: partial
            # edge chunks are stored raw; a mask with every filter bit
            # set makes _decode_chunk skip the whole pipeline
            if flags & 0x01 and any(
                coords[i] + chunk_shape[i] > shape[i] for i in range(rank)
            ):
                return skip_all
            return stored

        def coords_of(g: tuple) -> tuple:
            return tuple(g[i] * chunk_shape[i] for i in range(rank))

        if itype == 1:  # single chunk
            if any(c > 1 for c in cur):
                raise ValueError(
                    f"{self.path}:{name}: single-chunk index but the "
                    f"extent spans {cur} chunks"
                )
            addr = info["addr"]
            if addr == _UNDEF:
                return []
            if "filt_size" in info:
                size, mask = info["filt_size"], info["filt_mask"]
            elif filtered:
                raise ValueError(
                    f"{self.path}:{name}: filter pipeline present but "
                    "the single-chunk layout lacks filtered-chunk fields"
                )
            else:
                size, mask = nominal, 0
            zero = tuple(0 for _ in range(rank))
            return [(zero, addr, size, emask(zero, mask))]

        grid = [tuple(g)
                for g in itertools.product(*(range(c) for c in cur))]

        if itype == 2:  # implicit: nominal-size chunks at base + idx*sz
            if filtered:
                raise ValueError(
                    f"{self.path}:{name}: implicit chunk index with a "
                    "filter pipeline (corrupt layout)"
                )
            base = info["addr"]
            if base == _UNDEF:
                return []
            return [
                (coords_of(g), base + lin(g) * nominal, nominal, 0)
                for g in grid
            ]

        if itype == 5:  # version 2 B-tree
            entries = self._bt2_chunks(
                info, name, rank, chunk_shape, filtered, nominal
            )
            return [
                (c, a, s, emask(c, m)) for c, a, s, m in entries
            ]

        if itype == 3:  # fixed array
            getter, cap = self._fa_elements(info, name, filtered)
        else:  # itype == 4: extensible array
            getter = self._ea_elements(info, name, filtered)
            cap = 1 << min(info["max_nelmts_bits"], 62)
        out = []
        for g in grid:
            idx = lin(g)
            if idx >= cap:
                raise ValueError(
                    f"{self.path}:{name}: chunk grid index {idx} outside "
                    f"the index capacity {cap}"
                )
            e = getter(idx)
            if e is None:
                continue  # unallocated chunk: reads as fill
            a, s, m = e
            c = coords_of(g)
            out.append((c, a, nominal if s is None else s, emask(c, m)))
        return out

    def _fa_elements(self, info: dict, name: str, filtered: bool):
        """Fixed array chunk index (spec III.K): 'FAHD' header + one
        'FADB' data block, paged when the capacity exceeds one page.
        Returns (getter, capacity) with getter(idx) ->
        (chunk_addr, stored_bytes|None, filter_mask) | None."""
        hdr_addr = info["addr"]
        if hdr_addr == _UNDEF:
            return (lambda i: None), 1 << 62
        h = self._checksummed(hdr_addr, 24, "fixed array header")
        if h[:4] != b"FAHD":
            raise ValueError(
                f"{self.path}:{name}: bad fixed array header signature "
                f"at {hdr_addr}"
            )
        if h[4] != 0:
            raise NotImplementedError(
                f"{self.path}:{name}: fixed array version {h[4]} "
                "unsupported"
            )
        client = h[5]
        if client != (1 if filtered else 0):
            raise ValueError(
                f"{self.path}:{name}: fixed array client id {client} "
                f"does not match the filter pipeline (expected "
                f"{1 if filtered else 0})"
            )
        entry, page_bits = h[6], h[7]
        maxn = _u(h, 8, 8)
        dblk = _u(h, 16, 8)
        csl = entry - 12
        if filtered and not (1 <= csl <= 8):
            raise ValueError(
                f"{self.path}:{name}: fixed array entry size {entry} "
                "invalid for filtered chunks"
            )
        if not filtered and entry != 8:
            raise ValueError(
                f"{self.path}:{name}: fixed array entry size {entry} "
                "invalid for non-filtered chunks (expected 8)"
            )
        if dblk == _UNDEF or maxn == 0:
            return (lambda i: None), maxn
        page_n = 1 << page_bits
        pre = self._read(dblk, 14)
        if pre[:4] != b"FADB":
            raise ValueError(
                f"{self.path}:{name}: bad fixed array data block "
                f"signature at {dblk}"
            )
        if pre[4] != 0:
            raise NotImplementedError(
                f"{self.path}:{name}: fixed array data block version "
                f"{pre[4]} unsupported"
            )
        if pre[5] != client or _u(pre, 6, 8) != hdr_addr:
            raise ValueError(
                f"{self.path}:{name}: fixed array data block at {dblk} "
                "does not back-point to its header"
            )
        if maxn <= page_n:  # compact: elements inline in the data block
            body = self._checksummed(
                dblk, 14 + maxn * entry, "fixed array data block"
            )
            elems = body[14:]

            def getter(i: int):
                return _decode_idx_elmt(
                    elems[i * entry:(i + 1) * entry], filtered, csl
                )

            return getter, maxn
        npages = -(-maxn // page_n)
        bl = (npages + 7) // 8
        head = self._checksummed(
            dblk, 14 + bl, "fixed array data block"
        )
        bitmap = head[14:]
        pages_base = dblk + 14 + bl + 4
        cache: dict[int, bytes] = {}

        def getter(i: int):
            pg, within = divmod(i, page_n)
            # page-init bitmap, MSB-first within each byte (H5VM_bit_get)
            if not (bitmap[pg // 8] >> (7 - pg % 8)) & 1:
                return None  # page never initialized: all unallocated
            if pg not in cache:
                pn = min(page_n, maxn - pg * page_n)
                off = pages_base + pg * (page_n * entry + 4)
                cache[pg] = self._checksummed(
                    off, pn * entry, f"fixed array page {pg}"
                )
            eb = cache[pg]
            return _decode_idx_elmt(
                eb[within * entry:(within + 1) * entry], filtered, csl
            )

        return getter, maxn

    def _ea_elements(self, info: dict, name: str, filtered: bool):
        """Extensible array chunk index (spec III.J): 'EAHD' header,
        'EAIB' index block holding the first idx_blk_elmts elements plus
        direct data-block pointers for the first super blocks, then
        'EASB' secondary (super) blocks of 'EADB' data blocks, paged
        past 2^page_nelmts_bits elements. Geometry follows the
        published extensible-array scheme (H5EAhdr/H5EAiblock): super
        block u holds 2^(u//2) data blocks of min_elmts*2^((u+1)//2)
        elements; the index block covers the first 2*log2(min_ptrs)
        super blocks directly. Every stored block offset is validated
        against the computed geometry — a divergent file raises rather
        than misreads."""
        hdr_addr = info["addr"]
        if hdr_addr == _UNDEF:
            return lambda i: None
        h = self._checksummed(hdr_addr, 68, "extensible array header")
        if h[:4] != b"EAHD":
            raise ValueError(
                f"{self.path}:{name}: bad extensible array header "
                f"signature at {hdr_addr}"
            )
        if h[4] != 0:
            raise NotImplementedError(
                f"{self.path}:{name}: extensible array version {h[4]} "
                "unsupported"
            )
        client = h[5]
        if client != (1 if filtered else 0):
            raise ValueError(
                f"{self.path}:{name}: extensible array client id "
                f"{client} does not match the filter pipeline"
            )
        esize, mbits, ielmts, dmin, smin, pbits = h[6:12]
        iblk = _u(h, 60, 8)
        csl = esize - 12
        if filtered and not (1 <= csl <= 8):
            raise ValueError(
                f"{self.path}:{name}: extensible array element size "
                f"{esize} invalid for filtered chunks"
            )
        if not filtered and esize != 8:
            raise ValueError(
                f"{self.path}:{name}: extensible array element size "
                f"{esize} invalid for non-filtered chunks (expected 8)"
            )
        for label, v in (("data block min elements", dmin),
                         ("super block min pointers", smin)):
            if v < 2 or v & (v - 1):
                raise ValueError(
                    f"{self.path}:{name}: extensible array {label} {v} "
                    "is not a power of two >= 2"
                )
        if mbits == 0 or mbits > 64 or (1 << pbits) < 1:
            raise ValueError(
                f"{self.path}:{name}: bad extensible array parameters "
                f"(max_nelmts_bits={mbits}, page_bits={pbits})"
            )
        arr_off = (mbits + 7) // 8
        dmin_log = dmin.bit_length() - 1
        if mbits < dmin_log:
            raise ValueError(
                f"{self.path}:{name}: extensible array max_nelmts_bits "
                f"{mbits} smaller than log2(data_blk_min_elmts)"
            )
        (nsblks, ndblks, dnel, start_idx, start_dblk,
         ibl_nsblks) = _ea_geometry(mbits, ielmts, dmin, smin)
        ndblk_addrs = sum(ndblks[:ibl_nsblks])
        nsblk_addrs = nsblks - ibl_nsblks
        page_n = 1 << pbits
        if iblk == _UNDEF:
            return lambda i: None
        ib = self._checksummed(
            iblk,
            14 + ielmts * esize + (ndblk_addrs + nsblk_addrs) * 8,
            "extensible array index block",
        )
        if ib[:4] != b"EAIB":
            raise ValueError(
                f"{self.path}:{name}: bad extensible array index block "
                f"signature at {iblk}"
            )
        if ib[4] != 0 or ib[5] != client or _u(ib, 6, 8) != hdr_addr:
            raise ValueError(
                f"{self.path}:{name}: extensible array index block at "
                f"{iblk} does not match its header"
            )
        ib_elems = ib[14:14 + ielmts * esize]
        da0 = 14 + ielmts * esize
        ib_dblk = [_u(ib, da0 + 8 * i, 8) for i in range(ndblk_addrs)]
        sa0 = da0 + 8 * ndblk_addrs
        ib_sblk = [_u(ib, sa0 + 8 * i, 8) for i in range(nsblk_addrs)]

        sblk_cache: dict[int, tuple | None] = {}
        dblk_cache: dict[int, tuple] = {}
        page_cache: dict[int, bytes] = {}

        def get_sblk(u: int):
            if u in sblk_cache:
                return sblk_cache[u]
            addr = ib_sblk[u - ibl_nsblks]
            if addr == _UNDEF:
                sblk_cache[u] = None
                return None
            nd = ndblks[u]
            dnp = dnel[u] // page_n if dnel[u] > page_n else 0
            bl = ((nd * dnp) + 7) // 8 if dnp else 0
            body = self._checksummed(
                addr, 14 + arr_off + bl + nd * 8,
                f"extensible array secondary block {u}",
            )
            if body[:4] != b"EASB":
                raise ValueError(
                    f"{self.path}:{name}: bad extensible array secondary"
                    f" block signature at {addr}"
                )
            if body[4] != 0 or body[5] != client \
                    or _u(body, 6, 8) != hdr_addr:
                raise ValueError(
                    f"{self.path}:{name}: extensible array secondary "
                    f"block at {addr} does not match its header"
                )
            boff = _u(body, 14, arr_off)
            if boff != start_idx[u]:
                raise ValueError(
                    f"{self.path}:{name}: secondary block {u} stores "
                    f"offset {boff}, geometry expects {start_idx[u]} "
                    "(divergent extensible-array layout)"
                )
            bm = body[14 + arr_off:14 + arr_off + bl]
            addrs = [
                _u(body, 14 + arr_off + bl + 8 * i, 8) for i in range(nd)
            ]
            sblk_cache[u] = (bm, addrs, dnp)
            return sblk_cache[u]

        def get_dblk(addr: int, nel: int, expect_off: int) -> tuple:
            if addr in dblk_cache:
                kind, payload, boff = dblk_cache[addr]
            else:
                paged = nel > page_n
                if paged:
                    body = self._checksummed(
                        addr, 14 + arr_off, "extensible array data block"
                    )
                    kind, payload = "paged", addr + 14 + arr_off + 4
                else:
                    body = self._checksummed(
                        addr, 14 + arr_off + nel * esize,
                        "extensible array data block",
                    )
                    kind, payload = "inline", body[14 + arr_off:]
                if body[:4] != b"EADB":
                    raise ValueError(
                        f"{self.path}:{name}: bad extensible array data "
                        f"block signature at {addr}"
                    )
                if body[4] != 0 or body[5] != client \
                        or _u(body, 6, 8) != hdr_addr:
                    raise ValueError(
                        f"{self.path}:{name}: extensible array data "
                        f"block at {addr} does not match its header"
                    )
                boff = _u(body, 14, arr_off)
                dblk_cache[addr] = (kind, payload, boff)
            if boff != expect_off:
                raise ValueError(
                    f"{self.path}:{name}: data block at {addr} stores "
                    f"offset {boff}, geometry expects {expect_off} "
                    "(divergent extensible-array layout)"
                )
            return kind, payload

        def getter(idx: int):
            if idx < ielmts:
                return _decode_idx_elmt(
                    ib_elems[idx * esize:(idx + 1) * esize], filtered, csl
                )
            u = 0
            while u < nsblks and idx >= start_idx[u] + ndblks[u] * dnel[u]:
                u += 1
            if u >= nsblks:
                raise ValueError(
                    f"{self.path}:{name}: chunk index {idx} beyond the "
                    "extensible array capacity"
                )
            j, e = divmod(idx - start_idx[u], dnel[u])
            if u < ibl_nsblks:
                if dnel[u] > page_n:
                    raise NotImplementedError(
                        f"{self.path}:{name}: paged data block referenced"
                        " directly from the index block (creation "
                        "parameters libhdf5 never emits)"
                    )
                daddr = ib_dblk[start_dblk[u] + j]
                bm = dnp = None
            else:
                sb = get_sblk(u)
                if sb is None:
                    return None
                bm, addrs, dnp = sb
                daddr = addrs[j]
            if daddr == _UNDEF:
                return None
            kind, payload = get_dblk(
                daddr, dnel[u], start_idx[u] + j * dnel[u]
            )
            if kind == "inline":
                return _decode_idx_elmt(
                    payload[e * esize:(e + 1) * esize], filtered, csl
                )
            pg, within = divmod(e, page_n)
            bit = j * dnp + pg
            if not (bm[bit // 8] >> (7 - bit % 8)) & 1:
                return None  # page never initialized
            pkey = payload + pg * (page_n * esize + 4)
            if pkey not in page_cache:
                page_cache[pkey] = self._checksummed(
                    pkey, page_n * esize,
                    f"extensible array data block page {pg}",
                )
            eb = page_cache[pkey]
            return _decode_idx_elmt(
                eb[within * esize:(within + 1) * esize], filtered, csl
            )

        return getter

    def _bt2_records(self, hdr_addr: int, name: str) -> tuple[int, int, list]:
        """Generic version-2 B-tree walk (spec III.A.2): parse the
        'BTHD' header, recurse 'BTIN' internal nodes into 'BTLF'
        leaves, and return (record_type, record_size, raw record
        bytes in tree order). Child pointers carry variable-width
        record counts sized from the per-depth maximum-record
        capacities (H5B2hdr node_info). Shared by the chunk index
        (types 10/11) and the dense-group link-name index (type 5)."""
        h = self._checksummed(hdr_addr, 34, "v2 B-tree header")
        if h[:4] != b"BTHD":
            raise ValueError(
                f"{self.path}:{name}: bad v2 B-tree header signature "
                f"at {hdr_addr}"
            )
        if h[4] != 0:
            raise NotImplementedError(
                f"{self.path}:{name}: v2 B-tree version {h[4]} "
                "unsupported"
            )
        btype = h[5]
        node_size = _u(h, 6, 4)
        rec_size = _u(h, 10, 2)
        depth = _u(h, 12, 2)
        root = _u(h, 16, 8)
        root_nrec = _u(h, 24, 2)
        total = _u(h, 26, 8)
        if root == _UNDEF or total == 0:
            return btype, rec_size, []
        if rec_size < 1 or node_size <= 10 + rec_size:
            raise ValueError(
                f"{self.path}:{name}: v2 B-tree node size {node_size} "
                f"cannot hold record size {rec_size}"
            )
        max_nrec, sz, cum_sz = _bt2_node_info(node_size, rec_size, depth)
        out: list = []

        def walk(addr: int, d: int, nrec: int) -> None:
            if nrec > max_nrec[d]:
                raise ValueError(
                    f"{self.path}:{name}: v2 B-tree node at {addr} "
                    f"claims {nrec} records (> capacity {max_nrec[d]})"
                )
            if d == 0:
                body = self._checksummed(
                    addr, 6 + nrec * rec_size, "v2 B-tree leaf"
                )
                if body[:4] != b"BTLF" or body[5] != btype:
                    raise ValueError(
                        f"{self.path}:{name}: bad v2 B-tree leaf at "
                        f"{addr}"
                    )
                for i in range(nrec):
                    out.append(body[6 + i * rec_size:6 + (i + 1) * rec_size])
                return
            ptr = 8 + sz[d - 1] + (cum_sz[d - 1] if d > 1 else 0)
            body = self._checksummed(
                addr, 6 + nrec * rec_size + (nrec + 1) * ptr,
                "v2 B-tree internal node",
            )
            if body[:4] != b"BTIN" or body[5] != btype:
                raise ValueError(
                    f"{self.path}:{name}: bad v2 B-tree internal node "
                    f"at {addr}"
                )
            base = 6 + nrec * rec_size
            for i in range(nrec + 1):
                q = base + i * ptr
                caddr = _u(body, q, 8)
                cnrec = _u(body, q + 8, sz[d - 1])
                walk(caddr, d - 1, cnrec)
                if i < nrec:
                    out.append(body[6 + i * rec_size:6 + (i + 1) * rec_size])

        walk(root, depth, root_nrec)
        if len(out) != total:
            raise ValueError(
                f"{self.path}:{name}: v2 B-tree header claims {total} "
                f"records, walk found {len(out)}"
            )
        return btype, rec_size, out

    def _bt2_chunks(self, info: dict, name: str, rank: int, chunk_shape,
                    filtered: bool, nominal: int) -> list:
        """Version 2 B-tree chunk index: record type 10 (non-filtered:
        address + scaled offsets) or 11 (filtered: address + stored
        size + filter mask + scaled offsets) over the generic walk."""
        hdr_addr = info["addr"]
        if hdr_addr == _UNDEF:
            return []
        btype, rec_size, recs = self._bt2_records(hdr_addr, name)
        expect = 11 if filtered else 10
        if btype != expect:
            raise ValueError(
                f"{self.path}:{name}: v2 B-tree record type {btype} "
                f"does not match the filter pipeline (expected {expect})"
            )
        if filtered:
            csl = rec_size - 12 - 8 * rank
            if not (1 <= csl <= 8):
                raise ValueError(
                    f"{self.path}:{name}: v2 B-tree record size "
                    f"{rec_size} invalid for filtered rank-{rank} chunks"
                )
        else:
            csl = 0
            if rec_size != 8 + 8 * rank:
                raise ValueError(
                    f"{self.path}:{name}: v2 B-tree record size "
                    f"{rec_size} invalid for rank-{rank} chunks "
                    f"(expected {8 + 8 * rank})"
                )

        def decode(r: bytes) -> tuple:
            a = _u(r, 0, 8)
            if filtered:
                s, m = _u(r, 8, csl), _u(r, 8 + csl, 4)
                q = 12 + csl
            else:
                s, m, q = nominal, 0, 8
            coords = tuple(
                _u(r, q + i * 8, 8) * chunk_shape[i] for i in range(rank)
            )
            if a == _UNDEF:
                raise ValueError(
                    f"{self.path}:{name}: v2 B-tree record with an "
                    "undefined chunk address"
                )
            return coords, a, s, m

        return [decode(r) for r in recs]

    # ------------------------------------------- dense groups (r16)
    #
    # 'Latest'-libver groups whose link count exceeds the compact
    # bound store links DENSELY: link messages live as managed objects
    # in a fractal heap (spec III.G: 'FRHP' header + 'FHDB' direct /
    # 'FHIB' indirect blocks under a doubling table) addressed by a
    # name-index v2 B-tree of type-5 records (hash + heap ID). Before
    # r16 the probe treated such groups as EMPTY — a silent misread of
    # every dataset inside; now they are walked (or refused by name
    # for the huge-object / nested-indirect shapes fixtures can't
    # exercise).

    def _dense_links(self, body: bytes, prefix: str) -> None:
        """Link Info message (0x0002): [max creation index], fractal
        heap address, name-index v2 B-tree address[, creation-order
        B-tree address]. Iterates every link via the name index."""
        if body[0] != 0:
            raise NotImplementedError(
                f"{self.path}: link info message version {body[0]} "
                "unsupported"
            )
        flags = body[1]
        p = 2 + (8 if flags & 0x1 else 0)
        fheap = _u(body, p, 8)
        name_bt2 = _u(body, p + 8, 8)
        if fheap == _UNDEF:
            return  # no dense links stored
        if name_bt2 == _UNDEF:
            raise ValueError(
                f"{self.path}: dense link storage with no name index"
            )
        getter = self._fheap_getter(fheap, prefix or "/")
        btype, rec_size, recs = self._bt2_records(name_bt2, prefix or "/")
        if btype != 5:
            raise ValueError(
                f"{self.path}: dense-link name index has record type "
                f"{btype} (expected 5)"
            )
        if rec_size < 5:
            raise ValueError(
                f"{self.path}: dense-link record size {rec_size} too "
                "small for a heap ID"
            )
        for r in recs:  # record: name hash (4) + heap ID
            blob = getter(r[4:])
            lname, child = self._link_message(blob)
            if child is not None:
                self._object_header(child, f"{prefix}{lname}/")

    def _fheap_getter(self, addr: int, name: str):
        """Fractal heap reader (spec III.G), managed + tiny objects:
        parses the 'FRHP' header and doubling-table geometry, then
        returns getter(heap_id) -> object bytes. Direct blocks are
        verified against their whole-block checksum (computed with the
        checksum field zeroed — the H5HF convention, unlike the
        trailing checksums everywhere else); huge objects and
        nested indirect blocks (heaps beyond width * max_direct rows)
        refuse by name."""
        h = self._checksummed(addr, 142, "fractal heap header")
        if h[:4] != b"FRHP":
            raise ValueError(
                f"{self.path}:{name}: bad fractal heap header signature"
                f" at {addr}"
            )
        if h[4] != 0:
            raise NotImplementedError(
                f"{self.path}:{name}: fractal heap version {h[4]} "
                "unsupported"
            )
        id_len = _u(h, 5, 2)
        filt_len = _u(h, 7, 2)
        flags = h[9]
        if filt_len:
            raise NotImplementedError(
                f"{self.path}:{name}: fractal heap I/O filters "
                "unsupported"
            )
        width = _u(h, 110, 2)
        start_size = _u(h, 112, 8)
        max_direct = _u(h, 120, 8)
        max_heap_bits = _u(h, 128, 2)
        root_addr = _u(h, 132, 8)
        cur_rows = _u(h, 140, 2)
        # amount of ALLOCATED managed space (offset 54): for a
        # root-direct-block heap this IS the root block's size — the
        # root doubles in place (H5HF man_dblock_root_double) before
        # converting to an indirect block, so start_block_size alone
        # cannot size it
        alloc_space = _u(h, 54, 8)
        for label, v in (("table width", width),
                         ("starting block size", start_size),
                         ("maximum direct block size", max_direct)):
            if v < 1 or (label != "table width" and v & (v - 1)):
                raise ValueError(
                    f"{self.path}:{name}: bad fractal heap {label} {v}"
                )
        off_size = (max_heap_bits + 7) // 8
        len_size = id_len - 1 - off_size
        if not (1 <= len_size <= 8) or not (1 <= off_size <= 8):
            raise ValueError(
                f"{self.path}:{name}: fractal heap ID length {id_len} "
                f"inconsistent with max heap size {max_heap_bits} bits"
            )
        dblock_hdr = 13 + off_size + (4 if flags & 0x2 else 0)
        # doubling table: rows 0 and 1 hold `width` blocks of the
        # starting size; row i >= 2 doubles (start << (i-1)), capped at
        # the max direct block size (rows past that hold indirect
        # blocks, which fixtures cannot exercise -> named refusal)
        max_direct_rows = (
            (max_direct // start_size).bit_length() + 1
        )

        def row_size(r: int) -> int:
            return start_size if r < 2 else start_size << (r - 1)

        row_start = [0]
        for r in range(max_direct_rows):
            row_start.append(row_start[-1] + width * row_size(r))

        dblocks: dict[int, bytes] = {}  # heap-space offset -> block

        def read_dblock(baddr: int, boff: int, bsize: int) -> bytes:
            if boff in dblocks:
                return dblocks[boff]
            blk = self._read(baddr, bsize)
            if blk[:4] != b"FHDB":
                raise ValueError(
                    f"{self.path}:{name}: bad fractal heap direct block"
                    f" signature at {baddr}"
                )
            if blk[4] != 0 or _u(blk, 5, 8) != addr:
                raise ValueError(
                    f"{self.path}:{name}: fractal heap direct block at "
                    f"{baddr} does not back-point to its header"
                )
            if _u(blk, 13, off_size) != boff:
                raise ValueError(
                    f"{self.path}:{name}: direct block at {baddr} "
                    f"stores offset {_u(blk, 13, off_size)}, geometry "
                    f"expects {boff}"
                )
            if flags & 0x2:  # checksummed: field zeroed during compute
                cs_at = 13 + off_size
                stored = _u(blk, cs_at, 4)
                zeroed = blk[:cs_at] + b"\x00\x00\x00\x00" + blk[cs_at + 4:]
                if _lookup3(zeroed) != stored:
                    raise ValueError(
                        f"{self.path}:{name}: bad checksum on fractal "
                        f"heap direct block at {baddr}"
                    )
            dblocks[boff] = blk
            return blk

        iblock_children: list[tuple[int, int]] | None = None
        if cur_rows:  # root is an indirect block
            if cur_rows > max_direct_rows:
                raise NotImplementedError(
                    f"{self.path}:{name}: fractal heap with nested "
                    f"indirect blocks ({cur_rows} rows > "
                    f"{max_direct_rows} direct rows) unsupported"
                )
            ib = self._checksummed(
                root_addr, 13 + off_size + cur_rows * width * 8,
                "fractal heap indirect block",
            )
            if ib[:4] != b"FHIB":
                raise ValueError(
                    f"{self.path}:{name}: bad fractal heap indirect "
                    f"block signature at {root_addr}"
                )
            if ib[4] != 0 or _u(ib, 5, 8) != addr \
                    or _u(ib, 13, off_size) != 0:
                raise ValueError(
                    f"{self.path}:{name}: fractal heap indirect block "
                    f"at {root_addr} does not match its header"
                )
            iblock_children = []
            q = 13 + off_size
            for i in range(cur_rows * width):
                iblock_children.append((_u(ib, q + i * 8, 8), i))

        def managed(off: int, ln: int) -> bytes:
            if iblock_children is None:
                if root_addr == _UNDEF:
                    raise ValueError(
                        f"{self.path}:{name}: heap object at {off} but "
                        "no root block allocated"
                    )
                bsize = max(start_size, alloc_space)
                if off + ln > bsize:
                    raise ValueError(
                        f"{self.path}:{name}: heap object {off}+{ln} "
                        f"outside the {bsize}-byte root direct block"
                    )
                blk = read_dblock(root_addr, 0, bsize)
                return blk[off:off + ln]
            r = 0
            while r + 1 < len(row_start) and off >= row_start[r + 1]:
                r += 1
            rs = row_size(r)
            col = (off - row_start[r]) // rs
            i = r * width + col
            if i >= len(iblock_children):
                raise ValueError(
                    f"{self.path}:{name}: heap object at {off} beyond "
                    "the root indirect block's rows"
                )
            baddr, _ = iblock_children[i]
            if baddr == _UNDEF:
                raise ValueError(
                    f"{self.path}:{name}: heap object at {off} in an "
                    "unallocated direct block"
                )
            boff = row_start[r] + col * rs
            within = off - boff
            if within + ln > rs:
                raise ValueError(
                    f"{self.path}:{name}: heap object {off}+{ln} spans "
                    "a direct-block boundary (corrupt heap ID?)"
                )
            return read_dblock(baddr, boff, rs)[within:within + ln]

        def getter(heap_id: bytes) -> bytes:
            if len(heap_id) < 1:
                raise ValueError(f"{self.path}:{name}: empty heap ID")
            b0 = heap_id[0]
            if b0 & 0xC0:
                raise NotImplementedError(
                    f"{self.path}:{name}: fractal heap ID version "
                    f"{(b0 & 0xC0) >> 6} unsupported"
                )
            idt = (b0 & 0x30) >> 4
            if idt == 0:  # managed
                off = _u(heap_id, 1, off_size)
                ln = _u(heap_id, 1 + off_size, len_size)
                return managed(off, ln)
            if idt == 1:  # tiny: payload inline in the ID
                ln = (b0 & 0x0F) + 1
                if 1 + ln > len(heap_id):
                    raise ValueError(
                        f"{self.path}:{name}: tiny heap ID length {ln} "
                        "exceeds the ID"
                    )
                return heap_id[1:1 + ln]
            raise NotImplementedError(
                f"{self.path}:{name}: fractal heap "
                f"{'huge' if idt == 2 else f'type-{idt}'} objects "
                "unsupported"
            )

        return getter

    def _attribute(self, body: bytes):
        ver = body[0]
        nsize, dtsize, dssize = (
            _u(body, 2, 2), _u(body, 4, 2), _u(body, 6, 2)
        )
        p = 8
        if ver == 3:
            p += 1  # charset

        def pad8(n: int) -> int:
            return n if ver >= 2 else (n + 7) & ~7

        name = body[p:p + nsize].split(b"\x00")[0].decode("utf-8")
        p += pad8(nsize)
        dt = body[p:p + dtsize]
        p += pad8(dtsize)
        ds = body[p:p + dssize]
        p += pad8(dssize)
        data = body[p:]
        cls, size = dt[0] & 0x0F, _u(dt, 4, 4)
        rank = ds[1]
        n_elem = 1
        dp = 8 if ds[0] == 1 else 4
        for i in range(rank):
            n_elem *= _u(ds, dp + i * 8, 8)
        if cls in (0, 1):
            kind = "f" if cls == 1 else ("i" if dt[1] & 0x08 else "u")
            arr = np.frombuffer(
                data[:n_elem * size], dtype=f"<{kind}{size}"
            )
            return name, (arr[0].item() if arr.size == 1 else arr.tolist())
        if cls == 3:  # fixed-length string
            return name, data[:size].split(b"\x00")[0].decode(
                "utf-8", "replace"
            )
        return name, None  # vlen strings etc.: advisory only


def probe_hdf5(path: str) -> dict[str, Hdf5Dataset]:
    """Parse the metadata of an HDF5 file (driver-side, KBs of reads)
    and return {dataset_name: Hdf5Dataset}. Names are '/'-joined group
    paths without a leading slash ('train', 'g/vecs').

    Error taxonomy (r16, mutation-fuzz hardening — the decode_jpeg
    rule): malformed metadata is ALWAYS a ValueError, unsupported
    features a NotImplementedError. Corrupt offsets/ids in the walk
    otherwise escaped as raw KeyError / OSError (negative seek) /
    UnicodeDecodeError / struct.error — engine-crash-shaped failures
    for a bad FILE."""
    p = _Parser(path)
    try:
        return p.parse()
    except (ValueError, NotImplementedError):
        raise
    except (KeyError, OSError, UnicodeDecodeError, IndexError,
            OverflowError, MemoryError, struct.error) as e:
        raise ValueError(
            f"{path}: corrupt HDF5 metadata ({type(e).__name__}: {e})"
        ) from e
    finally:
        p.f.close()


def read_hdf5_vectors(
    spark: SparkSession,
    path: str,
    *,
    dataset: str = "train",
    id_offset: int = 0,
    rows_per_task: int = 65536,
) -> DataFrame:
    """Distributed (vec_id long, embedding array<float>) over a 2-D
    HDF5 dataset — the reference Hdf5Reader's contract (chunked row
    scan, doc_id = row index; hdf5.rs:36-49,64-77) as a Spark source:
    the driver parses metadata only; executors pread disjoint byte
    ranges (the sources/fvecs.py shape). Contiguous layouts split into
    row ranges; chunked layouts split into groups of whole chunk-rows
    (each stored chunk is read+decoded by exactly one task; chunks the
    B-tree never allocated read as the 0 fill value, the h5py
    default).
    """
    meta = probe_hdf5(path)
    key = dataset.lstrip("/")
    if key not in meta:
        raise KeyError(
            f"{path}: no dataset {dataset!r}; available: {sorted(meta)}"
        )
    d = meta[key]
    if len(d.shape) != 2:
        raise ValueError(
            f"{path}:{key}: expected 2-D (n, dim), got shape {d.shape}"
        )
    n, dim = d.shape
    if d.chunk_shape is None and d.data_size < n * d.row_bytes:
        raise ValueError(
            f"{path}:{key}: contiguous region {d.data_size} bytes < "
            f"{n}x{d.row_bytes} expected"
        )
    if n == 0:
        return spark.createDataFrame(
            [], "vec_id long, embedding array<float>"
        )
    if d.chunk_shape is not None:
        return _read_chunked(
            spark, path, d, n, dim,
            id_offset=id_offset, rows_per_task=rows_per_task,
        )
    base, rb, dtype = d.data_offset, d.row_bytes, d.dtype
    chunks = [
        (start, min(rows_per_task, n - start))
        for start in range(0, n, rows_per_task)
    ]
    spec = spark.createDataFrame(chunks, "start long, rows long")

    def _read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for start, rows in zip(b["start"], b["rows"]):
                with open(path, "rb") as f:
                    f.seek(base + int(start) * rb)
                    raw = f.read(int(rows) * rb)
                mat = (
                    np.frombuffer(raw, dtype=dtype)
                    .reshape(int(rows), dim)
                    .astype(np.float32)
                )
                ids = np.arange(
                    id_offset + int(start),
                    id_offset + int(start) + int(rows),
                    dtype=np.int64,
                )
                yield pd.DataFrame({"vec_id": ids, "embedding": list(mat)})

    return (
        spec.repartition("start")
        .mapInPandas(_read, "vec_id long, embedding array<float>")
    )


def _read_chunked(
    spark: SparkSession,
    path: str,
    d: Hdf5Dataset,
    n: int,
    dim: int,
    *,
    id_offset: int,
    rows_per_task: int,
) -> DataFrame:
    """Chunked-layout executor scan: tasks are aligned to chunk-row
    boundaries so every stored chunk is read by exactly ONE executor
    (no duplicated decompression); each task preads its chunks,
    inverts the filter pipeline, and assembles its row block. Column-
    split chunk grids (cc < dim) are assembled in place — a row whose
    chunks span tasks cannot happen because tasks own whole chunk-rows.
    """
    cr, cc = d.chunk_shape
    if cr <= 0 or cc <= 0:
        raise ValueError(f"{path}:{d.name}: bad chunk shape {d.chunk_shape}")
    if d.fill is not None and len(d.fill) < np.dtype(d.dtype).itemsize:
        raise ValueError(
            f"{path}:{d.name}: fill value is {len(d.fill)} bytes, "
            f"dtype needs {np.dtype(d.dtype).itemsize}"
        )
    from collections import defaultdict

    by_row: dict[int, list] = defaultdict(list)
    for (ro, co), off, nb, mask in d.chunks:
        by_row[ro].append((co, off, nb, mask))
    rows_per = max(cr, (rows_per_task // cr) * cr)
    tasks = []
    for r0 in range(0, n, rows_per):
        r1 = min(r0 + rows_per, n)
        chs = [
            (ro, co, off, nb, mask)
            for ro in range(r0, r1, cr)
            for (co, off, nb, mask) in by_row.get(ro, [])
        ]
        tasks.append((
            r0, r1 - r0,
            [c[0] for c in chs], [c[1] for c in chs],
            [c[2] for c in chs], [c[3] for c in chs],
            [c[4] for c in chs],
        ))
    spec = spark.createDataFrame(
        tasks,
        "start long, rows long, c_row array<long>, c_col array<long>, "
        "c_off array<long>, c_len array<long>, c_mask array<long>",
    )
    dtype, filters, fill = d.dtype, list(d.filters), d.fill

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        np_dt = np.dtype(dtype)
        for b in batches:
            for t in b.itertuples(index=False):
                start, rows = int(t.start), int(t.rows)
                # unwritten chunks read as the dataset's defined fill
                # value (message 0x0005), else the all-zeros default
                if fill is not None:
                    out = np.full(
                        (rows, dim),
                        np.frombuffer(fill, dtype=np_dt, count=1)[0],
                        dtype=np_dt,
                    )
                else:
                    out = np.zeros((rows, dim), dtype=np_dt)
                with open(path, "rb") as f:
                    for ro, co, off, ln, mask in zip(
                        t.c_row, t.c_col, t.c_off, t.c_len, t.c_mask
                    ):
                        f.seek(int(off))
                        raw = _decode_chunk(
                            f.read(int(ln)), filters, int(mask)
                        )
                        arr = np.frombuffer(raw, dtype=np_dt)
                        if arr.size < cr * cc:
                            raise ValueError(
                                f"{path}: chunk at ({ro},{co}) decoded to "
                                f"{arr.size} elements, expected {cr * cc}"
                            )
                        arr = arr[: cr * cc].reshape(cr, cc)
                        rv = min(cr, n - int(ro))
                        cv = min(cc, dim - int(co))
                        out[int(ro) - start:int(ro) - start + rv,
                            int(co):int(co) + cv] = arr[:rv, :cv]
                ids = np.arange(
                    id_offset + start, id_offset + start + rows,
                    dtype=np.int64,
                )
                yield pd.DataFrame({
                    "vec_id": ids,
                    "embedding": list(out.astype(np.float32)),
                })

    return (
        spec.repartition("start")
        .mapInPandas(_scan, "vec_id long, embedding array<float>")
    )


# ---------------------------------------------------------------- writer

def _datatype_msg_body(np_dt: np.dtype) -> bytes:
    """Datatype message body for the fixed-point / IEEE-float scalar
    types this module round-trips — byte-identical to h5py's LE
    encodings (shared by the v1 and v4 writers)."""
    if np_dt.kind == "f":
        cls: int = 1
    elif np_dt.kind in ("i", "u"):
        cls = 0
    else:
        raise ValueError(f"unsupported dtype {np_dt}")
    esz = np_dt.itemsize
    if cls == 1:
        # float bitfield: LE, pads 0, mantissa norm = 2 (implied msb),
        # sign at the top bit; properties = bit offset, precision,
        # exponent loc/size, mantissa loc/size, bias
        head = bytes([0x10 | cls, 0x20, esz * 8 - 1, 0])
        head += struct.pack("<I", esz)
        if esz == 4:
            return head + struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        return head + struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
    bits0 = 0x08 if np_dt.kind == "i" else 0x00
    head = bytes([0x10 | cls, bits0, 0, 0]) + struct.pack("<I", esz)
    return head + struct.pack("<HH", 0, esz * 8)


def _build_filter_pipeline(
    np_dt: np.dtype, chunk_nelem: int, compression: str | None,
    compression_opts: int, shuffle: bool, fletcher32: bool,
) -> list[tuple[int, str, int, tuple]]:
    """Filter pipeline entries in application order, mirroring h5py:
    shuffle -> compressor (OPTIONAL flag set) -> fletcher32."""
    filters: list[tuple[int, str, int, tuple]] = []
    if shuffle:
        filters.append((_F_SHUFFLE, "shuffle", 0, (np_dt.itemsize,)))
    if compression == "gzip":
        filters.append((_F_DEFLATE, "deflate", 1, (int(compression_opts),)))
    elif compression == "lzf":
        # client data mirrors h5py's lzf filter registration:
        # (filter version, libLZF version 0x0105, chunk bytes)
        filters.append(
            (_F_LZF, "lzf", 1, (4, 0x0105, chunk_nelem * np_dt.itemsize))
        )
    if fletcher32:
        filters.append((_F_FLETCHER32, "fletcher32", 0, ()))
    return filters


def _chunk_btree_bytes(
    chunk_entries: list[tuple[bytes, int]],
    upper_key: bytes,
    base: int,
    cap: int = 64,
) -> tuple[bytes, int]:
    """Serialize a v1 B-tree (node type 1) indexing `chunk_entries`
    ([(key_bytes, chunk_file_addr)] in canonical chunk order) as nodes
    laid out from file offset `base` (leaves first, root last; every
    node allocated at full `cap`-entry capacity, the libhdf5 shape).
    Returns (bytes, root_addr). cap = 2*K with the v0-superblock
    default istore K of 32."""
    key_size = len(upper_key)
    node_size = 24 + cap * (key_size + 8) + key_size
    counts = []  # nodes per level, leaves first
    m = len(chunk_entries)
    while True:
        c = max(1, -(-m // cap))
        counts.append(c)
        if c == 1:
            break
        m = c

    def addr(level: int, j: int) -> int:
        return base + (sum(counts[:level]) + j) * node_size

    def first_key(level: int, j: int) -> bytes:
        return chunk_entries[j * cap ** (level + 1)][0]

    out = bytearray()
    for level, cnt in enumerate(counts):
        span = cap ** (level + 1)  # chunk entries covered per node
        for j in range(cnt):
            if level == 0:
                ents = chunk_entries[j * cap:(j + 1) * cap]
            else:
                lo, hi = j * cap, min((j + 1) * cap, counts[level - 1])
                ents = [(first_key(level - 1, cj), addr(level - 1, cj))
                        for cj in range(lo, hi)]
            trailing = (
                first_key(level, j + 1)
                if (j + 1) * span < len(chunk_entries) else upper_key
            )
            left = addr(level, j - 1) if j > 0 else _UNDEF
            right = addr(level, j + 1) if j + 1 < cnt else _UNDEF
            node = bytearray()
            node += b"TREE" + bytes([1, level])
            node += struct.pack("<H", len(ents))
            node += struct.pack("<QQ", left, right)
            for k, a in ents:
                node += k + struct.pack("<Q", a)
            node += trailing
            node += b"\x00" * (node_size - len(node))
            out += node
    root = addr(len(counts) - 1, 0)
    return bytes(out), root


def write_hdf5_vectors(
    df: DataFrame, path: str, *, dataset: str = "train",
    dtype: str = "<f4",
    chunks: tuple[int, int] | None = None,
    compression: str | None = None,
    compression_opts: int = 4,
    shuffle: bool = False,
    fletcher32: bool = False,
    fillvalue: float | int | None = None,
    chunk_index: str | None = None,
) -> int:
    """Export (vec_id, embedding) to a minimal spec-conformant HDF5
    file: superblock v0, old-style root group (v1 B-tree + local heap +
    symbol node), one v1 object header per dataset — byte-layout-
    compatible with what default-libver h5py emits, so any HDF5
    consumer (h5py, the reference's hdf5 crate) can read it back.
    Default layout is contiguous (`create_dataset(name, data=...)`);
    pass `chunks=(rows, cols)` and/or `compression='gzip'` /
    `shuffle` / `fletcher32` for the chunked layout with a v1 B-tree
    chunk index and a filter pipeline (`create_dataset(...,
    chunks=..., compression='gzip', ...)`). deflate is written as an
    OPTIONAL filter: an incompressible chunk is stored raw with its
    filter-mask bit set, as libhdf5 does for optional filters. Rows
    are written in vec_id order; vec_ids must be contiguous from their
    minimum (the write_vecs contract — this format stores no ids).

    Returns the number of rows written. Driver-side assembly by design:
    like sources/fvecs.write_vecs, the single-file export boundary is
    inherently one writer; use write_hdf5_sharded (the fvecs
    write_vecs_sharded treatment) for corpus-scale exports. Since r12
    the assembly collects ONE Arrow table and reshapes its flat list
    buffer (offsets validated rectangular) — one Arrow copy + the
    output matrix, instead of toPandas' frame + python lists + a
    stacked copy, and without toLocalIterator's per-row Python cost
    (measured: the row-at-a-time variant tripled the src4/src5
    serving-path rows)."""
    name = dataset.lstrip("/")
    if not name or "/" in name:
        raise ValueError("writer supports a single root-level dataset name")
    from pyspark.sql import functions as _F

    agg = df.agg(
        _F.count("vec_id").alias("n"),
        _F.min("vec_id").alias("lo"),
        _F.max("vec_id").alias("hi"),
        _F.count_distinct("vec_id").alias("nd"),
    ).first()
    n = int(agg["n"] or 0)
    if n == 0:
        raise ValueError("refusing to write an empty HDF5 dataset")
    lo = int(agg["lo"])
    if int(agg["hi"]) - lo + 1 != n or int(agg["nd"]) != n:
        raise ValueError(
            "vec_ids must be contiguous from their minimum: HDF5 datasets "
            "store no ids (read_hdf5_vectors re-synthesizes row position)"
        )
    tbl = df.select("vec_id", "embedding").toArrow()
    ids = tbl.column("vec_id").to_numpy()
    emb = tbl.column("embedding").combine_chunks()
    lens = np.diff(emb.offsets.to_numpy())
    if len(lens) == 0 or not (lens == lens[0]).all():
        bad = ids[np.argmax(lens != lens[0])] if len(lens) else "<none>"
        raise ValueError(
            f"ragged embeddings: vec_id {bad} has {int(lens.min())}.."
            f"{int(lens.max())} values across the frame"
        )
    dim = int(lens[0])
    idx = ids.astype(np.int64) - lo
    if idx.min() < 0 or idx.max() >= n:
        raise ValueError(
            f"vec_id outside the validated [{lo}, {lo + n - 1}] range "
            "(nondeterministic input?)"
        )
    # the bounds check alone misses duplicate ids from a nondeterministic
    # input re-evaluated between the aggregate job and this collect: a
    # duplicate would scatter-overwrite one row and leave an np.empty row
    # in the file silently
    if len(np.unique(idx)) != n:
        raise ValueError(
            "duplicate vec_ids between validation and collection "
            "(nondeterministic input?)"
        )
    flat = emb.flatten().to_numpy(zero_copy_only=False)  # offset-safe
    mat = np.empty((n, dim), dtype=np.dtype(dtype))
    mat[idx] = flat.reshape(n, dim).astype(np.dtype(dtype), copy=False)
    if chunk_index is not None:
        # 'latest'-libver form: superblock v3 + v2 object headers + a
        # version-4 layout with the named chunk index ('single',
        # 'implicit', 'fixed_array', 'ext_array', 'btree2')
        _write_hdf5_matrix_v4(
            path, name, mat, dtype=dtype, chunks=chunks,
            index=chunk_index, compression=compression,
            compression_opts=compression_opts, shuffle=shuffle,
            fletcher32=fletcher32, fillvalue=fillvalue,
        )
    else:
        _write_hdf5_matrix(
            path, name, mat, dtype=dtype, chunks=chunks,
            compression=compression, compression_opts=compression_opts,
            shuffle=shuffle, fletcher32=fletcher32, fillvalue=fillvalue,
        )
    return n


def _write_hdf5_matrix(
    path: str,
    name: str,
    mat: np.ndarray,
    *,
    dtype: str = "<f4",
    chunks: tuple[int, int] | None = None,
    compression: str | None = None,
    compression_opts: int = 4,
    shuffle: bool = False,
    fletcher32: bool = False,
    fillvalue: float | int | None = None,
) -> None:
    """Serialize one 2-D matrix as a single-dataset HDF5 file — the
    pure-numpy core behind write_hdf5_vectors, callable executor-side
    (write_hdf5_sharded's per-shard task). `fillvalue` writes a v3
    fill value message (h5py's fillvalue= kwarg) — what unwritten
    chunks of a sparse dataset read back as."""
    if compression not in (None, "gzip", "lzf"):
        raise NotImplementedError(
            f"compression {compression!r} unsupported (only 'gzip'/'lzf')"
        )
    n, dim = mat.shape

    so = struct.Struct("<Q")
    K_LEAF, K_INT = 4, 16

    np_dt = np.dtype(dtype)
    if np_dt.kind == "f":
        cls, signed = 1, False
    elif np_dt.kind in ("i", "u"):
        cls, signed = 0, np_dt.kind == "i"
    else:
        raise ValueError(f"unsupported dtype {dtype}")

    # ----- filter pipeline + chunk grid (chunked layout only)
    if chunks is None and (compression or shuffle or fletcher32):
        # filters require chunking; auto-pick whole-row chunks of
        # ~256 KiB (the h5py auto-chunk ballpark)
        rows = max(1, min(n, 262144 // max(1, dim * np_dt.itemsize)))
        chunks = (rows, dim)
    filters: list[tuple[int, str, int, tuple]] = []
    if chunks is not None:
        cr, cc = int(chunks[0]), int(chunks[1])
        if not (1 <= cr <= n and 1 <= cc <= dim):
            raise ValueError(
                f"chunk shape {chunks} out of range for data ({n}, {dim})"
            )
        filters = _build_filter_pipeline(
            np_dt, cr * cc, compression, compression_opts, shuffle,
            fletcher32,
        )

    def dataspace_msg() -> bytes:
        return (
            struct.pack("<BBBB4x", 1, 2, 1, 0)
            + struct.pack("<QQ", n, dim)
            + struct.pack("<QQ", n, dim)  # maxdims == dims
        )

    def datatype_msg() -> bytes:
        return _datatype_msg_body(np_dt)

    def layout_msg(data_addr: int) -> bytes:  # contiguous
        return bytes([3, 1]) + so.pack(data_addr) + so.pack(mat.nbytes)

    def layout_msg_chunked(btree_root: int) -> bytes:
        # v3 class 2: dimensionality = rank+1, B-tree addr, chunk dims
        # as 4-byte sizes with the element size as the trailing dim
        return (
            bytes([3, 2, 3]) + so.pack(btree_root)
            + struct.pack("<III", cr, cc, np_dt.itemsize)
        )

    def pipeline_msg() -> bytes:
        # v1 filter pipeline; reserved filters carry no name (libhdf5
        # writes name_length 0 for ids < 256); odd client-data counts
        # pad 4 bytes
        body = struct.pack("<BB6x", 1, len(filters))
        for fid, _fname, fflags, cdata in filters:
            body += struct.pack("<HHHH", fid, 0, fflags, len(cdata))
            for v in cdata:
                body += struct.pack("<I", v)
            if len(cdata) % 2:
                body += b"\x00" * 4
        return body

    def msg(mtype: int, body: bytes, pad_to: int | None = None) -> bytes:
        if pad_to is not None:
            body = body.ljust(pad_to - 8, b"\x00")
        body = body.ljust((len(body) + 7) & ~7, b"\x00")
        return struct.pack("<HHB3x", mtype, len(body), 0) + body

    m_space = msg(0x0001, dataspace_msg(), pad_to=48)
    m_type = msg(0x0003, datatype_msg(), pad_to=32)
    m_pipe = msg(0x000B, pipeline_msg()) if filters else b""
    if fillvalue is not None:
        # v3 fill value message: flags = incremental space allocation
        # (3) | write-on-allocation (0<<2) | defined (0x20)
        fv = np.array(fillvalue, dtype=np_dt).tobytes()
        m_fill = msg(
            0x0005,
            bytes([3, 0x23]) + struct.pack("<I", len(fv)) + fv,
        )
    else:
        m_fill = b""
    layout_size = len(msg(
        0x0008,
        layout_msg_chunked(0) if chunks is not None else layout_msg(0),
        pad_to=32,
    ))

    # layout plan (addresses mirror the default-h5py arrangement)
    root_hdr_addr = 0x60
    btree_addr = root_hdr_addr + 40          # 0x88
    btree_size = 24 + (2 * K_INT + 1) * 8 + K_INT * 16  # generous node
    heap_addr = btree_addr + btree_size
    heap_data_size = max(((len(name) + 1 + 7) & ~7) + 8, 0x58)
    heap_data_addr = heap_addr + 32
    dset_hdr_addr = heap_data_addr + heap_data_size
    dset_hdr_size = (
        16 + len(m_space) + len(m_type) + layout_size + len(m_pipe)
        + len(m_fill)
    )
    snod_addr = dset_hdr_addr + dset_hdr_size
    snod_size = 8 + 2 * K_LEAF * 40
    data_addr = (snod_addr + snod_size + 7) & ~7

    raw_mat = mat.astype(np_dt, copy=False)
    if chunks is None:
        m_layout = msg(0x0008, layout_msg(data_addr), pad_to=32)
        data_blob = raw_mat.tobytes()
        btree_blob = b""
        eof = data_addr + len(data_blob)
    else:
        # encode chunks in canonical (row-major grid) order; edge
        # chunks are zero-padded to the full chunk shape — libhdf5
        # stores whole chunks and readers clip on assembly
        blobs: list[bytes] = []
        entries: list[tuple[bytes, int]] = []
        off = data_addr
        for ro in range(0, n, cr):
            for co in range(0, dim, cc):
                block = np.zeros((cr, cc), dtype=np_dt)
                rv, cv = min(cr, n - ro), min(cc, dim - co)
                block[:rv, :cv] = raw_mat[ro:ro + rv, co:co + cv]
                enc, fmask = _encode_chunk(block.tobytes(), filters)
                key = (struct.pack("<II", len(enc), fmask)
                       + struct.pack("<QQQ", ro, co, 0))
                entries.append((key, off))
                blobs.append(enc)
                off += len(enc)
        upper = (struct.pack("<II", 0, 0)
                 + struct.pack("<QQQ", -(-n // cr) * cr, 0, 0))
        btree_blob, btree_root = _chunk_btree_bytes(entries, upper, off)
        m_layout = msg(0x0008, layout_msg_chunked(btree_root), pad_to=32)
        data_blob = b"".join(blobs)
        eof = off + len(btree_blob)
    dset_msgs = m_space + m_type + m_layout + m_pipe + m_fill
    assert len(dset_msgs) == dset_hdr_size - 16, len(dset_msgs)

    with open(path, "wb") as f:
        # superblock v0 + root symbol table entry (btree/heap cached)
        f.write(_SIG)
        f.write(struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0))
        f.write(struct.pack("<HHI", K_LEAF, K_INT, 0))
        f.write(so.pack(0) + so.pack(_UNDEF) + so.pack(eof) + so.pack(_UNDEF))
        f.write(so.pack(0) + so.pack(root_hdr_addr))
        f.write(struct.pack("<II", 1, 0))
        f.write(so.pack(btree_addr) + so.pack(heap_addr))  # scratch cache

        # root object header: one symbol-table message
        assert f.tell() == root_hdr_addr
        st_body = so.pack(btree_addr) + so.pack(heap_addr)
        f.write(struct.pack("<BBHII4x", 1, 0, 1, 1, 8 + len(st_body)))
        f.write(msg(0x0011, st_body))

        # group B-tree: one leaf pointing at the symbol node
        assert f.tell() == btree_addr
        f.write(b"TREE" + struct.pack("<BBH", 0, 0, 1))
        f.write(so.pack(_UNDEF) + so.pack(_UNDEF))
        f.write(so.pack(0) + so.pack(snod_addr) + so.pack(8))
        f.write(b"\x00" * (btree_addr + btree_size - f.tell()))

        # local heap; name at offset 8 (offset 0 kept empty/free-ish)
        assert f.tell() == heap_addr
        f.write(b"HEAP" + struct.pack("<B3x", 0))
        # free list head = undefined (no free blocks tracked)
        f.write(so.pack(heap_data_size) + so.pack(_UNDEF)
                + so.pack(heap_data_addr))
        heap_block = bytearray(heap_data_size)
        heap_block[8:8 + len(name)] = name.encode()
        f.write(bytes(heap_block))

        # dataset object header
        assert f.tell() == dset_hdr_addr
        nmsgs = 3 + (1 if filters else 0) + (1 if fillvalue is not None else 0)
        f.write(struct.pack("<BBHII4x", 1, 0, nmsgs, 1, len(dset_msgs)))
        f.write(dset_msgs)

        # symbol node with the single entry
        assert f.tell() == snod_addr
        f.write(b"SNOD" + struct.pack("<BBH", 1, 0, 1))
        f.write(so.pack(8) + so.pack(dset_hdr_addr))
        f.write(struct.pack("<II", 0, 0) + b"\x00" * 16)
        f.write(b"\x00" * (2 * K_LEAF - 1) * 40)

        f.write(b"\x00" * (data_addr - f.tell()))
        assert f.tell() == data_addr
        f.write(data_blob)
        f.write(btree_blob)
        assert f.tell() == eof


def _ohdr_v2_bytes(msgs: list[tuple[int, bytes]]) -> bytes:
    """Serialize a version-2 object header (spec IV.A.1.b): 'OHDR',
    version 2, flags 0x02 (4-byte chunk-0 size, no times, no creation-
    order tracking), the message stream, and a lookup3 checksum over
    everything before it. The stored chunk-0 size covers the messages
    only (the checksum is accounted separately — H5O_SIZEOF_HDR)."""
    body = b"".join(
        struct.pack("<BHB", t, len(b), 0) + b for t, b in msgs
    )
    out = b"OHDR" + bytes([2, 0x02]) + struct.pack("<I", len(body)) + body
    return out + struct.pack("<I", _lookup3(out))


def _write_hdf5_matrix_v4(
    path: str,
    name: str,
    mat: np.ndarray,
    *,
    dtype: str = "<f4",
    chunks: tuple[int, int] | None = None,
    index: str = "fixed_array",
    compression: str | None = None,
    compression_opts: int = 4,
    shuffle: bool = False,
    fletcher32: bool = False,
    fillvalue: float | int | None = None,
    unlimited_rows: bool | None = None,
    fa_page_bits: int = 10,
    ea_params: tuple[int, int, int, int, int] = (32, 4, 4, 16, 10),
    bt2_node_size: int = 2048,
    omit_chunks: frozenset | set | None = None,
) -> None:
    """Serialize one 2-D matrix as an HDF5 file in the 'latest'-libver
    shape: superblock v3, v2 object headers (lookup3-checksummed), a
    version-4 data layout message, and the requested chunk index —
    ``index`` in {'single', 'implicit', 'fixed_array', 'ext_array',
    'btree2'}. This is the fixture path for the v4 reader (the
    environment ships no libhdf5 to write such files), built from the
    same public spec sections the reader cites; the shared helpers
    (_ea_geometry, _bt2_node_info, _lookup3) keep both sides honest,
    and every stored block offset is independently validated on read.

    ``unlimited_rows`` writes maxdims[0] as unlimited (default: only
    for ext_array, matching how libhdf5 selects that index).
    ``omit_chunks`` is a set of linear chunk-grid indices to leave
    unallocated (fill-value reads) — legal for the array/B-tree
    indexes."""
    if compression not in (None, "gzip", "lzf"):
        raise NotImplementedError(
            f"compression {compression!r} unsupported (only 'gzip'/'lzf')"
        )
    if index not in ("single", "implicit", "fixed_array", "ext_array",
                     "btree2"):
        raise ValueError(f"unknown v4 chunk index {index!r}")
    np_dt = np.dtype(dtype)
    n, dim = mat.shape
    if unlimited_rows is None:
        unlimited_rows = index == "ext_array"
    if unlimited_rows and index in ("single", "implicit", "fixed_array"):
        raise ValueError(
            f"index {index!r} requires fixed max dimensions"
        )
    if chunks is None:
        if index == "single":
            chunks = (n, dim)
        else:
            rows = max(1, min(n, 262144 // max(1, dim * np_dt.itemsize)))
            chunks = (rows, dim)
    cr, cc = int(chunks[0]), int(chunks[1])
    if not (1 <= cr and 1 <= cc <= dim) or (index != "single" and cr > n):
        raise ValueError(
            f"chunk shape {chunks} out of range for data ({n}, {dim})"
        )
    grid_r, grid_c = -(-n // cr), -(-dim // cc)
    nchunks = grid_r * grid_c
    if index == "single" and nchunks != 1:
        raise ValueError(
            f"single-chunk index needs one chunk, grid is "
            f"({grid_r}, {grid_c})"
        )
    filters = _build_filter_pipeline(
        np_dt, cr * cc, compression, compression_opts, shuffle, fletcher32
    )
    if index == "implicit" and filters:
        raise ValueError("the implicit index does not admit filters")
    omit = frozenset(omit_chunks or ())
    if omit and index in ("single", "implicit"):
        raise ValueError(f"index {index!r} cannot omit chunks")
    so = struct.Struct("<Q")

    # ----- encode chunks in row-major grid order (the linearization
    # the indexes address: no unlimited dim, or unlimited dim 0 —
    # either way natural order)
    raw_mat = mat.astype(np_dt, copy=False)
    blobs: list[bytes | None] = []
    masks: list[int] = []
    for ro in range(0, grid_r * cr, cr):
        for co in range(0, grid_c * cc, cc):
            if len(blobs) in omit:
                blobs.append(None)
                masks.append(0)
                continue
            block = np.zeros((cr, cc), dtype=np_dt)
            rv, cv = min(cr, n - ro), min(cc, dim - co)
            block[:rv, :cv] = raw_mat[ro:ro + rv, co:co + cv]
            enc, fmask = _encode_chunk(block.tobytes(), filters)
            blobs.append(enc)
            masks.append(fmask)

    # ----- dataset messages (as a function of the index address)
    maxrow = _UNDEF if unlimited_rows else n
    space_body = (
        bytes([2, 2, 1, 1])
        + struct.pack("<QQ", n, dim)
        + so.pack(maxrow) + so.pack(dim)
    )
    dtype_body = _datatype_msg_body(np_dt)
    fill_body = None
    if fillvalue is not None:
        fv = np.array(fillvalue, dtype=np_dt).tobytes()
        fill_body = bytes([3, 0x23]) + struct.pack("<I", len(fv)) + fv
    pipe_body = None
    if filters:
        pipe_body = bytes([2, len(filters)])
        for fid, fname, fflags, cdata in filters:
            pipe_body += struct.pack("<H", fid)
            nm = fname.encode() if fid >= 256 else b""
            if fid >= 256:
                pipe_body += struct.pack("<H", len(nm))
            pipe_body += struct.pack("<HH", fflags, len(cdata)) + nm
            for v in cdata:
                pipe_body += struct.pack("<I", v)

    itype_code = {
        "single": 1, "implicit": 2, "fixed_array": 3, "ext_array": 4,
        "btree2": 5,
    }[index]
    lflags = 0
    if index == "single" and filters:
        lflags |= 0x02  # SINGLE_INDEX_WITH_FILTER

    def layout_body(index_addr: int) -> bytes:
        b = bytes([4, 2, lflags, 3, 8])
        b += so.pack(cr) + so.pack(cc) + so.pack(np_dt.itemsize)
        b += bytes([itype_code])
        if index == "single" and filters:
            b += so.pack(len(blobs[0] or b"")) \
                + struct.pack("<I", masks[0])
        elif index == "fixed_array":
            b += bytes([fa_page_bits])
        elif index == "ext_array":
            b += bytes(ea_params)
        elif index == "btree2":
            b += struct.pack("<IBB", bt2_node_size, 100, 40)
        return b + so.pack(index_addr)

    def dset_hdr(index_addr: int) -> bytes:
        msgs = [(0x0001, space_body), (0x0003, dtype_body)]
        if fill_body is not None:
            msgs.append((0x0005, fill_body))
        msgs.append((0x0008, layout_body(index_addr)))
        if pipe_body is not None:
            msgs.append((0x000B, pipe_body))
        return _ohdr_v2_bytes(msgs)

    # ----- address plan: superblock, root group header, dataset
    # header, chunk data, index structure
    root_addr = 48

    def root_hdr(dset_addr: int) -> bytes:
        link = bytes([1, 0, len(name.encode())]) + name.encode() \
            + so.pack(dset_addr)
        return _ohdr_v2_bytes([(0x0006, link)])

    dset_addr = root_addr + len(root_hdr(0))
    data_addr = (dset_addr + len(dset_hdr(0)) + 7) & ~7
    offs: list[int] = []
    off = data_addr
    for b in blobs:
        offs.append(off if b is not None else _UNDEF)
        off += len(b) if b is not None else 0
    index_addr = (off + 7) & ~7
    elements = [
        (offs[i], len(blobs[i]) if blobs[i] is not None else 0, masks[i])
        for i in range(nchunks)
    ]
    if index == "single":
        index_blob = b""
        index_addr = offs[0] if blobs[0] is not None else _UNDEF
    elif index == "implicit":
        index_blob = b""
        index_addr = data_addr
    elif index == "fixed_array":
        index_blob = _fa_index_bytes(
            index_addr, elements, bool(filters), fa_page_bits
        )
    elif index == "ext_array":
        index_blob = _ea_index_bytes(
            index_addr, elements, bool(filters), ea_params
        )
    else:
        index_blob = _bt2_index_bytes(
            index_addr, elements, bool(filters), (grid_r, grid_c),
            bt2_node_size,
        )
    eof = (index_addr + len(index_blob)) if index_blob else off

    with open(path, "wb") as f:
        sb = _SIG + bytes([3, 8, 8, 0])
        sb += so.pack(0) + so.pack(_UNDEF) + so.pack(eof) \
            + so.pack(root_addr)
        f.write(sb + struct.pack("<I", _lookup3(sb)))
        assert f.tell() == root_addr
        f.write(root_hdr(dset_addr))
        assert f.tell() == dset_addr
        f.write(dset_hdr(index_addr))
        f.write(b"\x00" * (data_addr - f.tell()))
        for b in blobs:
            if b is not None:
                f.write(b)
        if index_blob:
            f.write(b"\x00" * (index_addr - f.tell()))
            f.write(index_blob)
            assert f.tell() == eof


def _fa_elmt_bytes(elements, filtered: bool, entry: int, csl: int,
                   lo: int, hi: int) -> bytes:
    out = bytearray()
    for i in range(lo, hi):
        if i < len(elements):
            a, s, m = elements[i]
        else:
            a, s, m = _UNDEF, 0, 0
        out += struct.pack("<Q", a)
        if filtered:
            out += s.to_bytes(csl, "little") + struct.pack("<I", m)
    assert len(out) == (hi - lo) * entry
    return bytes(out)


def _fa_index_bytes(base: int, elements: list, filtered: bool,
                    page_bits: int) -> bytes:
    """Fixed array index: 'FAHD' header + 'FADB' data block at
    base + 28, paged when the capacity exceeds 2^page_bits."""
    maxn = len(elements)
    csl = max(
        1, _limit_enc_size(max((s for _, s, _ in elements), default=1))
    )
    entry = 8 + csl + 4 if filtered else 8
    client = 1 if filtered else 0
    dblk_addr = base + 28
    hdr = (b"FAHD" + bytes([0, client, entry, page_bits])
           + struct.pack("<Q", maxn) + struct.pack("<Q", dblk_addr))
    out = bytearray(hdr + struct.pack("<I", _lookup3(hdr)))
    pre = b"FADB" + bytes([0, client]) + struct.pack("<Q", base)
    page_n = 1 << page_bits
    if maxn <= page_n:
        body = pre + _fa_elmt_bytes(elements, filtered, entry, csl,
                                    0, maxn)
        out += body + struct.pack("<I", _lookup3(body))
        return bytes(out)
    npages = -(-maxn // page_n)
    bitmap = bytearray((npages + 7) // 8)
    for pg in range(npages):  # every page written: MSB-first bits
        bitmap[pg // 8] |= 1 << (7 - pg % 8)
    body = pre + bytes(bitmap)
    out += body + struct.pack("<I", _lookup3(body))
    for pg in range(npages):
        lo = pg * page_n
        page = _fa_elmt_bytes(elements, filtered, entry, csl, lo,
                              min(lo + page_n, maxn))
        out += page + struct.pack("<I", _lookup3(page))
    return bytes(out)


def _ea_index_bytes(base: int, elements: list, filtered: bool,
                    ea_params: tuple) -> bytes:
    """Extensible array index: 'EAHD' header at base, 'EAIB' index
    block, then the needed 'EASB'/'EADB' blocks (paged data blocks
    past 2^page_bits elements), laid out consecutively."""
    mbits, ielmts, smin, dmin, pbits = ea_params
    nelmts = len(elements)
    csl = max(
        1, _limit_enc_size(max((s for _, s, _ in elements), default=1))
    )
    esize = 8 + csl + 4 if filtered else 8
    client = 1 if filtered else 0
    arr_off = (mbits + 7) // 8
    page_n = 1 << pbits
    (nsblks, ndblks, dnel, start_idx, start_dblk,
     ibl_nsblks) = _ea_geometry(mbits, ielmts, dmin, smin)
    if nelmts > 1 << mbits:
        raise ValueError(
            f"{nelmts} chunks exceed the 2^{mbits} extensible-array "
            "capacity"
        )
    for u in range(ibl_nsblks):
        if dnel[u] > page_n and start_idx[u] < nelmts:
            raise ValueError(
                "creation parameters would page an index-block-direct "
                "data block (libhdf5 never emits this; raise page_bits)"
            )

    def elmt(i: int) -> bytes:
        if i < nelmts:
            a, s, m = elements[i]
        else:
            a, s, m = _UNDEF, 0, 0
        b = struct.pack("<Q", a)
        if filtered:
            b += s.to_bytes(csl, "little") + struct.pack("<I", m)
        return b

    ndblk_addrs = sum(ndblks[:ibl_nsblks])
    nsblk_addrs = nsblks - ibl_nsblks
    hdr_size = 72
    ib_size = 14 + ielmts * esize + (ndblk_addrs + nsblk_addrs) * 8 + 4
    iblk_addr = base + hdr_size
    cursor = iblk_addr + ib_size

    def dblk_size(u: int) -> int:
        if dnel[u] > page_n:
            return (14 + arr_off + 4
                    + (dnel[u] // page_n) * (page_n * esize + 4))
        return 14 + arr_off + dnel[u] * esize + 4

    def dblk_bytes(u: int, j: int, addr: int) -> bytes:
        first = start_idx[u] + j * dnel[u]
        pre = (b"EADB" + bytes([0, client]) + struct.pack("<Q", base)
               + first.to_bytes(arr_off, "little"))
        if dnel[u] <= page_n:
            body = pre + b"".join(
                elmt(first + e) for e in range(dnel[u])
            )
            return body + struct.pack("<I", _lookup3(body))
        out = bytearray(pre + struct.pack("<I", _lookup3(pre)))
        for pg in range(dnel[u] // page_n):
            page = b"".join(
                elmt(first + pg * page_n + e) for e in range(page_n)
            )
            out += page + struct.pack("<I", _lookup3(page))
        return bytes(out)

    # which blocks are needed: any containing an element index < nelmts
    tail = bytearray()
    ib_dblk_addrs: list[int] = []
    for u in range(ibl_nsblks):
        for j in range(ndblks[u]):
            if start_idx[u] + j * dnel[u] < nelmts:
                ib_dblk_addrs.append(cursor)
                blob = dblk_bytes(u, j, cursor)
                assert len(blob) == dblk_size(u)
                tail += blob
                cursor += len(blob)
            else:
                ib_dblk_addrs.append(_UNDEF)
    ib_sblk_addrs: list[int] = []
    for u in range(ibl_nsblks, nsblks):
        if start_idx[u] >= nelmts:
            ib_sblk_addrs.append(_UNDEF)
            continue
        nd = ndblks[u]
        dnp = dnel[u] // page_n if dnel[u] > page_n else 0
        bl = ((nd * dnp) + 7) // 8 if dnp else 0
        sblk_size = 14 + arr_off + bl + nd * 8 + 4
        sblk_addr = cursor
        ib_sblk_addrs.append(sblk_addr)
        cursor += sblk_size
        bitmap = bytearray(bl)
        addrs: list[int] = []
        blobs2 = bytearray()
        for j in range(nd):
            if start_idx[u] + j * dnel[u] < nelmts:
                addrs.append(cursor)
                blob = dblk_bytes(u, j, cursor)
                blobs2 += blob
                cursor += len(blob)
                for pg in range(dnp):
                    bit = j * dnp + pg
                    bitmap[bit // 8] |= 1 << (7 - bit % 8)
            else:
                addrs.append(_UNDEF)
        body = (b"EASB" + bytes([0, client]) + struct.pack("<Q", base)
                + start_idx[u].to_bytes(arr_off, "little")
                + bytes(bitmap)
                + b"".join(struct.pack("<Q", a) for a in addrs))
        assert len(body) + 4 == sblk_size
        tail += body + struct.pack("<I", _lookup3(body))
        tail += blobs2

    ib_body = (b"EAIB" + bytes([0, client]) + struct.pack("<Q", base)
               + b"".join(elmt(i) for i in range(ielmts))
               + b"".join(struct.pack("<Q", a) for a in ib_dblk_addrs)
               + b"".join(struct.pack("<Q", a) for a in ib_sblk_addrs))
    assert len(ib_body) + 4 == ib_size
    nwritten = sum(1 for a in ib_sblk_addrs if a != _UNDEF)
    hdr_body = (
        b"EAHD"
        + bytes([0, client, esize, mbits, ielmts, dmin, smin, pbits])
        + struct.pack(
            "<QQQQQQ", nwritten, 0, 0, 0,
            nelmts, nelmts,  # max index set, elements (stats)
        )
        + struct.pack("<Q", iblk_addr)
    )
    assert len(hdr_body) + 4 == hdr_size
    return (hdr_body + struct.pack("<I", _lookup3(hdr_body))
            + ib_body + struct.pack("<I", _lookup3(ib_body))
            + bytes(tail))


def _bt2_tree_bytes(base: int, recs: list[bytes], rec_size: int,
                    btype: int, node_size: int) -> bytes:
    """Generic version-2 B-tree serializer: 'BTHD' header at base,
    then the nodes (DFS order, each allocated a full node_size) for
    the given pre-encoded records IN SORTED ORDER. Shared by the
    chunk index (types 10/11) and the dense-group link-name index
    (type 5); the reader walks arbitrary depth."""
    m = len(recs)

    def node(sig: bytes, payload: bytes) -> bytes:
        body = sig + bytes([0, btype]) + payload
        body += struct.pack("<I", _lookup3(body))
        if len(body) > node_size:
            raise ValueError(
                f"v2 B-tree node overflow ({len(body)} > {node_size})"
            )
        return body.ljust(node_size, b"\x00")

    def header(root_addr: int, root_nrec: int, depth: int) -> bytes:
        h = (b"BTHD" + bytes([0, btype])
             + struct.pack("<IHH", node_size, rec_size, depth)
             + bytes([100, 40])
             + struct.pack("<Q", root_addr)
             + struct.pack("<H", root_nrec)
             + struct.pack("<Q", m))
        return h + struct.pack("<I", _lookup3(h))

    if m == 0:
        return header(_UNDEF, 0, 0)
    depth = 0
    while True:
        max_nrec, sz, cum_sz = _bt2_node_info(node_size, rec_size, depth)
        cap = [max_nrec[0]]
        for d in range(1, depth + 1):
            cap.append((max_nrec[d] + 1) * cap[d - 1] + max_nrec[d])
        if cap[depth] >= m:
            break
        depth += 1
        if depth > 16:
            raise ValueError("unreasonable v2 B-tree depth")

    nodes: list[bytes] = []  # in address (= DFS completion) order
    cursor = base + 38

    def build(rs: list, d: int) -> tuple[int, int, int]:
        """Write the subtree for records rs at depth d; returns
        (node_addr, node_nrec, subtree_total)."""
        nonlocal cursor
        if d == 0:
            addr = cursor
            cursor += node_size
            nodes.append(node(b"BTLF", b"".join(rs)))
            return addr, len(rs), len(rs)
        c = -(-(len(rs) + 1) // (cap[d - 1] + 1))
        nsep = c - 1
        per, rem = divmod(len(rs) - nsep, c)
        seps: list[bytes] = []
        childs: list[list] = []
        p = 0
        for k in range(c):
            ct = per + (1 if k < rem else 0)
            childs.append(rs[p:p + ct])
            p += ct
            if k < nsep:
                seps.append(rs[p])
                p += 1
        assert p == len(rs)
        infos = [build(ch, d - 1) for ch in childs]
        addr = cursor
        cursor += node_size
        ptrs = b""
        for ca, cn, ctot in infos:
            ptrs += struct.pack("<Q", ca) + cn.to_bytes(sz[d - 1], "little")
            if d > 1:
                ptrs += ctot.to_bytes(cum_sz[d - 1], "little")
        nodes.append(node(b"BTIN", b"".join(seps) + ptrs))
        return addr, nsep, len(rs)

    root_addr, root_nrec, total = build(recs, depth)
    assert total == m
    return header(root_addr, root_nrec, depth) + b"".join(nodes)


def _bt2_index_bytes(base: int, elements: list, filtered: bool,
                     grid: tuple[int, int], node_size: int) -> bytes:
    """Version-2 B-tree CHUNK index records (types 10/11) over the
    generic serializer. Records are emitted in row-major grid order —
    exactly the scaled-offset lexicographic order the tree sorts by."""
    grid_r, grid_c = grid
    csl = max(
        1, _limit_enc_size(max((s for _, s, _ in elements), default=1))
    )
    rec_size = (12 + csl + 16) if filtered else 24

    def rec(i: int) -> bytes:
        a, s, m = elements[i]
        r, c = divmod(i, grid_c)
        b = struct.pack("<Q", a)
        if filtered:
            b += s.to_bytes(csl, "little") + struct.pack("<I", m)
        return b + struct.pack("<QQ", r, c)

    recs = [rec(i) for i in range(len(elements))
            if elements[i][0] != _UNDEF]
    return _bt2_tree_bytes(base, recs, rec_size,
                           11 if filtered else 10, node_size)


def _fheap_bytes(
    base: int, objects: list[bytes], *, start_size: int = 512,
    max_direct: int = 4096, width: int = 4, checksum: bool = True,
    max_heap_bits: int = 32,
) -> tuple[bytes, list[bytes], int]:
    """Serialize a fractal heap holding `objects` as managed objects:
    'FRHP' header at base, then either one root direct block (doubled
    in place to fit, the libhdf5 root_double shape) or a root indirect
    block over doubling-table direct blocks. Returns (blob, heap_ids,
    id_len). Fixture scope: managed objects in direct rows only."""
    off_size = (max_heap_bits + 7) // 8
    len_size = _limit_enc_size(max_direct)
    id_len = 1 + off_size + len_size
    hdr_ov = 13 + off_size + (4 if checksum else 0)
    for v, nm in ((start_size, "start_block_size"),
                  (max_direct, "max_direct")):
        if v & (v - 1) or v <= hdr_ov:
            raise ValueError(f"bad fractal heap {nm} {v}")

    def row_size(r: int) -> int:
        return start_size if r < 2 else start_size << (r - 1)

    max_rows = (max_direct // start_size).bit_length() + 1
    row_start = [0]
    for r in range(max_rows):
        row_start.append(row_start[-1] + width * row_size(r))

    total = sum(len(o) for o in objects)
    single = total + hdr_ov <= max_direct
    # blocks: [row, col, heap_off, size, content, used]
    blocks: list[list] = []
    if single:
        size = start_size
        while size < total + hdr_ov:
            size <<= 1
        blocks.append([0, 0, 0, size, bytearray(), hdr_ov])
        seq = iter(())
    else:
        seq = iter((r, c) for r in range(max_rows) for c in range(width))
        r, c = next(seq)
        blocks.append([r, c, row_start[r] + c * row_size(r), row_size(r),
                       bytearray(), hdr_ov])
    ids: list[bytes] = []
    for o in objects:
        blk = blocks[-1]
        if blk[5] + len(o) > blk[3]:
            try:
                r, c = next(seq)
            except StopIteration:
                raise ValueError(
                    "objects exceed the direct-row heap capacity; raise "
                    "max_direct or width"
                ) from None
            blk = [r, c, row_start[r] + c * row_size(r), row_size(r),
                   bytearray(), hdr_ov]
            blocks.append(blk)
            if len(o) + hdr_ov > blk[3]:
                raise ValueError(
                    f"{len(o)}-byte object larger than a direct block"
                )
        heap_off = blk[2] + blk[5]
        blk[4] += o
        blk[5] += len(o)
        ids.append(
            bytes([0x00])
            + heap_off.to_bytes(off_size, "little")
            + len(o).to_bytes(len_size, "little")
        )
    cur_rows = 0 if single else blocks[-1][0] + 1
    span = blocks[-1][2] + blocks[-1][3]

    def dblock(blk: list, addr_of_hdr: int) -> bytes:
        body = bytearray(
            b"FHDB" + bytes([0]) + struct.pack("<Q", addr_of_hdr)
            + blk[2].to_bytes(off_size, "little")
        )
        if checksum:
            body += b"\x00\x00\x00\x00"
        body += blk[4]
        body += b"\x00" * (blk[3] - len(body))
        if checksum:
            cs_at = 13 + off_size
            struct.pack_into("<I", body, cs_at, _lookup3(bytes(body)))
        return bytes(body)

    tail = bytearray()
    if single:
        root_addr = base + 146
        tail += dblock(blocks[0], base)
    else:
        ib_size = 13 + off_size + cur_rows * width * 8 + 4
        root_addr = base + 146
        daddr = root_addr + ib_size
        addr_of: dict[tuple[int, int], int] = {}
        for blk in blocks:
            addr_of[(blk[0], blk[1])] = daddr
            daddr += blk[3]
        ib = (b"FHIB" + bytes([0]) + struct.pack("<Q", base)
              + (0).to_bytes(off_size, "little"))
        for r in range(cur_rows):
            for c in range(width):
                ib += struct.pack("<Q", addr_of.get((r, c), _UNDEF))
        assert len(ib) + 4 == ib_size
        tail += ib + struct.pack("<I", _lookup3(ib))
        for blk in blocks:
            tail += dblock(blk, base)

    hdr = bytearray(146 - 4)
    hdr[0:4] = b"FRHP"
    hdr[4] = 0
    struct.pack_into("<H", hdr, 5, id_len)
    struct.pack_into("<H", hdr, 7, 0)  # no I/O filters
    hdr[9] = 0x2 if checksum else 0
    struct.pack_into("<I", hdr, 10, max_direct)  # max managed obj size
    struct.pack_into("<Q", hdr, 14, 0)           # next huge id
    struct.pack_into("<Q", hdr, 22, _UNDEF)      # huge bt2
    struct.pack_into("<Q", hdr, 30, 0)           # free space
    struct.pack_into("<Q", hdr, 38, _UNDEF)      # free-space manager
    struct.pack_into("<Q", hdr, 46, span)        # managed space
    struct.pack_into("<Q", hdr, 54, span if not single
                     else blocks[0][3])          # ALLOCATED managed
    struct.pack_into("<Q", hdr, 62, span)        # iterator offset
    struct.pack_into("<Q", hdr, 70, len(objects))
    # huge/tiny sizes+counts (78..110) stay zero
    struct.pack_into("<H", hdr, 110, width)
    struct.pack_into("<Q", hdr, 112, start_size)
    struct.pack_into("<Q", hdr, 120, max_direct)
    struct.pack_into("<H", hdr, 128, max_heap_bits)
    struct.pack_into("<H", hdr, 130, 1)          # starting root rows
    struct.pack_into("<Q", hdr, 132, root_addr)
    struct.pack_into("<H", hdr, 140, cur_rows)
    blob = bytes(hdr) + struct.pack("<I", _lookup3(bytes(hdr)))
    return blob + bytes(tail), ids, id_len


def _write_hdf5_dense_group(
    path: str,
    mats: dict[str, np.ndarray],
    *,
    dtype: str = "<f4",
    start_block_size: int = 512,
    max_direct_size: int = 4096,
    width: int = 4,
    bt2_node_size: int = 512,
    checksum_dblocks: bool = True,
) -> None:
    """Fixture writer for DENSE groups ('latest'-libver groups past the
    compact-link bound): superblock v3, a root group whose Link Info
    message points at a fractal heap of link messages + a type-5
    name-index v2 B-tree, and one contiguous-layout dataset per entry.
    The group-iteration machinery is the feature under test; datasets
    stay contiguous to keep the fixture orthogonal to the chunk-index
    tests."""
    np_dt = np.dtype(dtype)
    names = sorted(mats)
    if not names:
        raise ValueError("refusing to write an empty dense group")

    def dset_hdr(mat: np.ndarray, data_addr: int) -> bytes:
        n, dim = mat.shape
        space = (bytes([2, 2, 1, 1]) + struct.pack("<QQ", n, dim)
                 + struct.pack("<QQ", n, dim))
        lay = (bytes([3, 1]) + struct.pack("<Q", data_addr)
               + struct.pack("<Q", n * dim * np_dt.itemsize))
        return _ohdr_v2_bytes([
            (0x0001, space), (0x0003, _datatype_msg_body(np_dt)),
            (0x0008, lay),
        ])

    root_addr = 48

    def root_hdr(fh: int, bt: int) -> bytes:
        li = bytes([0, 0]) + struct.pack("<QQ", fh, bt)
        return _ohdr_v2_bytes([(0x0002, li)])

    cur = root_addr + len(root_hdr(0, 0))
    dset_addrs: dict[str, int] = {}
    for nm in names:
        dset_addrs[nm] = cur
        cur += len(dset_hdr(mats[nm], 0))
    cur = (cur + 7) & ~7
    data_addrs: dict[str, int] = {}
    for nm in names:
        data_addrs[nm] = cur
        cur += mats[nm].size * np_dt.itemsize
    fh_addr = (cur + 7) & ~7
    blobs = [
        bytes([1, 0, len(nm.encode())]) + nm.encode()
        + struct.pack("<Q", dset_addrs[nm])
        for nm in names
    ]
    heap_blob, ids, id_len = _fheap_bytes(
        fh_addr, blobs, start_size=start_block_size,
        max_direct=max_direct_size, width=width,
        checksum=checksum_dblocks,
    )
    bt2_addr = fh_addr + len(heap_blob)
    recs = sorted(
        struct.pack("<I", _lookup3(nm.encode())) + hid
        for nm, hid in zip(names, ids)
    )
    bt2_blob = _bt2_tree_bytes(bt2_addr, recs, 4 + id_len, 5,
                               bt2_node_size)
    eof = bt2_addr + len(bt2_blob)
    with open(path, "wb") as f:
        sb = _SIG + bytes([3, 8, 8, 0])
        sb += struct.pack("<QQQQ", 0, _UNDEF, eof, root_addr)
        f.write(sb + struct.pack("<I", _lookup3(sb)))
        f.write(root_hdr(fh_addr, bt2_addr))
        for nm in names:
            assert f.tell() == dset_addrs[nm]
            f.write(dset_hdr(mats[nm], data_addrs[nm]))
        f.write(b"\x00" * (data_addrs[names[0]] - f.tell()))
        for nm in names:
            assert f.tell() == data_addrs[nm]
            f.write(mats[nm].astype(np_dt, copy=False).tobytes())
        f.write(b"\x00" * (fh_addr - f.tell()))
        f.write(heap_blob)
        assert f.tell() == bt2_addr
        f.write(bt2_blob)
        assert f.tell() == eof


def _read_dataset_matrix(path: str, d: Hdf5Dataset) -> np.ndarray:
    """Materialize one 2-D dataset fully into memory (contiguous pread
    or chunk assembly) — the per-shard executor read behind
    read_hdf5_sharded; shard files are task-sized by construction."""
    n, dim = d.shape
    np_dt = np.dtype(d.dtype)
    if d.chunk_shape is None:
        return np.fromfile(
            path, dtype=np_dt, count=n * dim, offset=d.data_offset
        ).reshape(n, dim)
    cr, cc = d.chunk_shape
    if d.fill is not None:
        out = np.full(
            (n, dim), np.frombuffer(d.fill, dtype=np_dt, count=1)[0],
            dtype=np_dt,
        )
    else:
        out = np.zeros((n, dim), dtype=np_dt)
    with open(path, "rb") as f:
        for (ro, co), off, nb, mask in d.chunks:
            f.seek(off)
            raw = _decode_chunk(f.read(nb), list(d.filters), mask)
            arr = np.frombuffer(raw, dtype=np_dt)[: cr * cc].reshape(cr, cc)
            rv, cv = min(cr, n - ro), min(cc, dim - co)
            out[ro:ro + rv, co:co + cv] = arr[:rv, :cv]
    return out


def write_hdf5_sharded(
    df: DataFrame,
    dir_path: str,
    *,
    dataset: str = "train",
    dtype: str = "<f4",
    rows_per_shard: int = 65536,
    compression: str | None = None,
    chunks: tuple[int, int] | None = None,
    shuffle: bool = False,
    fletcher32: bool = False,
    chunk_index: str | None = None,
) -> dict:
    """Distributed HDF5 export: EXECUTORS write one single-dataset
    .hdf5 part file per contiguous id range (shard k holds ids
    [k*rows_per_shard, (k+1)*rows_per_shard)), plus a manifest.json —
    the fvecs write_vecs_sharded treatment applied to HDF5, removing
    write_hdf5_vectors' driver-side toPandas bound. Each part file is
    an independently valid HDF5 file any consumer can open.

    Same id contract as the single-file writer, validated DISTRIBUTED:
    each shard task checks its group is exactly its expected id range,
    and the driver checks shards 0..S-1 are all present with all but
    the last full — together proving global contiguity 0..n-1. The
    directory must be a shared filesystem in cluster mode (the sink
    assumption every bulk export here makes). Optional chunking/
    filters apply per part file. Returns the manifest."""
    import json as _json

    from pyspark.sql import functions as F

    name = dataset.lstrip("/")
    if not name or "/" in name:
        raise ValueError("writer supports a single root-level dataset name")
    if compression not in (None, "gzip", "lzf"):
        raise NotImplementedError(
            f"compression {compression!r} unsupported (only 'gzip'/'lzf')"
        )
    os.makedirs(dir_path, exist_ok=True)
    rps = int(rows_per_shard)
    sharded = df.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding").alias("embedding"),
        (F.col("vec_id").cast("long") / rps).cast("long").alias("_shard"),
    )

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["_shard"].iat[0])
        order = np.argsort(pdf["vec_id"].to_numpy(), kind="stable")
        ids = pdf["vec_id"].to_numpy()[order]
        start = shard * rps
        if not (ids == np.arange(start, start + len(ids))).all():
            raise ValueError(
                f"shard {shard}: ids are not the contiguous range "
                f"[{start}, {start + len(ids)}) — the HDF5 export carries "
                "no ids; re-key with row_number() before export"
            )
        mat = np.stack([
            np.asarray(v, dtype=np.dtype(dtype))
            for v in pdf["embedding"].iloc[order]
        ])
        ck = chunks
        if ck is not None:
            ck = (min(int(ck[0]), len(ids)), int(ck[1]))
        fname = os.path.join(dir_path, f"part-{shard:05d}.hdf5")
        tmp = fname + ".tmp"
        if chunk_index is not None:
            _write_hdf5_matrix_v4(
                tmp, name, mat, dtype=dtype, chunks=ck,
                index=chunk_index, compression=compression,
                shuffle=shuffle, fletcher32=fletcher32,
            )
        else:
            _write_hdf5_matrix(
                tmp, name, mat, dtype=dtype, chunks=ck,
                compression=compression, shuffle=shuffle,
                fletcher32=fletcher32,
            )
        os.replace(tmp, fname)
        return pd.DataFrame({
            "shard": [shard], "file": [os.path.basename(fname)],
            "start": [start], "rows": [len(ids)],
            "dim": [int(mat.shape[1])],
        })

    parts = sorted(
        (r["shard"], r["file"], r["start"], r["rows"], r["dim"])
        for r in sharded.groupBy("_shard").applyInPandas(
            write_shard,
            "shard long, file string, start long, rows long, dim long",
        ).collect()
    )
    if not parts:
        raise ValueError("write_hdf5_sharded: empty DataFrame")
    dims = {p[4] for p in parts}
    if len(dims) != 1:
        raise ValueError(f"mixed vector dims across shards: {sorted(dims)}")
    for i, p in enumerate(parts):
        if p[0] != i or (i < len(parts) - 1 and p[3] != rps):
            raise ValueError(
                "shards do not form a contiguous full sequence: "
                f"shard {p[0]} rows={p[3]} at position {i}"
            )
    manifest = {
        "format": "hdf5", "dataset": name, "dtype": dtype,
        "dim": int(parts[0][4]), "rows_per_shard": rps,
        "total_rows": int(sum(p[3] for p in parts)),
        "shards": [
            {"file": f, "start": int(s), "rows": int(r)}
            for _, f, s, r, _ in parts
        ],
    }
    tmp = os.path.join(dir_path, "manifest.json.tmp")
    with open(tmp, "w") as f:
        _json.dump(manifest, f, indent=2)
    os.replace(tmp, os.path.join(dir_path, "manifest.json"))
    return manifest


def read_hdf5_sharded(spark: SparkSession, dir_path: str) -> DataFrame:
    """Distributed reader for a write_hdf5_sharded directory: one task
    per part file (shards are rows_per_shard-bounded, i.e. already
    task-sized by construction); each EXECUTOR probes its own file's
    metadata and materializes the dataset — the driver touches only
    manifest.json."""
    import json as _json

    with open(os.path.join(dir_path, "manifest.json")) as f:
        manifest = _json.load(f)
    name, dim = manifest["dataset"], int(manifest["dim"])
    spec = spark.createDataFrame(
        [(sh["file"], int(sh["start"]), int(sh["rows"]))
         for sh in manifest["shards"]],
        "file string, id_start long, rows long",
    )

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for fname, id_start, rows in zip(
                b["file"], b["id_start"], b["rows"]
            ):
                p = os.path.join(dir_path, fname)
                d = probe_hdf5(p)[name]
                if d.shape != (int(rows), dim):
                    raise ValueError(
                        f"{fname}: shape {d.shape} != manifest "
                        f"({int(rows)}, {dim})"
                    )
                mat = _read_dataset_matrix(p, d).astype(np.float32)
                ids = np.arange(
                    int(id_start), int(id_start) + int(rows),
                    dtype=np.int64,
                )
                yield pd.DataFrame({"vec_id": ids, "embedding": list(mat)})

    return (
        spec.repartition("file")
        .mapInPandas(_scan, "vec_id long, embedding array<float>")
    )
