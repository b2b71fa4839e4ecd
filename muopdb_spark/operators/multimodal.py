"""Multimodal column support: opaque binary payloads + typed metadata,
with decode / feature-extract / resize / frame-sample plumbing.

Design (per BASELINE.json north star): image/audio/video payloads are
`binary` columns with typed metadata columns beside them. All Spark-side
plumbing — schema, partitioning, Arrow batch shape, UDF signatures — is
real and tested. The actual codec step is STUBBED: PIL/ffmpeg-style
libraries are not available in this environment, so `decode_image`
raises NotImplementedError unless a decoder is importable, and the
tested path uses deterministic byte-level fakes (byte histograms, fixed
chunking) that exercise identical plumbing.

Scale notes: payload bytes ride Arrow record batches into mapInPandas —
no per-row Python, no driver collect; `spark.sql.files.maxPartitionBytes`
and `maxRecordsPerBatch` bound executor memory per batch. Feature
extraction is embarrassingly parallel; frame sampling explodes rows
map-side.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, content binary, n_bytes long"
)


def media_table(
    df: DataFrame, *, payload_col: str = "text", id_col: str = "doc_id",
    media_type: str = "text/plain",
) -> DataFrame:
    """Wrap a payload column as the canonical media table:
    (doc_id, media_type, content binary, n_bytes)."""
    content = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit(media_type).alias("media_type"),
        content.alias("content"),
        F.length(content).cast("long").alias("n_bytes"),
    )


def byte_stats(media: DataFrame) -> DataFrame:
    """Cheap metadata pass, pure Column exprs: size + content digest."""
    return media.select(
        "doc_id", "media_type", "n_bytes",
        F.md5("content").alias("digest"),
    )


def byte_histogram(media: DataFrame, *, bins: int = 16) -> DataFrame:
    """Deterministic 'feature extraction' over binary payloads: a
    bins-bucket byte-value histogram per document via mapInPandas.
    This is the stand-in for image/audio feature extraction — identical
    batch shape, schema handling, and parallelism; only the numpy body
    would change for a real decoder."""
    assert 256 % bins == 0
    width = 256 // bins

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["content"]:
                if b is None or len(b) == 0:
                    feats.append([0] * bins)
                else:
                    arr = np.frombuffer(bytes(b), dtype=np.uint8)
                    feats.append(np.bincount(arr // width, minlength=bins).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return media.mapInPandas(gen, schema="doc_id long, features array<long>")


def frame_sample(
    media: DataFrame, *, frame_bytes: int = 64, every_n: int = 4,
) -> DataFrame:
    """'Video frame sampling' plumbing: slice the payload into fixed-size
    chunks (frames) and keep every n-th — exploded map-side to
    (doc_id, frame_idx, frame binary). A real video decoder would replace
    the slicing body only; partitioning and schema are the real thing."""
    n_frames = F.ceil(F.col("n_bytes") / F.lit(frame_bytes)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
    sampled = F.filter(idx, lambda i: i % every_n == 0)
    return (
        media.filter(F.col("n_bytes") > 0)
        .select(
            "doc_id",
            F.explode(sampled).alias("frame_idx"),
            F.col("content"),
        )
        .select(
            "doc_id", "frame_idx",
            F.expr(f"substring(content, frame_idx * {frame_bytes} + 1, {frame_bytes})")
            .alias("frame"),
        )
    )


def _probe_png(data: bytes) -> dict | None:
    if data[:8] != b"\x89PNG\r\n\x1a\n" or len(data) < 33:
        return None
    import struct

    if data[12:16] != b"IHDR":
        return None
    w, h, _depth, color_type = struct.unpack(">IIBB", data[16:26])
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    return {"format": "png", "width": w, "height": h, "channels": channels}


def _probe_jpeg(data: bytes) -> dict | None:
    """Walk JFIF marker segments to the first SOFn frame header (the
    public JPEG/ISO 10918 marker grammar): height/width/components
    live there; entropy-coded data is never touched."""
    if data[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 2 <= len(data):
        if data[i] != 0xFF:
            return None  # marker desync: not a well-formed stream
        # spec-legal 0xFF fill bytes may pad before any marker
        while i + 2 <= len(data) and data[i + 1] == 0xFF:
            i += 1
        if i + 2 > len(data):
            return None
        m = data[i + 1]
        if m == 0xD9 or m == 0xDA:  # EOI / SOS: no SOF seen
            return {"format": "jpeg", "width": None, "height": None,
                    "channels": None}
        if m in (0x01,) or 0xD0 <= m <= 0xD8:
            i += 2
            continue
        if i + 4 > len(data):
            return None
        ln = int.from_bytes(data[i + 2:i + 4], "big")
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            if i + 10 > len(data):
                return None
            h = int.from_bytes(data[i + 5:i + 7], "big")
            w = int.from_bytes(data[i + 7:i + 9], "big")
            return {"format": "jpeg", "width": w, "height": h,
                    "channels": data[i + 9]}
        i += 2 + ln
    return None


def _probe_gif(data: bytes) -> dict | None:
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 10:
        return None
    return {
        "format": "gif",
        "width": int.from_bytes(data[6:8], "little"),
        "height": int.from_bytes(data[8:10], "little"),
        "channels": 3,
    }


def _probe_bmp(data: bytes) -> dict | None:
    if data[:2] != b"BM" or len(data) < 26:
        return None
    # negative height is valid (top-down rows); negative width is not —
    # treat it as malformed so the payload lands as format='unknown'
    width = int.from_bytes(data[18:22], "little", signed=True)
    if width < 0:
        return None
    return {
        "format": "bmp",
        "width": width,
        "height": abs(int.from_bytes(data[22:26], "little", signed=True)),
        "channels": 3,
    }


def _probe_wav(data: bytes) -> dict | None:
    """fmt/data chunk headers only — no sample reads."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(data):
        cid, ln = struct.unpack("<4sI", data[pos:pos + 8])
        if cid == b"fmt " and ln >= 16:
            fmt = struct.unpack("<HHIIHH", data[pos + 8:pos + 24])
        elif cid == b"data":
            data_len = ln
        pos += 8 + ln + (ln & 1)
    if fmt is None:
        return None
    _tag, ch, rate, _br, balign, _bits = fmt
    out = {"format": "wav", "channels": ch, "sample_rate": rate}
    if data_len is not None and balign and rate:
        out["duration_s"] = round(data_len / balign / rate, 6)
    return out


def _probe_mp4(data: bytes) -> dict | None:
    """ISO BMFF box walk: ftyp confirms the container; moov/mvhd gives
    duration (timescale-normalized), trak/tkhd gives track dimensions
    (16.16 fixed point). Media data (mdat) is never touched."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        return None

    def boxes(start: int, end: int):
        p = start
        while p + 8 <= end:
            size = int.from_bytes(data[p:p + 4], "big")
            if size < 8 or p + size > end:
                return
            yield data[p + 4:p + 8], p + 8, p + size
            p += size

    out: dict = {"format": "mp4"}
    for typ, s, e in boxes(0, len(data)):
        if typ != b"moov":
            continue
        for t2, s2, e2 in boxes(s, e):
            if t2 == b"mvhd" and e2 - s2 >= 20:
                ver = data[s2]
                if ver == 1:
                    ts = int.from_bytes(data[s2 + 20:s2 + 24], "big")
                    dur = int.from_bytes(data[s2 + 24:s2 + 32], "big")
                else:
                    ts = int.from_bytes(data[s2 + 12:s2 + 16], "big")
                    dur = int.from_bytes(data[s2 + 16:s2 + 20], "big")
                if ts:
                    out["duration_s"] = round(dur / ts, 6)
            elif t2 == b"trak":
                for t3, s3, e3 in boxes(s2, e2):
                    if t3 == b"tkhd" and e3 - s3 >= 8:
                        w = int.from_bytes(data[e3 - 8:e3 - 4], "big") >> 16
                        h = int.from_bytes(data[e3 - 4:e3], "big") >> 16
                        if w and h:
                            out["width"], out["height"] = w, h
    return out


def _probe_avi(data: bytes) -> dict | None:
    from muopdb_spark.operators.video import probe_avi

    return probe_avi(data)


def _probe_pdf(data: bytes) -> dict | None:
    """%PDF- magic -> format='pdf' with the first page's MediaBox as
    width/height (PDF points). Malformed-but-magic'd payloads still
    triage as pdf with null dims — the probe contract is total."""
    if not data.startswith(b"%PDF-"):
        return None
    out = {"format": "pdf"}
    try:
        from muopdb_spark.operators.pdf import pdf_info

        info = pdf_info(data)
        out["width"] = info["width"]
        out["height"] = info["height"]
    except Exception:
        pass
    return out


def _probe_webp(data: bytes) -> dict | None:
    """RIFF/WEBP header triage (public container spec): VP8 lossy
    frame tag, VP8L lossless signature, VP8X extended canvas — dims
    only, no bitstream decode."""
    import struct

    if len(data) < 25 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        return None
    chunk = data[12:16]
    out = {"format": "webp", "channels": 3}
    if chunk == b"VP8X" and len(data) >= 30:
        w = int.from_bytes(data[24:27], "little") + 1
        h = int.from_bytes(data[27:30], "little") + 1
        out.update(width=w, height=h)
        return out
    if chunk == b"VP8L" and data[20:21] == b"\x2f":
        bits = int.from_bytes(data[21:25], "little")
        out.update(
            width=(bits & 0x3FFF) + 1, height=((bits >> 14) & 0x3FFF) + 1
        )
        return out
    if (chunk == b"VP8 " and len(data) >= 30
            and data[23:26] == b"\x9d\x01\x2a"):
        w, h = struct.unpack("<HH", data[26:30])
        out.update(width=w & 0x3FFF, height=h & 0x3FFF)
        return out
    # a WEBP container with an unrecognized first chunk: still webp
    return out


def _probe_tiff(data: bytes) -> dict | None:
    """TIFF header + first-IFD walk for ImageWidth/ImageLength (tags
    256/257, SHORT or LONG) — classic TIFF only; BigTIFF (version 43)
    is left to format='unknown'."""
    import struct

    if len(data) < 8:
        return None
    if data[:4] == b"II*\x00":
        end = "<"
    elif data[:4] == b"MM\x00*":
        end = ">"
    else:
        return None
    out = {"format": "tiff", "channels": 3}
    try:
        (ifd_off,) = struct.unpack(end + "I", data[4:8])
        (n,) = struct.unpack(end + "H", data[ifd_off:ifd_off + 2])
        for i in range(min(n, 256)):
            e = ifd_off + 2 + 12 * i
            tag, typ = struct.unpack(end + "HH", data[e:e + 4])
            if tag not in (256, 257):
                continue
            if typ == 3:  # SHORT
                (v,) = struct.unpack(end + "H", data[e + 8:e + 10])
            elif typ == 4:  # LONG
                (v,) = struct.unpack(end + "I", data[e + 8:e + 12])
            else:
                continue
            out["width" if tag == 256 else "height"] = int(v)
    except (struct.error, IndexError):
        return out if len(out) > 2 else None
    return out


def _probe_ico(data: bytes) -> dict | None:
    """ICO/CUR directory header: first image entry's dims (0 encodes
    256 per the format)."""
    if len(data) < 22 or data[:4] not in (b"\x00\x00\x01\x00",
                                          b"\x00\x00\x02\x00"):
        return None
    n = int.from_bytes(data[4:6], "little")
    if n == 0:
        return None
    w, h = data[6], data[7]
    return {
        "format": "ico" if data[2] == 1 else "cur",
        "width": w or 256,
        "height": h or 256,
        "channels": 3,
    }


_PROBES = (_probe_png, _probe_jpeg, _probe_gif, _probe_bmp, _probe_wav,
           _probe_mp4, _probe_avi, _probe_pdf, _probe_webp, _probe_tiff,
           _probe_ico)

PROBE_SCHEMA = (
    "doc_id long, format string, width int, height int, channels int, "
    "sample_rate int, duration_s double, n_bytes long"
)


def media_probe(media: DataFrame, *, content_col: str = "content",
                id_col: str = "doc_id") -> DataFrame:
    """Typed-metadata extraction over opaque binary payloads, NO codec
    required: sniffs the container format from magic bytes and parses
    only structural headers — PNG IHDR, JPEG SOFn marker walk, GIF/BMP
    headers, WAV fmt/data chunks (duration without reading samples),
    MP4 ISO-BMFF box walk (mvhd duration, tkhd track dimensions).
    Returns (doc_id, format, width, height, channels, sample_rate,
    duration_s, n_bytes) with nulls where a field does not apply;
    unrecognized payloads get format='unknown', never an error — this
    is the triage pass a 100 TB mixed-media crawl runs FIRST, so it
    must be total. Arrow-batched mapInPandas, executor-side, byte
    reads bounded by header sizes."""
    cols = ["format", "width", "height", "channels", "sample_rate",
            "duration_s"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "n_bytes": []}
            for c in cols:
                out[c] = []
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                data = bytes(blob) if blob is not None else b""
                info = None
                for probe in _PROBES:
                    try:
                        info = probe(data)
                    except Exception:
                        info = None
                    if info is not None:
                        break
                info = info or {"format": "unknown"}
                out["doc_id"].append(did)
                out["n_bytes"].append(len(data))
                for c in cols:
                    out[c].append(info.get(c))
            yield pd.DataFrame(out)

    return media.select(
        F.col(id_col).alias("doc_id"), F.col(content_col).alias(content_col)
    ).mapInPandas(gen, schema=PROBE_SCHEMA)


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def decode_image(media: DataFrame, *, max_side: int = 256) -> DataFrame:
    """Decode + resize images to (doc_id, width, height, pixels).

    With PIL installed, any PIL-readable format decodes. WITHOUT PIL
    (this environment), PNG and baseline-JPEG payloads decode through
    the pure-stdlib spec codecs in operators/image.py and
    operators/jpeg.py (the same public-spec treatment as
    sources/hdf5.py); other payloads raise NotImplementedError at
    execution naming the magic. Resize is thumbnail-style (shrink-only,
    aspect preserved, area average) — not bit-identical to PIL's
    resampling, but the same contract.
    """
    pil = _try_import_pil()
    if pil is None:
        from muopdb_spark.operators.image import (
            area_resize, decode_image_bytes,
        )

        def gen_pure(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"doc_id": [], "width": [], "height": [], "pixels": []}
                for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                    img = decode_image_bytes(bytes(blob)).astype(np.float64)
                    h, w = img.shape[:2]
                    if max(h, w) > max_side:
                        s = max_side / max(h, w)
                        nh, nw = max(1, round(h * s)), max(1, round(w * s))
                        if img.ndim == 2:
                            img = area_resize(img, nh, nw)
                        else:
                            img = np.stack(
                                [area_resize(img[:, :, c], nh, nw)
                                 for c in range(img.shape[2])], axis=2,
                            )
                    out["doc_id"].append(doc_id)
                    out["height"].append(img.shape[0])
                    out["width"].append(img.shape[1])
                    out["pixels"].append(
                        np.rint(img).astype(np.int64).ravel().tolist()
                    )
                yield pd.DataFrame(out)

        return media.mapInPandas(
            gen_pure,
            schema="doc_id long, width int, height int, pixels array<long>",
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        import io

        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "pixels": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                img = pil.open(io.BytesIO(blob))
                img.thumbnail((max_side, max_side))
                out["doc_id"].append(doc_id)
                out["width"].append(img.width)
                out["height"].append(img.height)
                out["pixels"].append(np.asarray(img).astype(np.int64).ravel().tolist())
            yield pd.DataFrame(out)

    return media.mapInPandas(
        gen, schema="doc_id long, width int, height int, pixels array<long>"
    )
