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


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def decode_image(media: DataFrame, *, max_side: int = 256) -> DataFrame:
    """Decode + resize images to (doc_id, width, height, pixels).

    With PIL installed, any PIL-readable format decodes. WITHOUT PIL
    (this environment), PNG payloads decode through the pure-stdlib
    spec codec in operators/image.py (zlib + struct — the same
    public-spec treatment as sources/hdf5.py); non-PNG payloads raise
    NotImplementedError at execution naming the limitation. Resize is
    thumbnail-style (shrink-only, aspect preserved, area average) —
    not bit-identical to PIL's resampling, but the same contract.
    """
    pil = _try_import_pil()
    if pil is None:
        from muopdb_spark.operators.image import (
            area_resize, decode_png, _PNG_MAGIC,
        )

        def gen_pure(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"doc_id": [], "width": [], "height": [], "pixels": []}
                for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                    data = bytes(blob)
                    if data[:8] != _PNG_MAGIC:
                        raise NotImplementedError(
                            "decode_image without PIL supports PNG only; "
                            f"payload for doc_id={doc_id} is not a PNG"
                        )
                    img = decode_png(data).astype(np.float64)
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
