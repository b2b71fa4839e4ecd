"""Packed binary vector ingestion — the InsertPacked fast path (S3).

The reference accepts ids/vectors as packed little-endian byte blobs to
skip per-element protobuf costs (muopdb.proto:199-216 InsertPackedRequest,
index_server.rs:572-676). Spark-first: the packed payload is a binary
column; decoding is `np.frombuffer` over Arrow batches in mapInPandas —
zero-copy from Arrow into numpy, no per-element Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pack_vectors(df: DataFrame, *, vec_col: str = "embedding") -> DataFrame:
    """Encode array<float> -> packed float32-LE binary (the wire form)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.drop(columns=[vec_col]).copy()
            vals = pdf[vec_col].tolist()
            try:
                # uniform-length fast path: ONE float32 conversion +
                # tobytes for the whole batch, sliced per row (no
                # per-row numpy allocs)
                X = np.asarray(vals, dtype="<f4")
                assert X.ndim == 2
                buf = X.tobytes()
                w = X.shape[1] * 4
                out["packed"] = [buf[i * w:(i + 1) * w] for i in range(X.shape[0])]
            except (ValueError, AssertionError):  # ragged input
                out["packed"] = [np.asarray(v, dtype="<f4").tobytes() for v in vals]
            yield out

    fields = [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
              if f.name != vec_col]
    return df.mapInPandas(gen, schema=", ".join(fields + ["packed binary"]))


def decode_packed_vectors(
    df: DataFrame, *, packed_col: str = "packed", num_features: int,
    out_col: str = "vector",
) -> DataFrame:
    """Decode packed float32-LE blobs -> array<float>, validating length
    (the reference rejects mis-sized payloads at the API edge)."""

    blob_len = num_features * 4

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # one frombuffer over the concatenated batch, not a per-row
            # Python loop: length validation is a vectorized compare and
            # the decode is a single zero-copy view + reshape
            lens = pdf[packed_col].map(len).to_numpy()
            if len(lens) and (lens != blob_len).any():
                bad = int(lens[lens != blob_len][0])
                raise ValueError(
                    f"packed blob of {bad} bytes != {blob_len} "
                    f"(num_features={num_features} float32s)"
                )
            mat = np.frombuffer(
                b"".join(pdf[packed_col]), dtype="<f4"
            ).reshape(-1, num_features)
            out = pdf.drop(columns=[packed_col]).copy()
            out[out_col] = list(mat)
            yield out

    fields = [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
              if f.name != packed_col]
    return df.mapInPandas(gen, schema=", ".join(fields + [f"{out_col} array<float>"]))
