"""HDF5 offline vector source (S8) — the reference's index_writer reads
training vectors from HDF5 files (rs/index_writer/src/input/hdf5.rs,
driver index_writer.rs:429).

This environment ships no HDF5 bindings (h5py/pytables absent), so the
reader is gated: it fails loudly at call time with the exact dependency
needed. The offline-ingest ROLE is filled by sources/fvecs.py (the
standard fvecs/bvecs/ivecs corpus format, distributed byte-range
reader, oracle-gated by src2_fvecs_roundtrip) and sources/jsonl.py;
Parquet is the native fixture format everywhere else (SURVEY §2.1 S8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _try_import_h5py():
    try:
        import h5py  # noqa: F401

        return h5py
    except ImportError:
        return None


def read_hdf5_vectors(
    spark: SparkSession,
    path: str,
    *,
    dataset: str = "train",
    id_offset: int = 0,
    batch_rows: int = 65536,
) -> DataFrame:
    """Load an HDF5 dataset of shape (n, dim) as (vec_id, embedding).

    Requires h5py (not installed here — raises NotImplementedError with
    the dependency named). Reads in bounded row batches and parallelizes
    through createDataFrame so only one batch is driver-resident at a
    time.
    """
    h5py = _try_import_h5py()
    if h5py is None:
        raise NotImplementedError(
            "HDF5 ingestion requires h5py, which is not installed in this "
            "environment; convert to parquet offline or install h5py. "
            "(Fixture data is parquet — see spark.read.parquet.)"
        )

    dfs = []  # pragma: no cover — exercised only where h5py exists
    with h5py.File(path, "r") as f:  # pragma: no cover
        ds = f[dataset]
        for start in range(0, ds.shape[0], batch_rows):
            chunk = ds[start:start + batch_rows]
            rows = [
                (id_offset + start + i, [float(x) for x in chunk[i]])
                for i in range(chunk.shape[0])
            ]
            dfs.append(spark.createDataFrame(rows, "vec_id long, embedding array<float>"))
    out = dfs[0]  # pragma: no cover
    for d in dfs[1:]:  # pragma: no cover
        out = out.unionByName(d)
    return out  # pragma: no cover
