"""JSONL (newline-delimited JSON) source/sink — the interchange format
of LLM training-data pipelines (web-crawl dumps, instruction datasets,
eval sets all ship as .jsonl / .jsonl.gz).

Spark's native json reader/writer IS line-delimited; this module pins
the engine-facing contract on top of it:
  - reads are SCHEMA-ENFORCED, never inferred — inference costs an
    extra full pass over 100 TB and silently widens types; a pipeline
    declares its document schema once
  - strict mode fails fast on corrupt lines (FAILFAST); permissive mode
    keeps them as nulls with the raw line in `_corrupt_record` for a
    quarantine sink
  - compression by extension (.gz/.zst) on read; writer takes an
    explicit codec

Scale notes (100 TB):
  - Uncompressed/bzip2 JSONL is splittable (many tasks per file); gzip
    is one task per file — at scale, write MANY gzip files (the
    default: one per partition) rather than few big ones
  - Parquet remains the engine's storage format (columnar pruning /
    pushdown); JSONL is the ingest/egress boundary. A pipeline lands
    JSONL once, converts to parquet, and never re-reads the JSON.

Reference: the ingest boundary analog of the reference's offline HDF5
source (rs/index_writer/src/input/mod.rs:8-13) — same role, the
format the surrounding ecosystem actually uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, StringType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    strict: bool = True,
) -> DataFrame:
    """Schema-enforced JSONL read. strict=True fails the job on the
    first corrupt line; strict=False yields null-filled rows carrying
    the raw line in `_corrupt_record` (filter on it to quarantine)."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    reader = spark.read
    if strict:
        return reader.schema(schema).option("mode", "FAILFAST").json(path)
    with_corrupt = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    return (
        reader.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, bad) split of a permissive read: bad rows are the corrupt
    lines (raw text preserved for a quarantine sink)."""
    if CORRUPT_COL not in df.columns:
        raise ValueError("quarantine_split expects a strict=False read_jsonl result")
    # PERMISSIVE parsing marks corrupt lines by populating CORRUPT_COL;
    # Spark requires a cache/materialization barrier before referencing
    # it in a filter (SPARK-21610: the pruned-scan shortcut would
    # otherwise return no rows)
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    compression: str | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """One JSON object per line, one file per partition (so a gzip
    output stays parallel-readable file-by-file)."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)
