"""JSONL source/sink: schema-enforced roundtrip, strict/permissive
corrupt-line handling, compression, partitioned layout."""

from __future__ import annotations

import gzip
import os

import pytest
from py4j.protocol import Py4JJavaError
from pyspark.sql import functions as F

from muopdb_spark.sources.jsonl import (
    quarantine_split,
    read_jsonl,
    write_jsonl,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_documents_roundtrip_exact(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    back = read_jsonl(spark, out, DOC_SCHEMA)
    assert back.count() == docs.count()
    assert back.exceptAll(docs.select(*back.columns)).count() == 0
    assert docs.select(*back.columns).exceptAll(back).count() == 0


def test_embedding_arrays_roundtrip(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = str(tmp_path / "emb_jsonl")
    write_jsonl(emb, out)
    back = read_jsonl(spark, out, emb.schema)
    assert back.exceptAll(emb).count() == 0 and emb.exceptAll(back).count() == 0


def test_strict_read_fails_on_corrupt_line(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-0.jsonl").write_text(
        '{"doc_id": 1, "text": "ok"}\n{not json at all\n'
    )
    with pytest.raises(Py4JJavaError):
        read_jsonl(spark, str(p), "doc_id long, text string").collect()


def test_permissive_read_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "mixed"
    p.mkdir()
    (p / "part-0.jsonl").write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "{broken\n"
        '{"doc_id": 2, "text": "fine"}\n'
    )
    df = read_jsonl(spark, str(p), "doc_id long, text string", strict=False)
    good, bad = quarantine_split(df)
    assert sorted(r.doc_id for r in good.collect()) == [1, 2]
    assert bad.count() == 1
    assert "{broken" in bad.collect()[0][0]


def test_gzip_write_and_read(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    out = str(tmp_path / "gz")
    write_jsonl(df, out, compression="gzip")
    files = [f for f in os.listdir(out) if f.endswith(".json.gz")]
    assert files, "expected gzip part files"
    # one file per partition, and partitions holding no rows write empty
    # parts — check the concatenated content, not an arbitrary part
    lines = []
    for name in files:
        with gzip.open(os.path.join(out, name), "rt") as f:
            lines.extend(line for line in f if line.strip())
    assert len(lines) == 2 and all(line.startswith("{") for line in lines)
    back = read_jsonl(spark, out, "doc_id long, text string")
    assert sorted(r.doc_id for r in back.collect()) == [1, 2]


def test_partitioned_write_layout(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "by_lang")
    write_jsonl(docs, out, partition_by=["lang"])
    langs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert len(langs) >= 2
    # partition column restored on read (Spark dir-partition discovery)
    back = read_jsonl(spark, out, DOC_SCHEMA)
    assert back.filter(F.col("lang").isNull()).count() == 0
    assert back.count() == docs.count()
