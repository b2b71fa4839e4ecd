"""Deterministic shard export (operators/export.py): reproducibility,
shard bounds, positional contiguity, and the written layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from muopdb_spark.operators.export import shard_assignment, write_shards


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_deterministic_and_contiguous(spark, docs):
    a = shard_assignment(docs, n_shards=8).collect()
    b = shard_assignment(docs, n_shards=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_shard: dict[int, list[int]] = {}
    for r in a:
        assert 0 <= r.shard_id < 8
        by_shard.setdefault(r.shard_id, []).append(r.position)
    # positions are 1..len(shard) with no gaps, all shards populated
    assert len(by_shard) == 8
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_seed_changes_order(spark, docs):
    a = {r.doc_id: (r.shard_id, r.position)
         for r in shard_assignment(docs, seed="shard-v1").collect()}
    b = {r.doc_id: (r.shard_id, r.position)
         for r in shard_assignment(docs, seed="shard-v2").collect()}
    assert a != b  # a new seed is a new shuffle


def test_append_stability(spark, docs):
    # old rows keep their shard when the corpus grows: assignment is a
    # pure function of (seed, id)
    half = docs.filter(F.col("doc_id") % 2 == 0)
    full = {r.doc_id: r.shard_id for r in shard_assignment(docs).collect()}
    part = {r.doc_id: r.shard_id for r in shard_assignment(half).collect()}
    assert all(full[i] == s for i, s in part.items())


def test_shard_bound_validation(spark, docs):
    with pytest.raises(ValueError):
        shard_assignment(docs, n_shards=65537)


def test_no_systematic_skew_when_shards_dont_divide_256(spark):
    # regression for the 2-hex-char key: with 256 buckets mod 100, 56
    # shards got 3 buckets and 44 got 2 — a deterministic ~1.5x size
    # step for ANY corpus. The 32-bit key bounds mod-bias at 1 part in
    # 2^16, so shard sizes deviate from the mean only by ~sqrt
    # sampling noise. 20k ids, mean 200/shard: the old step would put
    # the large shards near 300 (1.5x); 6-sigma noise stays under 290.
    ids = spark.range(20_000).withColumnRenamed("id", "doc_id")
    counts = [
        r.n
        for r in shard_assignment(ids, n_shards=100)
        .groupBy("shard_id")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert len(counts) == 100
    mean = sum(counts) / len(counts)
    assert max(counts) < 1.45 * mean
    assert min(counts) > 0.55 * mean


def test_write_shards_layout(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    write_shards(docs.limit(200), out, n_shards=4)
    back = spark.read.parquet(out)
    assert back.count() == 200
    # every shard directory exists and rows inside are in training order
    pdf = back.select("shard_id", "position", "doc_id").toPandas()
    assert set(pdf.shard_id.unique()) == {0, 1, 2, 3}
    want = {
        (r.doc_id, r.shard_id, r.position)
        for r in shard_assignment(docs.limit(200), n_shards=4).collect()
    }
    got = {(r.doc_id, int(r.shard_id), r.position) for r in back.collect()}
    assert got == want


# --------------------------------- token-binary trainer handoff (r10)


def test_token_shards_roundtrip_and_determinism(spark, tmp_path):
    import numpy as np

    from muopdb_spark.operators.export import (
        read_token_shard,
        write_token_shards,
    )
    from muopdb_spark.operators.vocab import bpe_apply

    df = spark.createDataFrame(
        [(i, f"the quick brown fox number {i} jumps") for i in range(40)]
        + [(100, ""), (101, "solo")],
        "doc_id long, text string",
    )
    merges = [("t", "h"), ("th", "e</w>")]
    out1 = str(tmp_path / "tok1")
    man = write_token_shards(df, out1, merges, n_shards=4)
    rows = {r["shard_id"]: r for r in man.collect()}
    assert sum(r["n_docs"] for r in rows.values()) == 42
    # round trip: every doc's decoded subword stream equals bpe_apply's
    import json
    vocab = {int(k): v for k, v in
             json.load(open(f"{out1}/vocab.json")).items()}
    expect = {r["doc_id"]: list(r["bpe_tokens"])
              for r in bpe_apply(df, merges).collect()}
    seen = {}
    for sid in rows:
        ids, idx = read_token_shard(out1, sid)
        assert ids.dtype == np.dtype("<i4")
        off = 0
        for doc_id, n in idx:
            seen[int(doc_id)] = [vocab[int(t)] for t in ids[off:off + n]]
            off += int(n)
        assert off == len(ids)  # index prefix sums tile the stream
    assert seen == expect
    # deterministic re-export: byte-identical files
    out2 = str(tmp_path / "tok2")
    write_token_shards(df, out2, merges, n_shards=4)
    for sid in rows:
        for ext in ("bin", "idx"):
            a = open(f"{out1}/shard_{sid}.{ext}", "rb").read()
            b = open(f"{out2}/shard_{sid}.{ext}", "rb").read()
            assert a == b, f"shard {sid}.{ext} not byte-identical"


def test_token_shards_backfills_empty_shards(spark, tmp_path):
    # 2 docs over 64 shards: most shard ids receive no docs. A loader
    # iterating range(n_shards) must still find every file + manifest
    # row (the r10 advice item: absent applyInPandas groups used to
    # mean absent files).
    from muopdb_spark.operators.export import (
        read_token_shard,
        write_token_shards,
    )

    df = spark.createDataFrame(
        [(1, "the cat"), (2, "the dog")], "doc_id long, text string"
    )
    out = str(tmp_path / "sparse")
    man = {r["shard_id"]: r for r in
           write_token_shards(df, out, [("t", "h")], n_shards=64).collect()}
    assert set(man) == set(range(64))
    assert sum(r["n_docs"] for r in man.values()) == 2
    for sid in range(64):
        ids, idx = read_token_shard(out, sid)
        assert len(ids) == man[sid]["n_tokens"]
        assert idx.shape[0] == man[sid]["n_docs"]


# ------------------------------------------------- WebDataset tar export


def _wds_media(spark):
    import numpy as np

    from muopdb_spark.operators.audio import encode_wav
    from muopdb_spark.operators.image import encode_png

    rng = np.random.default_rng(0)
    rows = []
    for d in range(40):
        if d % 3 == 0:
            blob = encode_png(rng.integers(0, 256, (6, 8), np.uint8))
        elif d % 3 == 1:
            blob = encode_wav(np.zeros(100, np.int16), 8000)
        else:
            blob = b"\x00raw" + bytes([d])
        rows.append((d, bytearray(blob), f"src{d % 4}"))
    return rows, spark.createDataFrame(
        rows, "doc_id long, content binary, source string"
    )


def test_webdataset_roundtrip_and_manifest(spark, tmp_path):
    import json

    from muopdb_spark.operators.export import (
        read_webdataset,
        write_webdataset,
    )

    rows, media = _wds_media(spark)
    path = str(tmp_path / "wds")
    man = {r.shard_id: r for r in write_webdataset(
        media, path, meta_cols=["source"], n_shards=4
    ).collect()}
    assert sorted(man) == [0, 1, 2, 3]
    assert sum(r.n_docs for r in man.values()) == 40
    back = read_webdataset(spark, path).collect()
    assert len(back) == 40
    orig = {d: bytes(b) for d, b, _ in rows}
    for r in back:
        assert r.content == orig[int(r.key)]          # byte-exact payload
        assert json.loads(r.meta)["source"] == f"src{int(r.key) % 4}"
    assert {r.ext for r in back} == {"png", "wav", "bin"}


def test_webdataset_reexport_byte_identical(spark, tmp_path):
    import glob
    import hashlib

    from muopdb_spark.operators.export import write_webdataset

    _rows, media = _wds_media(spark)

    def digests(p):
        write_webdataset(media, p, meta_cols=["source"], n_shards=4)
        import os

        return {
            os.path.basename(f): hashlib.md5(open(f, "rb").read()).hexdigest()
            for f in glob.glob(p + "/*.tar")
        }

    assert digests(str(tmp_path / "a")) == digests(str(tmp_path / "b"))


def test_webdataset_empty_shards_backfilled(spark, tmp_path):
    import tarfile

    from muopdb_spark.operators.export import write_webdataset

    media = spark.createDataFrame(
        [(1, bytearray(b"x"))], "doc_id long, content binary"
    )
    path = str(tmp_path / "wds")
    man = {r.shard_id: r.n_docs for r in
           write_webdataset(media, path, n_shards=4).collect()}
    assert sorted(man) == [0, 1, 2, 3] and sum(man.values()) == 1
    for sid, n in man.items():
        with tarfile.open(f"{path}/shard-{sid:06d}.tar") as tf:
            assert len(tf.getmembers()) == 2 * n  # payload + json


def test_webdataset_ext_sniffing():
    from muopdb_spark.operators.export import _sniff_ext
    from muopdb_spark.operators.bmp import encode_bmp
    from muopdb_spark.operators.gif import encode_gif
    from muopdb_spark.operators.jpeg import encode_jpeg
    from muopdb_spark.operators.video import encode_avi_mjpeg
    import numpy as np

    g = np.zeros((4, 4), np.uint8)
    assert _sniff_ext(encode_jpeg(g)) == "jpg"
    assert _sniff_ext(encode_gif(g)) == "gif"
    assert _sniff_ext(encode_bmp(g)) == "bmp"
    assert _sniff_ext(encode_avi_mjpeg([g])) == "avi"
    assert _sniff_ext(b"\x00\x00\x00\x18ftypisom....") == "mp4"
    assert _sniff_ext(b"whatever") == "bin"


def test_read_webdataset_tolerates_foreign_members(spark, tmp_path):
    # directories and extension-less members appear in wild tars
    import io
    import tarfile

    from muopdb_spark.operators.export import read_webdataset

    p = tmp_path / "wds"
    p.mkdir()
    with tarfile.open(p / "shard-000000.tar", "w",
                      format=tarfile.USTAR_FORMAT) as tf:
        d = tarfile.TarInfo("subdir")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        for name, blob in [("000001.txt", b"hello"), ("README", b"r"),
                           ("000001.json", b"{}")]:
            info = tarfile.TarInfo(name)
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))
    rows = {(r.key, r.ext): r.content
            for r in read_webdataset(spark, str(p)).collect()}
    assert rows[("000001", "txt")] == b"hello"
    assert rows[("README", "bin")] == b"r"


def test_token_shards_unigram_model(spark, tmp_path):
    """write_token_shards accepts the unigram piece table: ids decode
    back to the exact Viterbi piece stream, byte-deterministic."""
    import json

    import numpy as np

    from muopdb_spark.operators.export import write_token_shards
    from muopdb_spark.operators.unigram import (
        unigram_encode_word,
        unigram_train_on_words,
    )

    vocab = unigram_train_on_words(
        {"spark": 9, "shard": 6, "sharding": 3, "park": 2}, 20
    )
    df = spark.createDataFrame(
        [(i, f"spark sharding {'park' if i % 2 else 'shard'}")
         for i in range(12)],
        "doc_id long, text string",
    )
    out = str(tmp_path / "uni")
    man = {r["shard_id"]: r for r in
           write_token_shards(df, out, unigram_vocab=vocab,
                              n_shards=2).collect()}
    assert sum(r["n_docs"] for r in man.values()) == 12
    id2sw = {int(k): v for k, v in
             json.loads(open(f"{out}/vocab.json").read()).items()}
    # decode shard 0's first doc and compare to the referee encoding
    idx = np.fromfile(f"{out}/shard_0.idx", dtype="<i8").reshape(-1, 2)
    flat = np.fromfile(f"{out}/shard_0.bin", dtype="<i4")
    did, n = int(idx[0][0]), int(idx[0][1])
    pieces = [id2sw[i] for i in flat[:n]]
    words = ["spark", "sharding", "park" if did % 2 else "shard"]
    want = [p for w in words for p in unigram_encode_word(w, vocab)]
    assert pieces == want
    # exactly-one-model validation
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exactly one"):
        write_token_shards(df, out, [("a", "b")], unigram_vocab=vocab)
    with _pytest.raises(ValueError, match="exactly one"):
        write_token_shards(df, out)
