"""CDXJ index over WARC archives (sources/cdx.py): SURT key parity
(expression vs referee), span-tracked member walk, sharded sorted
index + cluster.idx layout, read-back fidelity, targeted lookup with
payload integrity, and determinism of the index build."""

from __future__ import annotations

import gzip
import io
import json
import os

import pytest
from pyspark.sql import functions as F

from muopdb_spark.sources.cdx import (
    build_cdxj,
    iter_warc_member_spans,
    lookup_warc,
    read_cdxj,
    surt_key,
    surt_key_py,
)
from muopdb_spark.sources.warc import (
    encode_response_record,
    write_warc_sharded,
)

SURT_CASES = [
    ("https://www.Example.COM/Path?Q=1#frag", "com,example)/path?q=1"),
    ("http://example.com", "com,example)/"),
    ("https://sub.www.example.co.uk/a/b", "uk,co,example,www,sub)/a/b"),
    ("https://user:pw@example.com:8080/x", "com,example:8080)/x"),
    ("https://www.example.com:443/", "com,example:443)/"),
    ("not a url", None),
    ("/relative/only", None),
]


def test_surt_referee_matrix():
    for url, want in SURT_CASES:
        assert surt_key_py(url) == want, url


def test_surt_expression_matches_referee(spark):
    df = spark.createDataFrame([(u,) for u, _ in SURT_CASES], "url string")
    got = {r["url"]: r["k"] for r in
           df.select("url", surt_key("url").alias("k")).collect()}
    for url, want in SURT_CASES:
        assert got[url] == want, url


def test_member_spans_roundtrip():
    recs = [encode_response_record(f"https://e.com/{i}", f"b{i}".encode())
            for i in range(5)]
    buf = b""
    spans_expected = []
    for r in recs:
        m = io.BytesIO()
        with gzip.GzipFile(fileobj=m, mode="wb", mtime=0) as gz:
            gz.write(r)
        spans_expected.append((len(buf), len(m.getvalue())))
        buf += m.getvalue()
    got = list(iter_warc_member_spans(buf))
    assert [(o, l) for o, l, _ in got] == spans_expected
    assert [r for _, _, r in got] == recs
    # a byte-range re-read of any span yields exactly that record
    for (off, ln), rec in zip(spans_expected, recs):
        sub = list(iter_warc_member_spans(buf[off:off + ln]))
        assert len(sub) == 1 and sub[0][2] == rec


def _corpus(spark, n=60):
    return spark.createDataFrame(
        [(i, f"https://WWW.Site{i % 5}.com/p/{i}", f"<html>{i}</html>")
         for i in range(n)],
        "doc_id long, url string, payload string",
    )


def test_build_read_sorted_and_cluster_idx(spark, tmp_path):
    wdir, cdir = str(tmp_path / "w"), str(tmp_path / "c")
    write_warc_sharded(_corpus(spark), wdir, n_shards=3)
    manifest = {r["shard_id"]: r for r in
                build_cdxj(spark, wdir, cdir, n_shards=2).collect()}
    assert sum(r["n_entries"] for r in manifest.values()) == 60
    # parts exist, each internally sorted, and ranges are disjoint
    keys_per_part = []
    for sid in sorted(manifest):
        p = os.path.join(cdir, f"part-{sid:05d}.cdxj")
        if manifest[sid]["n_entries"] == 0:
            continue
        keys = [ln.split(" ", 1)[0] for ln in open(p)]
        assert keys == sorted(keys)
        keys_per_part.append(keys)
    flat = [k for part in keys_per_part for k in part]
    assert flat == sorted(flat)
    # cluster.idx lists each non-empty shard's first key in order
    lines = [ln.split("\t") for ln in
             open(os.path.join(cdir, "cluster.idx")).read().splitlines()]
    assert [ln[0] for ln in lines] == [p[0] for p in keys_per_part]
    # read-back equals the line content
    idx = read_cdxj(spark, cdir)
    assert idx.count() == 60
    row = idx.filter(F.col("url") == "https://WWW.Site1.com/p/1").collect()[0]
    assert row["urlkey"] == "com,site1)/p/1"
    assert row["status"] == 200
    assert row["mime"] == "text/html"
    assert row["digest"].startswith("sha1:")


def test_lookup_payload_integrity_and_miss(spark, tmp_path):
    wdir, cdir = str(tmp_path / "w"), str(tmp_path / "c")
    corpus = _corpus(spark)
    write_warc_sharded(corpus, wdir, n_shards=3)
    build_cdxj(spark, wdir, cdir, n_shards=2)
    wanted = spark.createDataFrame(
        [("https://www.site1.com/p/1",),      # case-normalized hit
         ("https://WWW.Site2.com/p/12",),     # exact hit
         ("https://nowhere.com/x",)],         # miss
        "url string",
    )
    rows = lookup_warc(spark, wdir, cdir, wanted).collect()
    got = {r["urlkey"]: bytes(r["payload"]) for r in rows}
    assert got == {
        "com,site1)/p/1": b"<html>1</html>",
        "com,site2)/p/12": b"<html>12</html>",
    }
    assert all(r["http_status"] == 200 for r in rows)


def test_build_is_deterministic(spark, tmp_path):
    wdir = str(tmp_path / "w")
    write_warc_sharded(_corpus(spark, 30), wdir, n_shards=2)
    c1, c2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    build_cdxj(spark, wdir, c1, n_shards=2)
    build_cdxj(spark, wdir, c2, n_shards=2)
    for name in sorted(os.listdir(c1)):
        a = open(os.path.join(c1, name), "rb").read()
        b = open(os.path.join(c2, name), "rb").read()
        assert a == b, name


def test_cdxj_line_shape(spark, tmp_path):
    wdir, cdir = str(tmp_path / "w"), str(tmp_path / "c")
    write_warc_sharded(_corpus(spark, 10), wdir, n_shards=1)
    build_cdxj(spark, wdir, cdir, n_shards=1)
    ln = open(os.path.join(cdir, "part-00000.cdxj")).readline().strip()
    key, ts, js = ln.split(" ", 2)
    assert ")" in key and len(ts) == 14 and ts.isdigit()
    e = json.loads(js)
    assert set(e) == {"url", "digest", "mime", "status", "filename",
                      "offset", "length"}


def test_build_errors(spark, tmp_path):
    with pytest.raises(ValueError, match="n_shards"):
        build_cdxj(spark, str(tmp_path), str(tmp_path / "c"), n_shards=0)
    with pytest.raises(ValueError, match="no part"):
        read_cdxj(spark, str(tmp_path))


def test_foreign_archives_without_sidecars_build_identically(spark, tmp_path):
    """The byte-range-parallel build (sidecar-driven) and the per-file
    fallback walk must produce the SAME index bytes."""
    wdir = str(tmp_path / "w")
    write_warc_sharded(_corpus(spark, 30), wdir, n_shards=2)
    c1 = str(tmp_path / "c1")
    build_cdxj(spark, wdir, c1, n_shards=2)
    # strip the sidecars -> the fallback path
    for name in os.listdir(wdir):
        if name.endswith(".idx.jsonl"):
            os.remove(os.path.join(wdir, name))
    c2 = str(tmp_path / "c2")
    build_cdxj(spark, wdir, c2, n_shards=2)
    assert sorted(os.listdir(c1)) == sorted(os.listdir(c2))
    for name in sorted(os.listdir(c1)):
        a = open(os.path.join(c1, name), "rb").read()
        b = open(os.path.join(c2, name), "rb").read()
        assert a == b, name


def test_lookup_prunes_shards_via_cluster_idx(spark, tmp_path):
    """The lookup must read only the shards whose key range can hold a
    wanted key (the ZipNum access pattern)."""
    from muopdb_spark.sources.cdx import _shards_for_keys

    wdir, cdir = str(tmp_path / "w"), str(tmp_path / "c")
    write_warc_sharded(_corpus(spark, 60), wdir, n_shards=3)
    build_cdxj(spark, wdir, cdir, n_shards=4)
    cluster = [ln.split("\t") for ln in
               open(os.path.join(cdir, "cluster.idx")).read().splitlines()]
    assert len(cluster) == 4
    # a key inside the LAST shard's range prunes to exactly that shard
    last_first = cluster[-1][0]
    picked = _shards_for_keys(cdir, [last_first])
    assert [os.path.basename(p) for p in picked] == [cluster[-1][1]]
    # a key below the first shard's first key prunes to nothing
    assert _shards_for_keys(cdir, ["aaa)/nope"]) == []
    # no cluster.idx -> None (full-scan fallback)
    os.remove(os.path.join(cdir, "cluster.idx"))
    assert _shards_for_keys(cdir, [last_first]) is None
    # end-to-end: lookups still correct with and without cluster.idx
    wanted = spark.createDataFrame(
        [("https://www.site1.com/p/1",), ("https://zzz.nope/x",)],
        "url string",
    )
    rows = lookup_warc(spark, wdir, cdir, wanted).collect()
    assert [bytes(r["payload"]) for r in rows] == [b"<html>1</html>"]


def test_lookup_multi_record_member_keeps_only_indexed_record(spark, tmp_path):
    """Foreign archives can pack several records into one gzip member
    (whole-file gzip, request+response pairs). A lookup byte-range
    read decodes the whole member, so it must FILTER to the records
    the looked-up index entry actually covers — indexed warc_types
    whose target URI keys back to the looked-up urlkey — or a
    single-URL lookup returns the member's OTHER records (the request,
    another URL's response) mislabeled with the wanted key
    (r15 ADVICE regression)."""
    from muopdb_spark.sources.warc import encode_warc_record

    wdir, cdir = str(tmp_path / "w"), str(tmp_path / "c")
    os.makedirs(wdir)
    url_a, url_b = "https://a.com/page", "https://b.com/other"
    resp_a = encode_response_record(url_a, b"<html>A</html>")
    req_a = encode_warc_record(
        {
            "WARC-Type": "request",
            "WARC-Record-ID": "<urn:uuid:00000000-0000-0000-0000-000000000001>",
            "WARC-Date": "2024-01-01T00:00:00Z",
            "WARC-Target-URI": url_a,
            "Content-Type": "application/http; msgtype=request",
        },
        b"GET /page HTTP/1.1\r\nHost: a.com\r\n\r\n",
    )
    resp_b = encode_response_record(url_b, b"<html>B</html>")
    # ONE gzip member holding response A + request A + response B —
    # the foreign whole-file-gzip shape our writer never produces
    m = io.BytesIO()
    with gzip.GzipFile(fileobj=m, mode="wb", mtime=0) as gz:
        gz.write(resp_a + req_a + resp_b)
    with open(os.path.join(wdir, "foreign-00000.warc.gz"), "wb") as fh:
        fh.write(m.getvalue())

    build_cdxj(spark, wdir, cdir, n_shards=1)
    # the index covers both responses (each entry carrying the shared
    # member span), never the request record
    idx = read_cdxj(spark, cdir).collect()
    assert sorted(r["urlkey"] for r in idx) == [
        "com,a)/page", "com,b)/other"
    ]

    wanted = spark.createDataFrame([(url_a,)], "url string")
    rows = lookup_warc(spark, wdir, cdir, wanted).collect()
    # exactly the indexed response — not the request, not B's response
    assert len(rows) == 1
    assert rows[0]["warc_type"] == "response"
    assert rows[0]["target_uri"] == url_a
    assert bytes(rows[0]["payload"]) == b"<html>A</html>"
