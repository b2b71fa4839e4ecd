"""WARC / WET — the native CommonCrawl container (ISO 28500, the
public "WARC File Format" spec; WET is the text-only "conversion"
twin CommonCrawl publishes alongside). This closes the acquisition
family's ingestion gap: crawl pages previously had to be re-landed as
parquet/JSONL before read; now the pipeline reads the archives a
crawler actually produces.

Format recap (from the public spec):

  - a WARC file is a concatenation of records; each record is
    ``WARC/1.0\\r\\n`` + named headers + ``\\r\\n`` + a Content-Length
    byte block + ``\\r\\n\\r\\n``.
  - CommonCrawl archives are "gzip member-per-record": every record
    is its own gzip member, members concatenated — which is what
    makes byte-offset random access possible (their CDX index maps
    URL -> (file, offset, length)).
  - ``response`` records hold a full HTTP response (status line +
    headers + payload) as the block; ``conversion`` records (WET)
    hold extracted plain text.

Spark mapping — the fvecs/hdf5 two-path pattern:

  - **writer** (`write_warc_sharded`): executor-parallel, one
    ``shard-k.warc.gz`` per task (the write_webdataset shape) with a
    ``shard-k.idx.jsonl`` offset sidecar per shard (our stand-in for
    CommonCrawl's CDX: one JSON line per record with offset/length).
    Records are byte-deterministic: gzip mtime 0, record IDs derived
    from content digests, caller-controlled or fixed WARC-Date —
    re-exports are byte-identical (test-pinned).
  - **reader** (`read_warc`): when ``.idx.jsonl`` sidecars exist, a
    BYTE-RANGE spec df (file, offset, length) repartitioned across
    executors — intra-file parallelism, the production path at 100 TB
    where archive files are ~1 GB each and a scan wants more tasks
    than files. Foreign archives without an index fall back to a
    whole-file binaryFile scan + sequential gzip-member walk per file
    (still parallel ACROSS files; Spark caps a binary file at 2 GB,
    which real crawl archives respect).

Reference parity note: the reference engine (hicder/muopdb) has no
crawl ingestion; this family is brief-driven (training-data pipeline
requirement) like the URL/HTML operators it feeds
(operators/urls.py, operators/html.py).
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import io
import json
import os
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

_CRLF = b"\r\n"

# fixed capture date for deterministic exports when the frame carries
# no date column (spec requires a valid UTC ISO-8601 WARC-Date)
_FIXED_DATE = "2026-01-01T00:00:00Z"

READ_SCHEMA = (
    "warc_type string, record_id string, warc_date string, "
    "target_uri string, content_type string, http_status int, "
    "http_content_type string, payload binary"
)


# --------------------------------------------------------- record codec


def encode_warc_record(headers: dict[str, str], block: bytes) -> bytes:
    """One plain (uncompressed) WARC/1.0 record. `headers` must NOT
    include Content-Length (computed here); WARC-Type is required."""
    if "WARC-Type" not in headers:
        raise ValueError("encode_warc_record: WARC-Type header required")
    if any(k.lower() == "content-length" for k in headers):
        raise ValueError("encode_warc_record: Content-Length is computed")
    out = bytearray(b"WARC/1.0" + _CRLF)
    for k, v in headers.items():
        if _CRLF.decode() in f"{k}{v}" or "\n" in f"{k}{v}":
            raise ValueError(f"encode_warc_record: newline in header {k!r}")
        out += f"{k}: {v}".encode() + _CRLF
    out += f"Content-Length: {len(block)}".encode() + _CRLF
    out += _CRLF + block + _CRLF + _CRLF
    return bytes(out)


def _record_id(*parts: bytes) -> str:
    """Deterministic urn:uuid record id from content (md5-shaped into
    the RFC 4122 text layout; determinism > randomness here — the
    writer's byte-identical re-export contract depends on it)."""
    h = hashlib.md5(b"\x00".join(parts)).hexdigest()
    return (f"<urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-"
            f"{h[20:32]}>")


def _payload_digest(payload: bytes) -> str:
    """WARC-Payload-Digest in the spec's labelled-base32 form."""
    return "sha1:" + base64.b32encode(
        hashlib.sha1(payload).digest()
    ).decode()


def encode_response_record(
    url: str, payload: bytes, *, status: int = 200,
    http_content_type: str = "text/html", date: str = _FIXED_DATE,
) -> bytes:
    """A `response` record wrapping an HTTP/1.1 response around the
    payload — the record type crawl archives store pages as."""
    http = (
        f"HTTP/1.1 {status} OK".encode() + _CRLF
        + f"Content-Type: {http_content_type}".encode() + _CRLF
        + f"Content-Length: {len(payload)}".encode() + _CRLF
        + _CRLF + payload
    )
    return encode_warc_record(
        {
            "WARC-Type": "response",
            "WARC-Record-ID": _record_id(url.encode(), payload),
            "WARC-Date": date,
            "WARC-Target-URI": url,
            "WARC-Payload-Digest": _payload_digest(payload),
            "Content-Type": "application/http; msgtype=response",
        },
        http,
    )


def encode_conversion_record(
    url: str, text: str, *, date: str = _FIXED_DATE,
) -> bytes:
    """A `conversion` record — the WET form: extracted plain text."""
    payload = text.encode("utf-8")
    return encode_warc_record(
        {
            "WARC-Type": "conversion",
            "WARC-Record-ID": _record_id(url.encode(), payload),
            "WARC-Date": date,
            "WARC-Target-URI": url,
            "WARC-Payload-Digest": _payload_digest(payload),
            "Content-Type": "text/plain",
        },
        payload,
    )


def _warcinfo_record(filename: str) -> bytes:
    body = (
        b"software: muopdb-spark warc writer" + _CRLF
        + b"format: WARC File Format 1.0" + _CRLF
    )
    return encode_warc_record(
        {
            "WARC-Type": "warcinfo",
            "WARC-Record-ID": _record_id(b"warcinfo", filename.encode()),
            "WARC-Date": _FIXED_DATE,
            "WARC-Filename": filename,
            "Content-Type": "application/warc-fields",
        },
        body,
    )


def _gzip_member(raw: bytes) -> bytes:
    """One deterministic gzip member (mtime 0 — byte-identical
    re-exports) per record, the CommonCrawl layout."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(raw)
    return buf.getvalue()


def parse_warc_record(raw: bytes) -> dict:
    """Parse one plain record into {warc_type, record_id, warc_date,
    target_uri, content_type, http_status, http_content_type,
    payload}. For `response` records the HTTP envelope is split off
    (status + entity headers parsed, payload = entity body); all other
    types carry the block as the payload. Malformed records raise
    ValueError naming the defect."""
    head_end = raw.find(_CRLF + _CRLF)
    if head_end < 0:
        raise ValueError("warc: record missing header terminator")
    lines = raw[:head_end].split(_CRLF)
    version = lines[0]
    if not version.startswith(b"WARC/"):
        raise ValueError(f"warc: bad version line {version[:20]!r}")
    hdrs: dict[str, str] = {}
    for ln in lines[1:]:
        k, sep, v = ln.partition(b":")
        if not sep:
            raise ValueError(f"warc: malformed header line {ln[:40]!r}")
        # latin-1, the HTTP header convention (total over any bytes,
        # byte-lossless — what warcio does): real crawls carry mojibake
        # header values, and a strict decode leaked UnicodeDecodeError
        # through the documented raises-ValueError contract, killing
        # the whole read_warc task on one bad record (r16 mutation
        # fuzz: 208/300 corrupted records crashed untyped)
        hdrs[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
    if "content-length" not in hdrs:
        raise ValueError("warc: record missing Content-Length")
    try:
        n = int(hdrs["content-length"])
    except ValueError:
        raise ValueError(
            f"warc: bad Content-Length {hdrs['content-length'][:20]!r}"
        ) from None
    block = raw[head_end + 4:head_end + 4 + n]
    if len(block) != n:
        raise ValueError(
            f"warc: truncated block ({len(block)} of {n} bytes)"
        )
    wtype = hdrs.get("warc-type", "")
    status = None
    http_ct = None
    payload = block
    if wtype == "response" and block[:5] == b"HTTP/":
        env_end = block.find(_CRLF + _CRLF)
        if env_end < 0:
            raise ValueError("warc: HTTP envelope missing terminator")
        env = block[:env_end].split(_CRLF)
        parts = env[0].split(b" ", 2)
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
        for ln in env[1:]:
            k, _sep, v = ln.partition(b":")
            if k.strip().lower() == b"content-type":
                http_ct = v.strip().decode(errors="replace")
        payload = block[env_end + 4:]
    return {
        "warc_type": wtype,
        "record_id": hdrs.get("warc-record-id"),
        "warc_date": hdrs.get("warc-date"),
        "target_uri": hdrs.get("warc-target-uri"),
        "content_type": hdrs.get("content-type"),
        "http_status": status,
        "http_content_type": http_ct,
        "payload": payload,
    }


_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


def _probe_zstd(data: bytes) -> None:
    """Named refusal for .warc.zst archives (r15 close-or-freeze:
    REFUSED — Python 3.11 has no stdlib zstd and vendoring a
    from-scratch zstd decoder (FSE/huffman/sequences, RFC 8878) is a
    codec project in itself; the deflate members the WARC 1.1 spec
    actually requires are fully supported). Probes both the standard
    frame magic and the skippable frame 0x184D2A5x that .warc.zst
    dictionaries ride in."""
    if data[:4] == _ZSTD_MAGIC or (
        len(data) >= 4
        and data[1:4] == b"\x2a\x4d\x18"
        and 0x50 <= data[0] <= 0x5F
    ):
        raise NotImplementedError(
            "warc: zstd-compressed archives (.warc.zst) are not "
            "supported - recompress to gzip member-per-record"
        )


def iter_warc_members(data: bytes) -> Iterator[bytes]:
    """Yield each record's PLAIN bytes from a .warc.gz buffer
    (member-per-record gzip walk via zlib unused_data) or a plain
    .warc buffer (sequential Content-Length hops). zstd archives
    refuse by name (_probe_zstd)."""
    _probe_zstd(data)
    if data[:2] == b"\x1f\x8b":
        pos = 0
        view = memoryview(data)  # no per-member tail copy
        while pos < len(data):
            d = zlib.decompressobj(31)
            plain = d.decompress(view[pos:])
            plain += d.flush()
            if not d.eof:
                raise ValueError("warc: truncated gzip member")
            # one member MAY hold several records (foreign whole-file
            # gzip): hop records inside the plain buffer too
            yield from _iter_plain_records(plain)
            consumed = len(data) - pos - len(d.unused_data)
            if consumed <= 0:
                raise ValueError("warc: gzip member made no progress")
            pos += consumed
    else:
        yield from _iter_plain_records(data)


def _iter_plain_records(data: bytes) -> Iterator[bytes]:
    pos = 0
    while pos < len(data):
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            if data[pos:].strip():
                raise ValueError("warc: trailing garbage after records")
            return
        n = None
        for ln in data[pos:head_end].split(_CRLF):
            k, _sep, v = ln.partition(b":")
            if k.strip().lower() == b"content-length":
                n = int(v.strip())
        if n is None:
            raise ValueError("warc: record missing Content-Length")
        end = head_end + 4 + n + 4  # block + closing CRLF CRLF
        yield data[pos:min(end, len(data))]
        pos = end


# ---------------------------------------------------------------- writer


def write_warc_sharded(
    df: DataFrame,
    dir_path: str,
    *,
    kind: str = "response",
    url_col: str = "url",
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "warc-v1",
) -> DataFrame:
    """Executor-parallel WARC export: one ``shard-k.warc.gz`` (gzip
    member per record, warcinfo head record, byte-deterministic) plus
    one ``shard-k.idx.jsonl`` offset sidecar per shard — the
    write_webdataset shape with the CommonCrawl container. `kind` is
    ``response`` (payload_col is binary/str HTML wrapped in an HTTP
    envelope) or ``conversion`` (payload_col is extracted text — the
    WET form). Shard/position come from shard_assignment's (seed, id)
    hash, so re-exports are byte-identical under the same corpus.
    `dir_path` must be a shared filesystem in cluster mode (the same
    assumption every sharded writer here makes). Returns the manifest
    (shard_id, n_records, warc_bytes)."""
    import pandas as _pd

    from muopdb_spark.operators.export import shard_assignment

    if kind not in ("response", "conversion"):
        raise ValueError(
            f"write_warc_sharded: kind must be response|conversion,"
            f" got {kind!r}"
        )
    os.makedirs(dir_path, exist_ok=True)
    payload = df.select(id_col, url_col, payload_col)
    assigned = shard_assignment(
        payload, id_col=id_col, n_shards=n_shards, seed=seed
    ).join(payload, id_col)

    out_schema = "shard_id long, n_records long, warc_bytes long"

    def _write(pdf: _pd.DataFrame) -> _pd.DataFrame:
        pdf = pdf.sort_values("position", kind="mergesort")
        sid = int(pdf["shard_id"].iloc[0])
        name = f"shard-{sid:06d}.warc.gz"
        warc_path = os.path.join(dir_path, name)
        idx_path = os.path.join(
            dir_path, f"shard-{sid:06d}.idx.jsonl"
        )
        with open(warc_path, "wb") as f, open(idx_path, "w") as ix:
            f.write(_gzip_member(_warcinfo_record(name)))
            for _, row in pdf.iterrows():
                url = str(row[url_col])
                blob = row[payload_col]
                if kind == "response":
                    if isinstance(blob, str):
                        blob = blob.encode("utf-8")
                    rec = encode_response_record(url, bytes(blob))
                else:
                    rec = encode_conversion_record(url, str(blob))
                member = _gzip_member(rec)
                off = f.tell()
                f.write(member)
                ix.write(json.dumps(
                    {"offset": off, "length": len(member), "url": url},
                    sort_keys=True,
                ) + "\n")
        return _pd.DataFrame(
            {"shard_id": [sid], "n_records": [len(pdf)],
             "warc_bytes": [os.path.getsize(warc_path)]}
        )

    manifest = (
        assigned.repartition(n_shards, "shard_id")
        .groupBy("shard_id")
        .applyInPandas(_write, out_schema)
    )
    rows = [tuple(r) for r in manifest.collect()]
    written = {r[0] for r in rows}
    for sid in range(n_shards):
        if sid in written:
            continue
        name = f"shard-{sid:06d}.warc.gz"
        p = os.path.join(dir_path, name)
        with open(p, "wb") as f:
            f.write(_gzip_member(_warcinfo_record(name)))
        open(os.path.join(dir_path, f"shard-{sid:06d}.idx.jsonl"),
             "w").close()
        rows.append((sid, 0, os.path.getsize(p)))
    spark = df.sparkSession
    return spark.createDataFrame(
        sorted(rows), "shard_id long, n_records long, warc_bytes long"
    )


# ---------------------------------------------------------------- reader


def _list_warcs(path: str) -> list[str]:
    import glob as _glob

    if os.path.isdir(path):
        out = sorted(
            _glob.glob(os.path.join(path, "*.warc.gz"))
            + _glob.glob(os.path.join(path, "*.warc"))
            + _glob.glob(os.path.join(path, "*.wet.gz"))
            + _glob.glob(os.path.join(path, "*.wet"))
        )
    else:
        out = sorted(_glob.glob(path))
    if not out:
        raise ValueError(f"read_warc: no archive files under {path!r}")
    return out


def read_warc(
    spark: SparkSession, path: str, *, types: tuple[str, ...] | None = None,
    use_index: bool = True, tasks_per_file: int = 1,
) -> DataFrame:
    """Read WARC/WET archives under `path` into one row per record:
    (warc_type, record_id, warc_date, target_uri, content_type,
    http_status, http_content_type, payload). `types` filters record
    types ('response', 'conversion', ...); warcinfo records are
    dropped by default when a filter is given.

    Production path: when every archive has a ``.idx.jsonl`` offset
    sidecar (our writer's, or converted from a CDX index) and
    use_index is set, the scan is BYTE-RANGE parallel — a spec df of
    (file, offset, length) record runs, repartitioned across the
    cluster, each task seeking into its file — so parallelism is
    bounded by record count, not file count. Without sidecars each
    file is one sequential gzip-member walk (binaryFile scan, 2 GB
    per-file cap — real crawl archives are ~1 GB)."""
    import pandas as _pd

    files = _list_warcs(path)
    idx_files = {
        f: f.rsplit(".warc.gz", 1)[0] + ".idx.jsonl"
        for f in files if f.endswith(".warc.gz")
    }
    indexed = (
        use_index
        and len(idx_files) == len(files)
        and all(os.path.exists(p) for p in idx_files.values())
    )

    def _rows(recs: Iterator[bytes]):
        out = {k: [] for k in (
            "warc_type", "record_id", "warc_date", "target_uri",
            "content_type", "http_status", "http_content_type",
            "payload",
        )}
        for raw in recs:
            rec = parse_warc_record(raw)
            if types is not None and rec["warc_type"] not in types:
                continue
            for k in out:
                out[k].append(rec[k])
        return out

    if indexed:
        spec_rows = []
        for f, ip in idx_files.items():
            with open(ip) as fh:
                for ln in fh:
                    if not ln.strip():
                        continue
                    e = json.loads(ln)
                    spec_rows.append((f, int(e["offset"]),
                                      int(e["length"])))
        if not spec_rows:
            return spark.createDataFrame([], READ_SCHEMA)
        # group contiguous runs so a task does ~one seek per batch of
        # records instead of one file-open per record. The spec goes
        # through pandas so createDataFrame takes the Arrow path (r16,
        # guide §6): the tuple path converts row-by-row on the driver,
        # which at one spec row PER RECORD is the scan's driver-side
        # hot spot (the PSL table had the same failure mode).
        spec = spark.createDataFrame(
            _pd.DataFrame(
                {
                    "file": [r[0] for r in spec_rows],
                    "offset": _pd.Series(
                        [r[1] for r in spec_rows], dtype="int64"),
                    "length": _pd.Series(
                        [r[2] for r in spec_rows], dtype="int64"),
                }
            ),
            "file string, offset long, length long",
        )
        par = max(
            spark.sparkContext.defaultParallelism,
            len(files) * max(1, tasks_per_file),
        )
        spec = spec.repartition(par, "file", "offset")

        def gen(batches: Iterator[_pd.DataFrame]):
            for pdf in batches:
                for f, grp in pdf.groupby("file", sort=True):
                    grp = grp.sort_values("offset")
                    with open(f, "rb") as fh:
                        recs = []
                        for off, ln in zip(grp["offset"], grp["length"]):
                            fh.seek(int(off))
                            member = fh.read(int(ln))
                            recs.extend(iter_warc_members(member))
                        yield _pd.DataFrame(_rows(iter(recs)))

        return spec.mapInPandas(gen, READ_SCHEMA)

    scan = spark.read.format("binaryFile").load(files) \
        .select("path", "content")

    def gen_full(batches: Iterator[_pd.DataFrame]):
        for pdf in batches:
            for blob in pdf["content"]:
                yield _pd.DataFrame(
                    _rows(iter_warc_members(bytes(blob)))
                )

    return scan.mapInPandas(gen_full, READ_SCHEMA)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET view: conversion records only, payload decoded to `text` —
    (target_uri, warc_date, text)."""
    recs = read_warc(spark, path, types=("conversion",))
    return recs.select(
        "target_uri", "warc_date",
        F.decode(F.col("payload"), "UTF-8").alias("text"),
    )


def warc_extract_text(
    spark: SparkSession, path: str, *, drop_boilerplate: bool = True,
) -> DataFrame:
    """Crawl-to-text head of the curation pipeline: response records
    -> HTML payload -> operators/html.html_to_text (one Arrow map
    pass, keyed by the record's URL — no synthetic id, no shuffle).
    Returns (target_uri, text, title, n_links); doc identity
    downstream is the canonical URL (operators/urls.py)."""
    import pandas as _pd

    from muopdb_spark.operators.html import html_to_text

    recs = read_warc(spark, path, types=("response",))
    pages = recs.select(
        "target_uri",
        F.decode(F.col("payload"), "UTF-8").alias("html"),
    )

    def gen(batches: Iterator[_pd.DataFrame]):
        for pdf in batches:
            out = {"target_uri": [], "text": [], "title": [],
                   "n_links": []}
            for uri, raw in zip(pdf["target_uri"], pdf["html"]):
                text, title, links = html_to_text(
                    raw or "", drop_boilerplate=drop_boilerplate
                )
                out["target_uri"].append(uri)
                out["text"].append(text)
                out["title"].append(title)
                out["n_links"].append(len(links))
            yield _pd.DataFrame(out)

    return pages.mapInPandas(
        gen, "target_uri string, text string, title string, n_links int"
    )
