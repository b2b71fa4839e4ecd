"""CDXJ capture index over WARC archives — the CommonCrawl / pywb
lookup layer (public conventions: CDXJ line format "urlkey timestamp
{json}", SURT url keys, ZipNum-style sharded index with a secondary
`cluster.idx`). Completes the WARC family (sources/warc.py): the
offset sidecars the r13 writer emits are a private stand-in; this
module builds the INTEROPERABLE index any replay/lookup tool expects,
and serves targeted record lookups without scanning archives.

Pieces:

  - ``surt_key`` — the SURT url key as a pure Catalyst expression
    (zero Python): scheme and credentials dropped, host lowercased
    with a leading ``www.`` stripped and its labels comma-reversed
    (``com,example``), non-default port kept (``com,example:8080``),
    then ``)`` + path(+``?``+query), fragment dropped. DISCLOSED
    subset of pywb's canonicalizer: no per-parameter query massaging
    (session-id stripping etc.) — urls.url_normalize covers tracking
    params upstream.
  - ``build_cdxj`` — executor-parallel index build: each task walks
    its archives' gzip members TRACKING BYTE SPANS, then the entries
    are range-partitioned and sorted by (urlkey, timestamp) into
    ``part-NNNNN.cdxj`` shards plus a ``cluster.idx`` secondary index
    (first key of every shard) — the ZipNum-lite layout; a binary
    search over cluster.idx finds the one shard a key can live in.
  - ``read_cdxj`` — the index back as a DataFrame.
  - ``lookup_warc`` — targeted record fetch: wanted URLs are
    surt-keyed and BROADCAST against the index scan (no index
    shuffle), matching entries byte-range-read from the archives
    grouped by file — cost bounded by matches, never a full scan.

At 100 TB the index is ~1e9 rows of ~200 bytes — a Spark sort and a
few hundred shards; lookups touch one cluster.idx, one shard file and
one byte range per hit, which is exactly the CommonCrawl index access
pattern.

Reference parity note: the reference engine (hicder/muopdb) has no
crawl operators; brief-driven like the WARC/HTML/URL families.
"""

from __future__ import annotations

import json
import os
import re
import zlib
from typing import Iterator

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from muopdb_spark.sources.warc import (
    _iter_plain_records,
    _list_warcs,
    _probe_zstd,
    parse_warc_record,
)

__all__ = [
    "surt_key",
    "surt_key_py",
    "iter_warc_member_spans",
    "build_cdxj",
    "read_cdxj",
    "lookup_warc",
]


def surt_key(col: Column | str) -> Column:
    """SURT url key as a Catalyst expression (see module docstring
    for the disclosed subset)."""
    u = F.lower(F.trim(F.col(col) if isinstance(col, str) else col))
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    hostport = F.regexp_extract(
        u, r"^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/?#]+)", 1
    )
    host = F.regexp_replace(hostport, r":\d+$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    rest = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    key = F.concat(
        rev,
        F.when(port == "", F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        F.lit(")"),
        rest,
    )
    # no scheme://authority -> not indexable
    return F.when(hostport == "", F.lit(None).cast("string")).otherwise(key)


def surt_key_py(url: str) -> str | None:
    """Pure-Python referee for surt_key (tests)."""
    u = (url or "").strip().lower()
    u = re.sub(r"#.*$", "", u)
    m = re.match(r"^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/?#]+)(.*)$", u)
    if not m:
        return None
    hostport, rest = m.group(1), m.group(2) or "/"
    pm = re.search(r":(\d+)$", hostport)
    host = hostport[: pm.start()] if pm else hostport
    host = re.sub(r"^www\.", "", host)
    rev = ",".join(reversed(host.split(".")))
    port = f":{pm.group(1)}" if pm else ""
    return f"{rev}{port}){rest}"


def iter_warc_member_spans(
    data: bytes,
) -> Iterator[tuple[int, int, bytes]]:
    """(offset, length, plain_record) per record of a .warc.gz buffer
    (member-per-record walk tracking byte spans; a multi-record
    member yields each record with the MEMBER's span) or a plain
    .warc buffer (record spans are the plain byte spans). zstd
    archives refuse by name (warc._probe_zstd)."""
    _probe_zstd(data)
    if data[:2] == b"\x1f\x8b":
        pos = 0
        view = memoryview(data)
        while pos < len(data):
            d = zlib.decompressobj(31)
            plain = d.decompress(view[pos:])
            plain += d.flush()
            if not d.eof:
                raise ValueError("cdx: truncated gzip member")
            consumed = len(data) - pos - len(d.unused_data)
            if consumed <= 0:
                raise ValueError("cdx: gzip member made no progress")
            for rec in _iter_plain_records(plain):
                yield pos, consumed, rec
            pos += consumed
    else:
        pos = 0
        for rec in _iter_plain_records(data):
            # plain records are contiguous; spans follow record sizes
            yield pos, len(rec), rec
            pos += len(rec)


_ENTRY_SCHEMA = (
    "urlkey string, timestamp string, url string, digest string,"
    " mime string, status int, filename string, offset long,"
    " length long"
)


def _cdx_timestamp(warc_date: str | None) -> str:
    digits = re.sub(r"\D", "", warc_date or "")
    return (digits + "00000000000000")[:14]


def _entry_columns(
    out: dict, f: str, off: int, ln: int, raw: bytes
) -> None:
    rec = parse_warc_record(raw)
    if rec["warc_type"] not in ("response", "conversion", "resource"):
        return
    url = rec["target_uri"] or ""
    key = surt_key_py(url)
    if key is None:
        return
    out["urlkey"].append(key)
    out["timestamp"].append(_cdx_timestamp(rec["warc_date"]))
    out["url"].append(url)
    # digest from the raw header (parse keeps payload only); cheap
    # refetch via a regex over the head
    m = re.search(rb"(?mi)^WARC-Payload-Digest:\s*(\S+)", raw)
    out["digest"].append(m.group(1).decode() if m else None)
    out["mime"].append(rec["http_content_type"] or rec["content_type"])
    out["status"].append(rec["http_status"])
    out["filename"].append(os.path.basename(f))
    out["offset"].append(off)
    out["length"].append(ln)


def _index_entries(spark: SparkSession, warc_dir: str) -> DataFrame:
    """One index row per response/conversion/resource record across
    the archives. When every archive carries a ``.idx.jsonl`` offset
    sidecar (our writer's), the build is BYTE-RANGE parallel — a spec
    df of (file, offset, length) runs repartitioned across the
    cluster, so parallelism is bounded by record count, not file
    count (the read_warc indexed shape; the r14 sf1.0 witness caught
    the per-file serial walk at 7x/decade). Foreign archives without
    sidecars fall back to one sequential member walk per file."""
    import pandas as _pd

    files = _list_warcs(warc_dir)
    idx_files = {
        f: f.rsplit(".warc.gz", 1)[0] + ".idx.jsonl"
        for f in files if f.endswith(".warc.gz")
    }
    indexed = (
        len(idx_files) == len(files)
        and all(os.path.exists(p) for p in idx_files.values())
    )

    if indexed:
        spec_rows = []
        for f, ip in idx_files.items():
            with open(ip) as fh:
                for ln in fh:
                    if not ln.strip():
                        continue
                    e = json.loads(ln)
                    spec_rows.append(
                        (f, int(e["offset"]), int(e["length"]))
                    )
        if not spec_rows:
            return spark.createDataFrame([], _ENTRY_SCHEMA)
        # pandas -> Arrow createDataFrame: one spec row per record,
        # the tuple path converts row-by-row on the driver (r16, same
        # fix as sources/warc.py read_warc)
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
        ).repartition(
            max(spark.sparkContext.defaultParallelism, len(files)),
            "file", "offset",
        )

        def gen_ranges(batches: Iterator[_pd.DataFrame]):
            for pdf in batches:
                out = {k: [] for k in (
                    "urlkey", "timestamp", "url", "digest", "mime",
                    "status", "filename", "offset", "length",
                )}
                for f, grp in pdf.groupby("file", sort=True):
                    grp = grp.sort_values("offset")
                    with open(f, "rb") as fh:
                        for off, ln in zip(grp["offset"],
                                           grp["length"]):
                            fh.seek(int(off))
                            member = fh.read(int(ln))
                            for _o, _l, raw in iter_warc_member_spans(
                                member
                            ):
                                _entry_columns(
                                    out, f, int(off), int(ln), raw
                                )
                yield _pd.DataFrame(out)

        return spec.mapInPandas(gen_ranges, _ENTRY_SCHEMA)

    fdf = spark.createDataFrame([(f,) for f in files], "file string") \
        .repartition(len(files))

    def gen(batches: Iterator[_pd.DataFrame]):
        for pdf in batches:
            out = {k: [] for k in (
                "urlkey", "timestamp", "url", "digest", "mime",
                "status", "filename", "offset", "length",
            )}
            for f in pdf["file"]:
                with open(f, "rb") as fh:
                    data = fh.read()
                for off, ln, raw in iter_warc_member_spans(data):
                    _entry_columns(out, f, off, ln, raw)
            yield _pd.DataFrame(out)

    return fdf.mapInPandas(gen, _ENTRY_SCHEMA)


def build_cdxj(
    spark: SparkSession, warc_dir: str, out_dir: str, *,
    n_shards: int = 1,
) -> DataFrame:
    """Build the sharded CDXJ index for the archives under
    `warc_dir`: sorted ``part-NNNNN.cdxj`` shards + ``cluster.idx``
    (first urlkey + filename per shard). Returns the manifest
    (shard_id, n_entries, first_key)."""
    import pandas as _pd

    if n_shards < 1:
        raise ValueError(f"build_cdxj: n_shards must be >= 1, got {n_shards}")
    os.makedirs(out_dir, exist_ok=True)
    entries = _index_entries(spark, warc_dir)
    ranged = entries.repartitionByRange(
        n_shards, "urlkey", "timestamp"
    ).sortWithinPartitions("urlkey", "timestamp")

    out_schema = "shard_id int, n_entries long, first_key string"

    def write_part(it: Iterator[_pd.DataFrame]):
        from pyspark import TaskContext

        sid = TaskContext.get().partitionId()
        rows = list(it)
        pdf = _pd.concat(rows) if rows else _pd.DataFrame()
        if len(pdf) == 0:
            yield _pd.DataFrame(
                {"shard_id": [sid], "n_entries": [0],
                 "first_key": [None]}
            )
            return
        path = os.path.join(out_dir, f"part-{sid:05d}.cdxj")
        with open(path, "w", encoding="utf-8") as fh:
            for _, r in pdf.iterrows():
                payload = {
                    "url": r["url"], "digest": r["digest"],
                    "mime": r["mime"],
                    "status": (None if _pd.isna(r["status"])
                               else int(r["status"])),
                    "filename": r["filename"],
                    "offset": int(r["offset"]),
                    "length": int(r["length"]),
                }
                fh.write(
                    f"{r['urlkey']} {r['timestamp']} "
                    + json.dumps(payload, sort_keys=True) + "\n"
                )
        yield _pd.DataFrame(
            {"shard_id": [sid], "n_entries": [len(pdf)],
             "first_key": [pdf.iloc[0]["urlkey"]]}
        )

    manifest = [tuple(r) for r in
                ranged.mapInPandas(write_part, out_schema).collect()]
    with open(os.path.join(out_dir, "cluster.idx"), "w") as fh:
        for sid, n, first in sorted(manifest):
            if n:
                fh.write(f"{first}\tpart-{sid:05d}.cdxj\t{n}\n")
    return spark.createDataFrame(sorted(manifest), out_schema)


def _cluster_index(cdx_dir: str) -> list[tuple[str, str]] | None:
    """[(first_key, part filename)] sorted, or None when no
    cluster.idx exists (foreign index directories)."""
    path = os.path.join(cdx_dir, "cluster.idx")
    if not os.path.exists(path):
        return None
    out = []
    with open(path, encoding="utf-8") as fh:
        for ln in fh:
            ln = ln.rstrip("\n")
            if not ln:
                continue
            first_key, fname = ln.split("\t")[:2]
            out.append((first_key, fname))
    return out


def _shards_for_keys(
    cdx_dir: str, keys: list[str]
) -> list[str] | None:
    """The subset of part files that can contain any of `keys`, via a
    binary search over cluster.idx first keys (a key lives in the last
    shard whose first_key <= key — shard ranges are disjoint and
    sorted by construction). None when no cluster.idx exists."""
    import bisect

    cluster = _cluster_index(cdx_dir)
    if cluster is None:
        return None
    firsts = [c[0] for c in cluster]
    picked: set[str] = set()
    for k in keys:
        i = bisect.bisect_right(firsts, k) - 1
        if i >= 0:
            picked.add(cluster[i][1])
    return sorted(os.path.join(cdx_dir, f) for f in picked)


def read_cdxj(
    spark: SparkSession, cdx_dir: str, *,
    parts: list[str] | None = None,
) -> DataFrame:
    """The CDXJ index back as a DataFrame (one row per entry);
    `parts` restricts the scan to specific shard files (the
    cluster.idx pruning path lookup_warc uses)."""
    import glob as _glob

    import pandas as _pd

    if parts is None:
        parts = sorted(_glob.glob(os.path.join(cdx_dir, "part-*.cdxj")))
    if not parts:
        raise ValueError(f"read_cdxj: no part-*.cdxj under {cdx_dir!r}")
    pdf = spark.createDataFrame([(p,) for p in parts], "file string") \
        .repartition(len(parts))

    def gen(batches: Iterator[_pd.DataFrame]):
        for b in batches:
            out = {k: [] for k in (
                "urlkey", "timestamp", "url", "digest", "mime",
                "status", "filename", "offset", "length",
            )}
            for f in b["file"]:
                with open(f, encoding="utf-8") as fh:
                    for ln in fh:
                        ln = ln.strip()
                        if not ln:
                            continue
                        key, ts, js = ln.split(" ", 2)
                        e = json.loads(js)
                        out["urlkey"].append(key)
                        out["timestamp"].append(ts)
                        out["url"].append(e.get("url"))
                        out["digest"].append(e.get("digest"))
                        out["mime"].append(e.get("mime"))
                        out["status"].append(e.get("status"))
                        out["filename"].append(e.get("filename"))
                        out["offset"].append(e.get("offset"))
                        out["length"].append(e.get("length"))
            yield _pd.DataFrame(out)

    return pdf.mapInPandas(gen, _ENTRY_SCHEMA)


def lookup_warc(
    spark: SparkSession, warc_dir: str, cdx_dir: str,
    urls: DataFrame, *, url_col: str = "url",
) -> DataFrame:
    """Fetch the records for `urls` via the CDXJ index: wanted URLs
    are surt-keyed; cluster.idx prunes the index scan to only the
    shards whose key range can match (binary search over first keys —
    the ZipNum access pattern; a foreign index without cluster.idx
    falls back to the full shard list); the surviving shards are
    probed with a broadcast join (the index is never shuffled), and
    matching entries are byte-range-read from the archives grouped by
    file. Returns the read_warc row shape plus urlkey. Cost is
    bounded by matched shards + matches, never the index size."""
    import pandas as _pd

    wanted = urls.select(
        surt_key(url_col).alias("_want_key")
    ).filter(F.col("_want_key").isNotNull()).distinct()
    # the wanted side is small by contract (it broadcasts below);
    # collecting its keys here buys the shard prune
    keys = [r["_want_key"] for r in wanted.collect()]
    if not keys:
        return spark.createDataFrame(
            [],
            "urlkey string, warc_type string, record_id string,"
            " warc_date string, target_uri string, content_type"
            " string, http_status int, http_content_type string,"
            " payload binary",
        )
    parts = _shards_for_keys(cdx_dir, keys)
    if parts == []:
        parts = None  # keys all before the first shard: scan nothing
        idx = read_cdxj(spark, cdx_dir).limit(0)
    else:
        idx = read_cdxj(spark, cdx_dir, parts=parts)
    hits = idx.join(
        F.broadcast(wanted), idx["urlkey"] == F.col("_want_key"),
        "inner",
    ).select("urlkey", "filename", "offset", "length")

    schema = (
        "urlkey string, warc_type string, record_id string,"
        " warc_date string, target_uri string, content_type string,"
        " http_status int, http_content_type string, payload binary"
    )

    def gen(batches: Iterator[_pd.DataFrame]):
        for pdf in batches:
            out = {k: [] for k in (
                "urlkey", "warc_type", "record_id", "warc_date",
                "target_uri", "content_type", "http_status",
                "http_content_type", "payload",
            )}
            for fname, grp in pdf.groupby("filename", sort=True):
                path = os.path.join(warc_dir, fname)
                grp = grp.sort_values("offset")
                with open(path, "rb") as fh:
                    for key, off, ln in zip(
                        grp["urlkey"], grp["offset"], grp["length"]
                    ):
                        fh.seek(int(off))
                        member = fh.read(int(ln))
                        for _o, _l, raw in iter_warc_member_spans(
                            member
                        ):
                            rec = parse_warc_record(raw)
                            # foreign archives can pack several records
                            # into one gzip member (whole-file gzip,
                            # request+response pairs); keep only the
                            # records the index actually covers — the
                            # indexed warc_types whose target URI keys
                            # back to the looked-up urlkey — or a
                            # single-URL lookup returns (and mislabels)
                            # unrelated neighbours (r15, ADVICE)
                            if rec["warc_type"] not in (
                                "response", "conversion", "resource"
                            ):
                                continue
                            if surt_key_py(rec["target_uri"] or "") != key:
                                continue
                            out["urlkey"].append(key)
                            for k in (
                                "warc_type", "record_id", "warc_date",
                                "target_uri", "content_type",
                                "http_status", "http_content_type",
                                "payload",
                            ):
                                out[k].append(rec[k])
            yield _pd.DataFrame(out)

    par = max(spark.sparkContext.defaultParallelism, 1)
    return hits.repartition(par, "filename", "offset") \
        .mapInPandas(gen, schema)
