"""Collection catalog + LSM-style segment lifecycle.

The reference Collection (rs/index/src/collection/core.rs:164) is a
config + versioned set of immutable segments + WAL + mutable in-memory
segment. Spark-first re-expression (SURVEY.md §1.1, §2.1, §2.9):

  layout on disk (any Hadoop-compatible FS):
    <root>/<name>/collection_config.json      (S1 DDL artifact; analog of
                                               collection_config.json,
                                               rs/index/src/collection/reader.rs:254)
    <root>/<name>/wal/                        staged inserts (parquet,
                                               seq_no column) — the WAL
    <root>/<name>/tombstones/                 delete marks (S4; analog of
                                               invalidated_ids.rs:9-44)
    <root>/<name>/segments/<seg>/docs/        flushed immutable docs
    <root>/<name>/versions/version_N.json     TOC (rs/index/src/collection/
                                               mod.rs:20-53): active segment
                                               names + flushed seq_no

  semantics:
    - insert/remove append with a monotonic seq_no (W3; wal/entry.rs:6-24)
    - flush (S5; core.rs:867-976) freezes WAL rows > flushed_seq_no into
      a new immutable segment and commits a new TOC version atomically
      (write temp + rename — the version-file swap of core.rs:1014-1162)
    - searches read ONLY flushed segments (W5 read-your-writes boundary:
      core.rs:812-813 "not immediately searchable") and anti-join
      tombstones (V20)
    - merge_segments / vacuum (S10, §4.2 compaction; optimizers/merge.rs:38,
      vacuum.rs:38) rewrite segments and swap the TOC; old versions remain
      readable (MVCC snapshots, core.rs:978-1011) until garbage-collected
    - auto_optimize applies the reference's default policies: vacuum when
      deleted/total > 0.1 (immutable_segment.rs:75-82), merge when
      segment count > max_segments (collection.rs:168-170)
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class CollectionConfig:
    """Analog of CollectionConfig (rs/config/src/collection.rs:8)."""

    name: str
    num_features: int
    metric: str = "l2"                       # DistanceType (enums.rs:21-26)
    attribute_schema: dict = field(default_factory=dict)  # field -> text|keyword|int|float|bool
    num_centroids: int = 10                  # collection.rs:65-69
    max_posting_size: int | None = None
    max_clusters_per_vector: int = 1
    distance_threshold: float = 0.1
    quantizer: str = "none"                  # none | pq (enums.rs:4-9)
    vacuum_deleted_ratio: float = 0.1        # immutable_segment.rs:75-82
    max_segments: int = 10                   # collection.rs:168-170

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "CollectionConfig":
        return cls(**json.loads(s))


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
    return total


def _atomic_write(path: str, content: str) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d)
    with os.fdopen(fd, "w") as f:
        f.write(content)
    os.replace(tmp, path)  # atomic on POSIX — the TOC version swap


class Collection:
    """One collection = one directory tree + a SparkSession."""

    def __init__(self, spark: SparkSession, root: str, config: CollectionConfig):
        self.spark = spark
        self.root = os.path.join(root, config.name)
        self.config = config

    # ------------------------------------------------------------ DDL

    @classmethod
    def create(cls, spark: SparkSession, root: str, config: CollectionConfig) -> "Collection":
        """S1 CreateCollection: persist config + empty TOC version_0."""
        col = cls(spark, root, config)
        if os.path.exists(col._config_path()):
            raise ValueError(f"collection {config.name!r} already exists")
        _atomic_write(col._config_path(), config.to_json())
        col._write_toc({"version": 0, "segments": [], "flushed_seq_no": -1})
        return col

    @classmethod
    def open(cls, spark: SparkSession, root: str, name: str) -> "Collection":
        cfg_path = os.path.join(root, name, "collection_config.json")
        with open(cfg_path) as f:
            config = CollectionConfig.from_json(f.read())
        return cls(spark, root, config)

    def _config_path(self) -> str:
        return os.path.join(self.root, "collection_config.json")

    # ------------------------------------------------------------ TOC

    def _versions_dir(self) -> str:
        return os.path.join(self.root, "versions")

    def current_version(self) -> int:
        vs = [
            int(p.split("_")[1].split(".")[0])
            for p in os.listdir(self._versions_dir())
            if p.startswith("version_")
        ]
        return max(vs)

    def toc(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        with open(os.path.join(self._versions_dir(), f"version_{v}.json")) as f:
            return json.load(f)

    def _write_toc(self, toc: dict) -> None:
        _atomic_write(
            os.path.join(self._versions_dir(), f"version_{toc['version']}.json"),
            json.dumps(toc, indent=2, sort_keys=True),
        )

    def _commit_toc(
        self,
        segments: list[str],
        flushed_seq_no: int,
        tomb_applied: dict[str, int] | None = None,
    ) -> int:
        """tomb_applied maps segment -> highest tombstone seq_no already
        physically applied (rows dropped) when the segment was written:
        -1 for fresh flushes, the rewrite-time tombstone high-water mark
        for vacuum/merge outputs. Tombstones at or below every segment's
        watermark are fully applied and can be dropped (the reference
        clears invalidated ids the same way when optimizers rewrite a
        segment)."""
        v = self.current_version() + 1
        prev = self.toc().get("tomb_applied", {})
        applied = {s: (tomb_applied or {}).get(s, prev.get(s, -1)) for s in segments}
        self._write_toc({
            "version": v, "segments": sorted(segments),
            "flushed_seq_no": flushed_seq_no, "tomb_applied": applied,
        })
        return v

    # ---------------------------------------------------------- writes

    def _wal_dir(self) -> str:
        return os.path.join(self.root, "wal")

    def _tombstone_dir(self) -> str:
        return os.path.join(self.root, "tombstones")

    def _seq_path(self) -> str:
        return os.path.join(self.root, "seq_counter.json")

    def _next_seq_no(self) -> int:
        """Allocate the next monotonic seq_no from a persisted counter
        file (atomic-rename update, same pattern as the TOC swap) — one
        file read instead of a WAL+tombstone scan per write. Falls back
        to a one-time scan when the counter file is absent (collections
        created before the counter existed). Single-writer semantics,
        like the reference's in-process AtomicU64; concurrent writers
        need an external lock, which the reference gets from living in
        one process (core.rs group commit)."""
        if os.path.exists(self._seq_path()):
            with open(self._seq_path()) as f:
                nxt = json.load(f)["next"]
        else:
            nxt = self._max_seq_no() + 1
        _atomic_write(self._seq_path(), json.dumps({"next": nxt + 1}))
        return nxt

    def _max_seq_no(self) -> int:
        hi = -1
        for d in (self._wal_dir(), self._tombstone_dir()):
            if os.path.isdir(d) and any(p.endswith(".parquet") for p in os.listdir(d)):
                m = self.spark.read.parquet(d).agg(F.max("seq_no")).first()[0]
                hi = max(hi, m if m is not None else -1)
        return hi

    def insert(self, df: DataFrame) -> int:
        """S2 Insert: stamp one seq_no per batch (group commit — the whole
        batch is one WAL append, core.rs:537-745) and append to the WAL.
        Returns the assigned seq_no."""
        seq = self._next_seq_no()
        vec_len_ok = df.filter(F.size("vector") != self.config.num_features).isEmpty()
        if not vec_len_ok:
            raise ValueError(f"vector length != num_features={self.config.num_features}")
        (
            df.withColumn("seq_no", F.lit(seq).cast("long"))
            .write.mode("append").parquet(self._wal_dir())
        )
        return seq

    def remove(self, user_ids: list[int], doc_ids: list[int]) -> int:
        """S4 Remove: tombstone append, not physical delete."""
        seq = self._next_seq_no()
        rows = [(u, d, seq) for u in user_ids for d in doc_ids]
        tdf = self.spark.createDataFrame(rows, "user_id long, doc_id long, seq_no long")
        tdf.write.mode("append").parquet(self._tombstone_dir())
        return seq

    def tombstones(self) -> DataFrame:
        d = self._tombstone_dir()
        if os.path.isdir(d) and any(p.endswith(".parquet") for p in os.listdir(d)):
            return self.spark.read.parquet(d)
        return self.spark.createDataFrame([], "user_id long, doc_id long, seq_no long")

    def _tomb_latest(self) -> DataFrame:
        """Newest tombstone per (user, doc) — the only one that matters
        for masking, since tombstone seq_nos are totally ordered."""
        return (
            self.tombstones()
            .groupBy("user_id", "doc_id")
            .agg(F.max("seq_no").alias("tomb_seq"))
        )

    def _apply_tombstones(self, df: DataFrame) -> DataFrame:
        """V20 masking, seq_no-aware: a tombstone hides only doc rows
        written AT OR BEFORE it (docs.seq_no <= tomb.seq_no), so a doc
        re-inserted after a remove is searchable again — matching the
        reference, which invalidates only ids present at remove time
        (core.rs remove_impl guards on sequence_number). Planned as an
        anti hash join on the (user_id, doc_id) equi keys with the
        seq_no comparison as the join residual — no nested loop."""
        t = self._tomb_latest().select(
            F.col("user_id").alias("_tu"), F.col("doc_id").alias("_td"), "tomb_seq"
        )
        cond = (
            (df["user_id"] == t["_tu"]) & (df["doc_id"] == t["_td"])
            & (df["seq_no"] <= t["tomb_seq"])
        )
        return df.join(t, cond, "left_anti")

    # ----------------------------------------------------------- flush

    def _segment_dir(self, name: str) -> str:
        return os.path.join(self.root, "segments", name)

    def flush(self) -> str | None:
        """S5 Flush: WAL rows above the flushed watermark become a new
        immutable segment (docs parquet partitioned by user_id); the TOC
        advances atomically; returns the new segment name (None if the
        WAL has nothing new). The watermark makes re-flushing an
        already-flushed WAL range a no-op; end-to-end the guarantee is
        at-least-once for the WRITE path (a crashed writer may re-append
        with a fresh seq_no — same as any at-least-once producer; the
        streaming path dedups replays by batch_id, see
        streaming/ingest.py), exactly-once for flush itself."""
        toc = self.toc()
        wal = self._wal_dir()
        if not (os.path.isdir(wal) and any(p.endswith(".parquet") for p in os.listdir(wal))):
            return None
        pending = self.spark.read.parquet(wal).filter(F.col("seq_no") > toc["flushed_seq_no"])
        if pending.isEmpty():
            return None
        seg = f"segment_{uuid.uuid4().hex[:12]}"
        new_hi = pending.agg(F.max("seq_no")).first()[0]
        (
            pending.repartition("user_id")
            .write.partitionBy("user_id").mode("errorifexists")
            .parquet(os.path.join(self._segment_dir(seg), "docs"))
        )
        self._commit_toc(toc["segments"] + [seg], new_hi)
        return seg

    # ------------------------------------------------------------ reads

    def segment_docs(self, seg: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._segment_dir(seg), "docs"))

    def docs(self, version: int | None = None, with_tombstones: bool = False) -> DataFrame:
        """All flushed docs at a TOC version (MVCC snapshot read), with
        tombstones anti-joined unless asked otherwise (V20)."""
        toc = self.toc(version)
        segs = toc["segments"]
        if not segs:
            empty = "user_id long, doc_id long, vector array<float>, seq_no long"
            return self.spark.createDataFrame([], empty)
        df = self.segment_docs(segs[0])
        for s in segs[1:]:
            df = df.unionByName(self.spark.read.parquet(
                os.path.join(self._segment_dir(s), "docs")), allowMissingColumns=True)
        if not with_tombstones:
            df = self._apply_tombstones(df)
        return df

    def search(self, user_ids, query_vector, k, *, pre_filter=None, version=None) -> DataFrame:
        """§3.1 Search over all flushed segments: the per-segment /
        per-user loops of snapshot.rs:39-109 collapse into one DataFrame
        plan — union of segments, tombstone anti-join, score, top-k."""
        from muopdb_spark.operators.knn import knn

        return knn(
            self.docs(version=version),
            query_vector, k,
            vector_col="vector", id_col="doc_id",
            metric=self.config.metric,
            user_ids=user_ids, user_col="user_id",
            pre_filter=pre_filter,
        )

    def term_search(self, user_ids, filter_tree, limit, *, version=None) -> DataFrame:
        """§3.2 TermSearch over flushed docs."""
        from muopdb_spark.filters.compiler import FilterSchema, term_search
        from muopdb_spark.functions.text import stemmed_tokens

        docs = self.docs(version=version)
        schema_fields = {
            f: t for f, t in self.config.attribute_schema.items() if t in ("text", "keyword")
        }
        schema = FilterSchema(schema_fields)
        for fld, kind in schema_fields.items():
            if kind == "text":
                docs = docs.withColumn(fld + "_tokens", stemmed_tokens(F.col(fld)))
        return term_search(docs, filter_tree, schema, limit,
                           id_col="doc_id", user_ids=user_ids)

    # ------------------------------------------------------ maintenance

    def stats(self) -> dict:
        """A1 doc counts + byte sizes per segment (drives vacuum; the
        admin GetSegments parity — the reference returns segment sizes,
        admin.proto / admin_server.rs). ONE Spark job for all segments:
        segments union with a segment tag column, left join the latest
        tombstones, one groupBy — not a pair of count jobs per segment."""
        toc = self.toc()
        out: dict = {}
        if toc["segments"]:
            parts = [
                self.segment_docs(s)
                .select("user_id", "doc_id", "seq_no")
                .withColumn("_seg", F.lit(s))
                for s in toc["segments"]
            ]
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
            t = self._tomb_latest().select(
                F.col("user_id").alias("_tu"), F.col("doc_id").alias("_td"), "tomb_seq"
            )
            joined = df.join(
                t, (df["user_id"] == t["_tu"]) & (df["doc_id"] == t["_td"]), "left"
            )
            agg = (
                joined.groupBy("_seg")
                .agg(
                    F.count(F.lit(1)).alias("total"),
                    F.sum(
                        F.when(F.col("seq_no") <= F.col("tomb_seq"), 1).otherwise(0)
                    ).alias("deleted"),
                )
                .collect()
            )
            for r in agg:
                out[r["_seg"]] = {"total": r["total"], "deleted": int(r["deleted"] or 0)}
        for seg in toc["segments"]:
            info = out.setdefault(seg, {"total": 0, "deleted": 0})
            info["size_bytes"] = _dir_bytes(self._segment_dir(seg))
        return out

    def merge_segments(self, seg_names: list[str] | None = None) -> str:
        """S10 MergeSegments: rewrite N segments as one; tombstoned rows
        are dropped during the rewrite (merge+vacuum in one pass, like
        optimizers/merge.rs); TOC swap is atomic."""
        toc = self.toc()
        segs = seg_names if seg_names is not None else toc["segments"]
        if not segs:
            return ""
        df = self.segment_docs(segs[0])
        for s in segs[1:]:
            df = df.unionByName(self.segment_docs(s), allowMissingColumns=True)
        df = self._apply_tombstones(df)
        applied_hi = self._tombstone_hi()
        merged = f"segment_{uuid.uuid4().hex[:12]}"
        (
            df.repartition("user_id")
            .write.partitionBy("user_id").mode("errorifexists")
            .parquet(os.path.join(self._segment_dir(merged), "docs"))
        )
        remaining = [s for s in toc["segments"] if s not in set(segs)] + [merged]
        self._commit_toc(remaining, toc["flushed_seq_no"], {merged: applied_hi})
        self._prune_tombstones()
        return merged

    def vacuum(self) -> list[str]:
        """Rewrite any segment whose deleted ratio exceeds the config
        threshold (default 0.1 — the reference's auto-vacuum trigger).
        stats() is computed ONCE up front (one Spark job for all
        segments), not per segment."""
        rewritten = []
        toc = self.toc()
        segments = list(toc["segments"])
        all_stats = self.stats()
        applied_hi = self._tombstone_hi()
        applied: dict[str, int] = {}
        for seg in toc["segments"]:
            st = all_stats[seg]
            if st["total"] == 0 or st["deleted"] / st["total"] <= self.config.vacuum_deleted_ratio:
                continue
            clean = self._apply_tombstones(self.segment_docs(seg))
            new_seg = f"segment_{uuid.uuid4().hex[:12]}"
            (
                clean.repartition("user_id")
                .write.partitionBy("user_id").mode("errorifexists")
                .parquet(os.path.join(self._segment_dir(new_seg), "docs"))
            )
            segments = [s for s in segments if s != seg] + [new_seg]
            applied[new_seg] = applied_hi
            rewritten.append(new_seg)
        if rewritten:
            self._commit_toc(segments, toc["flushed_seq_no"], applied)
            self._prune_tombstones()
        return rewritten

    def _tombstone_hi(self) -> int:
        """Highest tombstone seq_no on disk (-1 when none)."""
        m = self.tombstones().agg(F.max("seq_no")).first()[0]
        return m if m is not None else -1

    def _prune_tombstones(self) -> int:
        """Drop tombstones fully applied to EVERY segment of the current
        TOC (seq_no <= the minimum per-segment applied watermark) — the
        analog of the reference clearing invalidated ids when optimizers
        rewrite segments. Older MVCC versions may still reference
        unrewritten segments only through their own TOCs; pruning keys
        off the CURRENT version, matching the reference (snapshots there
        hold invalidation bitmaps, not the tombstone log). Returns the
        number of tombstone rows dropped."""
        toc = self.toc()
        applied = toc.get("tomb_applied", {})
        if not toc["segments"]:
            return 0
        floor = min(applied.get(s, -1) for s in toc["segments"])
        if floor < 0:
            return 0
        tomb = self.tombstones()
        doomed = tomb.filter(F.col("seq_no") <= floor).count()
        if not doomed:
            return 0
        survivors = tomb.filter(F.col("seq_no") > floor)
        tmp = self._tombstone_dir() + ".rewrite"
        survivors.write.mode("overwrite").parquet(tmp)
        import shutil

        shutil.rmtree(self._tombstone_dir())
        os.replace(tmp, self._tombstone_dir())
        return doomed

    def auto_optimize(self) -> dict:
        """W7 background-loop policy: vacuum over-threshold segments,
        then merge if the segment count exceeds max_segments."""
        actions: dict = {"vacuumed": self.vacuum(), "merged": None}
        if len(self.toc()["segments"]) > self.config.max_segments:
            actions["merged"] = self.merge_segments()
        return actions

    def gc_versions(self, keep_latest: int = 2) -> dict:
        """MVCC garbage collection (core.rs:1183-1226: versions are
        refcounted and GC'd once superseded): drop all but the newest
        `keep_latest` TOC versions, then delete any segment directory no
        longer referenced by a surviving version. Readers pinned to a
        surviving version are unaffected; there is no in-process refcount
        — retention depth is the external-reader grace period, exactly
        like table-format VACUUM retention."""
        import shutil

        versions = sorted(
            int(p.split("_")[1].split(".")[0])
            for p in os.listdir(self._versions_dir())
            if p.startswith("version_")
        )
        doomed = versions[:-keep_latest] if keep_latest > 0 else versions[:-1]
        survivors = [v for v in versions if v not in set(doomed)]
        referenced: set[str] = set()
        for v in survivors:
            referenced.update(self.toc(v)["segments"])
        removed_versions = []
        for v in doomed:
            os.remove(os.path.join(self._versions_dir(), f"version_{v}.json"))
            removed_versions.append(v)
        removed_segments = []
        seg_root = os.path.join(self.root, "segments")
        if os.path.isdir(seg_root):
            for seg in os.listdir(seg_root):
                if seg not in referenced:
                    shutil.rmtree(os.path.join(seg_root, seg))
                    removed_segments.append(seg)
        return {"versions": removed_versions, "segments": sorted(removed_segments)}

    def build_index(self) -> "object":
        """S5's index-build half: IVF over all flushed docs (per-user
        indexes come from partitioning — the per-user SPANN analog)."""
        from muopdb_spark.index.ivf import build_ivf

        return build_ivf(
            self.docs(), vec_col="vector", id_col="doc_id",
            num_centroids=self.config.num_centroids,
            metric=self.config.metric,
            max_posting_size=self.config.max_posting_size,
            distance_threshold=self.config.distance_threshold,
            max_clusters_per_vector=self.config.max_clusters_per_vector,
        )

    def build_quantizer(self, num_subvectors: int = 4, num_centers: int = 16):
        """M5 / QuantizerType: train the collection's PQ codebook when
        config.quantizer == 'pq' (enums.rs:4-9 gates the same way)."""
        if self.config.quantizer != "pq":
            raise ValueError(
                f"collection quantizer is {self.config.quantizer!r}, not 'pq'"
            )
        from muopdb_spark.index.pq import train_pq

        return train_pq(
            self.docs(), vec_col="vector",
            num_subvectors=num_subvectors, num_centers=num_centers,
        )

    def search_pq(self, codebook, user_ids, query_vector, k) -> DataFrame:
        """PQ-scored search: encode the (user-pruned, tombstone-masked)
        docs and rank by asymmetric distance."""
        from pyspark.sql import functions as SF

        from muopdb_spark.index.pq import pq_encode, pq_search

        docs = self.docs()
        if user_ids is not None:
            docs = docs.filter(SF.col("user_id").isin(list(user_ids)))
        enc = pq_encode(docs, codebook, vec_col="vector")
        return pq_search(enc, query_vector, codebook, k, id_col="doc_id")
