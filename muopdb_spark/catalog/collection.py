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

    def _commit_toc(self, segments: list[str], flushed_seq_no: int) -> int:
        v = self.current_version() + 1
        self._write_toc({"version": v, "segments": sorted(segments), "flushed_seq_no": flushed_seq_no})
        return v

    # ---------------------------------------------------------- writes

    def _wal_dir(self) -> str:
        return os.path.join(self.root, "wal")

    def _tombstone_dir(self) -> str:
        return os.path.join(self.root, "tombstones")

    def _next_seq_no(self) -> int:
        return self._max_seq_no() + 1

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

    # ----------------------------------------------------------- flush

    def _segment_dir(self, name: str) -> str:
        return os.path.join(self.root, "segments", name)

    def flush(self) -> str | None:
        """S5 Flush: WAL rows above the flushed watermark become a new
        immutable segment (docs parquet partitioned by user_id); the TOC
        advances atomically; returns the new segment name (None if the
        WAL has nothing new). Replays of the same WAL range are impossible
        afterwards because the watermark moved with the same commit (W3
        exactly-once)."""
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
            df = df.join(
                self.tombstones().select("user_id", "doc_id").distinct(),
                on=["user_id", "doc_id"], how="left_anti",
            )
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
        """A1 doc counts: total / deleted per segment (drives vacuum)."""
        toc = self.toc()
        tomb = self.tombstones().select("user_id", "doc_id").distinct()
        out = {}
        for seg in toc["segments"]:
            d = self.segment_docs(seg)
            total = d.count()
            deleted = d.join(tomb, on=["user_id", "doc_id"], how="left_semi").count()
            out[seg] = {"total": total, "deleted": deleted}
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
        df = df.join(
            self.tombstones().select("user_id", "doc_id").distinct(),
            on=["user_id", "doc_id"], how="left_anti",
        )
        merged = f"segment_{uuid.uuid4().hex[:12]}"
        (
            df.repartition("user_id")
            .write.partitionBy("user_id").mode("errorifexists")
            .parquet(os.path.join(self._segment_dir(merged), "docs"))
        )
        remaining = [s for s in toc["segments"] if s not in set(segs)] + [merged]
        self._commit_toc(remaining, toc["flushed_seq_no"])
        return merged

    def vacuum(self) -> list[str]:
        """Rewrite any segment whose deleted ratio exceeds the config
        threshold (default 0.1 — the reference's auto-vacuum trigger)."""
        rewritten = []
        tomb = self.tombstones().select("user_id", "doc_id").distinct()
        toc = self.toc()
        segments = list(toc["segments"])
        for seg in toc["segments"]:
            st = self.stats()[seg]
            if st["total"] == 0 or st["deleted"] / st["total"] <= self.config.vacuum_deleted_ratio:
                continue
            clean = self.segment_docs(seg).join(tomb, on=["user_id", "doc_id"], how="left_anti")
            new_seg = f"segment_{uuid.uuid4().hex[:12]}"
            (
                clean.repartition("user_id")
                .write.partitionBy("user_id").mode("errorifexists")
                .parquet(os.path.join(self._segment_dir(new_seg), "docs"))
            )
            segments = [s for s in segments if s != seg] + [new_seg]
            rewritten.append(new_seg)
        if rewritten:
            self._commit_toc(segments, toc["flushed_seq_no"])
        return rewritten

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
