"""Extended scale sweep (r6 verdict stretch #8): push the dedup / LM /
ANN / quality families past the sf0.1 fixture ceiling with SYNTHETIC
sf0.3 and sf0.5 corpora (3x / 5x sf0.1 rows), turning the "sub-linear
on the 10x step" claim into a two-decade trend and catching constants
that only bite past the fixture size.

Synthesis rule (deterministic, in /tmp): replica r of sf0.1 remaps ids
by +r*10^7; documents get every TOKEN suffixed with the ALPHANUMERIC
tag zz{r} so replicas are DISJOINT in shingle space — near-dup
structure replicates per-replica and candidate pairs grow LINEARLY
with corpus size, which is the growth law of a real corpus. Two
synthesis traps this deliberately avoids: verbatim replication makes
every doc a cross-replica near-dup (quadratic artifact), and a
SEPARATOR-bearing tag (an earlier _r{r} attempt) gets split off by the
operators' [^a-z0-9]+ tokenizers into a standalone token between every
word pair, flooding the corpus with ultra-common (tag, word, tag)
shingles — both measure the synthesis, not the operator. Embeddings
get a deterministic per-replica offset so ANN geometry stays
non-degenerate.

Output: a table appended by hand to docs/SCALING.md (this tool prints
it), absolute numbers best-of-2 after precompile, ratios the signal —
same protocol as tools/scale_sweep.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/muopdb_scale_ext"

# families the stretch names: dedup (prefix-filter + LSH), LM scoring,
# ANN (exact + SQ8 serving), per-source quality calibration
QUERIES = [
    "d2_dedup_ngram_jaccard",
    "d3_dedup_minhash_lsh",
    "t9_lm_perplexity",
    "t2_quality_score",
    "v1_knn_l2",
    "v24_sq8_rerank",
    "t11_quality_calibrated",
    "smp6_dsir_sample",
    "d9_exact_substring",
    "t13_ppl_buckets",
    "pipe2_curation_manifest_v2",
    # r8 extension (VERDICT r7 #7): vocab top-k, leakage-safe split,
    # importance-gated admission, BPE encode, and the d9 REMOVAL path
    # (the stats row above measures detection only)
    "t12_vocab_topk",
    "p6_leakage_safe_split",
    "w7_stream_importance_admission",
    "t14_bpe_encode",
    "d9_removal",  # local wrapper, see _extra_sweep_queries
    # r10 extension: the new curation operators with corpus-sized
    # inputs — token-level decontamination (broadcast benchmark probe +
    # span cut), the water-filling budget selection (rounds x
    # partial-agg scans), and the composed pipe3 manifest
    "c2_decontaminate_spans",
    "smp9_weighted_budget_fill",
    "pipe3_curation_manifest_v3",
    # late-r10 extension: fuzzy benchmark decontamination (benchmark
    # slice grows with the corpus here, so the broadcast side scales
    # too — a stricter test than the static-eval production case)
    "c3_fuzzy_decontaminate",
    # late-r10 extension: the Arrow canonicalization pass, the
    # per-source rollup report, and the phase-chained selection
    "t17_unicode_clean",
    "rep1_source_report",
    "smp10_annealing_schedule",
]


def _extra_sweep_queries():
    """Sweep-only callables for operator paths without a registered
    query: d9's remove_duplicate_spans (keep-first span removal + a
    materializing aggregate — the write-side cost of the span dedup
    family, vs the stats row's read side)."""
    from pyspark.sql import functions as F

    def d9_removal(spark, sf_dir):
        from muopdb_spark.operators.substring import remove_duplicate_spans

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return remove_duplicate_spans(docs, k=10).agg(
            F.count("*").alias("docs"),
            F.sum("kept_tokens").alias("kept_tokens"),
        )

    return {"d9_removal": d9_removal}


def synthesize(spark, replicas: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    if os.path.isdir(out_dir):
        return
    # the query registry caches durable artifacts keyed by sf_dir PATH
    # (sha1 of the path — immutable for the real fixtures); a
    # re-synthesized dir at the same path would otherwise serve stale
    # artifacts built from the previous corpus
    import hashlib
    import tempfile

    h = hashlib.sha1(out_dir.encode()).hexdigest()[:10]
    shutil.rmtree(
        os.path.join(tempfile.gettempdir(), "muopdb_spark_indexes", h),
        ignore_errors=True,
    )
    os.makedirs(out_dir, exist_ok=True)
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    embs = spark.read.parquet(f"{BASE}/embeddings.parquet")
    doc_parts, emb_parts = [], []
    for r in range(replicas):
        if r == 0:
            doc_parts.append(docs)
            emb_parts.append(embs)
            continue
        tag = F.lit(f"zz{r}")
        doc_parts.append(docs.select(
            (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
            F.array_join(
                F.transform(F.split(F.col("text"), " "),
                            lambda t: F.concat(t, tag)),
                " ",
            ).alias("text"),
            "lang", "source", "n_chars",
        ))
        off = F.lit(float(r) * 0.0017)
        emb_parts.append(embs.select(
            (F.col("vec_id") + r * 10_000_000).alias("vec_id"),
            F.transform(F.col("embedding"),
                        lambda x: (x + off).cast("float")).alias("embedding"),
            "label",
        ))
    d = doc_parts[0]
    for p in doc_parts[1:]:
        d = d.unionByName(p)
    e = emb_parts[0]
    for p in emb_parts[1:]:
        e = e.unionByName(p)
    d.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet")
    e.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet")


def main() -> None:
    from muopdb_spark.session import get_spark

    import __spark_entry__ as m

    spark = get_spark("scale-sweep-ext")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**m.queries(), **m.extra_queries(), **_extra_sweep_queries()}

    # optional argv filter: sweep only the named queries (incremental
    # extension runs don't re-pay the whole table)
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    queries = [q for q in QUERIES if not only or q in only]

    sf3 = os.path.join(WORK, "sf0.3")
    sf5 = os.path.join(WORK, "sf0.5")
    synthesize(spark, 3, sf3)
    synthesize(spark, 5, sf5)
    dirs = [("sf0.1", BASE), ("sf0.3", sf3), ("sf0.5", sf5)]

    times: dict[str, dict[str, float]] = {}
    for name in queries:
        qs[name](spark, "/root/testdata/sf0.001").collect()  # precompile
        times[name] = {}
        for label, d in dirs:
            best = None
            for _ in range(2):
                t0 = time.monotonic()
                qs[name](spark, d).collect()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            times[name][label] = round(best, 2)
            print(f"{name} @ {label}: {best:.2f}s", flush=True)

    print("\n| query | sf0.1 (s) | sf0.3 (s) | sf0.5 (s) | 3x step | 5x/1x |")
    print("|---|---|---|---|---|---|")
    for name, t in times.items():
        s1, s3, s5 = t["sf0.1"], t["sf0.3"], t["sf0.5"]
        print(f"| {name} | {s1:.2f} | {s3:.2f} | {s5:.2f} "
              f"| {s3 / max(s1, 1e-9):.1f}x | {s5 / max(s1, 1e-9):.1f}x |")
    print()
    print(json.dumps(times))
    spark.stop()


if __name__ == "__main__":
    main()
