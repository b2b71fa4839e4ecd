"""sf1.0 spot-run for the SHUFFLE-HEAVY scale witnesses (r8 verdict ask,
executed r10): t15 line_dedup (distinct-line exchange + doc reassembly
shuffle) and smp7 soft_dedup_weights (corpus-wide gram-df shuffle +
join-back). The r8 spot-run covered only artifact-served/cheap queries
(d9/smp6/v24); these two are the ones whose exchanges actually grow
with the corpus, so they are the honest 3-decade witnesses.

Synthetic sf1.0 = 10 disjoint-token-space replicas of sf0.1 (the
scale_sweep_ext synthesis rule — near-dup/boilerplate structure grows
linearly like a real corpus instead of multiplying cross-replica
collisions). Best-of-2 after an sf0.001 precompile rep.

Consumption: full-computation aggregates (count + sums over every
output column) rather than .collect() — t15's output carries the
reassembled text_clean (~corpus-sized), and a GB-scale driver fetch
would time the single-threaded transfer, not the distributed work the
witness is about. The aggregate forces every shuffle and the complete
string reassembly on the executors.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.scale_sweep_ext import BASE, WORK, synthesize  # noqa: E402


def _consume_t15(spark, sf_dir):
    from muopdb_spark.operators.dedup import line_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        line_dedup(docs)
        .agg(
            F.count("*"),
            F.sum(F.length("text_clean")),
            F.sum("n_lines"),
            F.sum("kept_lines"),
        )
        .collect()
    )


def _consume_smp7(spark, sf_dir):
    from muopdb_spark.operators.dedup import soft_dedup_weights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        soft_dedup_weights(docs, n=3)
        .agg(F.count("*"), F.sum("n_grams"), F.sum("soft_weight"))
        .collect()
    )


def _consume_rep1(spark, sf_dir):
    from muopdb_spark.operators.contamination import benchmark_grams
    from muopdb_spark.operators.report import source_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bg = benchmark_grams(docs.filter(F.col("doc_id") % 20 == 0))
    return (
        source_report(docs, lang_col="lang", bench_grams=bg)
        .agg(F.count("*"), F.sum("n_docs"), F.sum("total_tokens"),
             F.sum("exact_dup_rate"), F.sum("contaminated_rate"))
        .collect()
    )


def _consume_smp10(spark, sf_dir):
    # budgets scale WITH the corpus (55% / 18% of token mass) so the
    # partial-cap selection regime — the interesting one — holds at
    # every decade instead of saturating
    from muopdb_spark.operators.sampling import phase_budget_schedule
    from muopdb_spark.operators.textstats import (
        quality_features,
        ws_token_count,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select(
        "doc_id", ws_token_count("text").cast("long").alias("n_tokens")
    ).join(
        quality_features(docs).select("doc_id", "quality"), "doc_id"
    ).withColumn("uniform", F.lit(1.0)).localCheckpoint(eager=True)
    total = base.agg(F.sum("n_tokens")).first()[0]
    return (
        phase_budget_schedule(
            base, key_col="doc_id", token_col="n_tokens",
            phases=[("warmup", "uniform", int(0.55 * total)),
                    ("anneal", "quality", int(0.18 * total))],
        )
        .agg(F.count("*"), F.sum("fraction"))
        .collect()
    )


def _consume_m3(spark, sf_dir):
    # r12: image perceptual near-dup — per-doc PNG encode/decode rides
    # map-side Arrow; the banded join's bucket sizes stay ~10 at every
    # scale (classes are doc_id % (n/10)), so pair count grows linearly
    import __spark_entry__ as entry_mod

    return (
        entry_mod.q_image_phash_dedup(spark, sf_dir)
        .agg(F.count("*"), F.sum("hamming"))
        .collect()
    )


def _consume_m4(spark, sf_dir):
    # r12: audio spectral-fingerprint near-dup, same shape as m3
    import __spark_entry__ as entry_mod

    return (
        entry_mod.q_audio_fingerprint_dedup(spark, sf_dir)
        .agg(F.count("*"), F.sum("hamming"))
        .collect()
    )


def _consume_m9(spark, sf_dir):
    # r13: MJPEG-in-AVI frame extraction — encode+container-walk+JPEG
    # decode all map-side Arrow; no shuffle grows with the corpus
    import __spark_entry__ as entry_mod

    return (
        entry_mod.q_avi_frame_scan(spark, sf_dir)
        .agg(F.count("*"), F.sum("height"), F.sum("width"))
        .collect()
    )


def _consume_url1(spark, sf_dir):
    # r13: URL canonicalize + dedup + domain cap — one scan + two
    # window shuffles (the only terms that grow)
    import __spark_entry__ as entry_mod

    return (
        entry_mod.q_url_domain_cap(spark, sf_dir)
        .agg(F.count("*"), F.count_distinct("domain"))
        .collect()
    )


def _consume_html1(spark, sf_dir):
    # r13: HTML -> text extraction — pure map-side Arrow parse; the
    # agg consumes the full extracted text so executors do all of it
    import __spark_entry__ as entry_mod

    return (
        entry_mod.q_html_extract(spark, sf_dir)
        .agg(F.count("*"), F.sum(F.length("text")), F.sum("n_links"))
        .collect()
    )


def _consume_warc1(spark, sf_dir):
    # r14: WARC export + byte-range indexed read — the write is one
    # shard shuffle, the read parallelism is record-count-bounded
    import __spark_entry__ as entry_mod

    return (
        entry_mod.q_warc_roundtrip(spark, sf_dir)
        .agg(F.count("*"), F.sum("ok"))
        .collect()
    )


def _consume_pdf1(spark, sf_dir):
    # r14: PDF text-layer extraction — synth + parse both map-side
    # Arrow; the agg consumes the full extracted text
    import __spark_entry__ as entry_mod

    return (
        entry_mod.q_pdf_text_extract(spark, sf_dir)
        .agg(F.count("*"), F.sum(F.length("text")))
        .collect()
    )


def _consume_lg1(spark, sf_dir):
    # r14: link-graph PageRank prior — the corpus-sized term is the
    # edge aggregate; the iteration joins run over the |domains|-sized
    # rank table, which does NOT grow with the corpus here
    import __spark_entry__ as entry_mod

    return (
        entry_mod.q_link_graph_prior(spark, sf_dir)
        .agg(F.count("*"), F.sum("rank"))
        .collect()
    )


def _consume_cdx1(spark, sf_dir):
    # r14: CDXJ build (member walk + range-partitioned sort) +
    # SURT-keyed broadcast lookup — index sort is the growing term
    import __spark_entry__ as entry_mod

    return (
        entry_mod.q_cdx_lookup(spark, sf_dir)
        .agg(F.count("*"), F.sum("ok"))
        .collect()
    )


def _consume_rob1(spark, sf_dir):
    # r14: robots gate — hosts-side Arrow parse is constant-size; the
    # corpus side is a broadcast join + JVM rule fold, map-side only
    import __spark_entry__ as entry_mod

    return (
        entry_mod.q_robots_gate(spark, sf_dir)
        .agg(F.count("*"), F.sum(F.col("allowed").cast("long")))
        .collect()
    )


def _consume_t20(spark, sf_dir):
    # r14: unigram Viterbi encode — map-side Arrow with per-batch
    # word cache; Zipf repetition keeps per-row cost ~O(1)
    import __spark_entry__ as entry_mod

    return (
        entry_mod.q_unigram_encode(spark, sf_dir)
        .agg(F.count("*"), F.sum("n_pieces"))
        .collect()
    )


def _consume_html2(spark, sf_dir):
    # r15: density main-content extraction — same map-side Arrow shape
    # as html1 plus the pure-Python block classifier per page
    import __spark_entry__ as entry_mod

    return (
        entry_mod.q_html_main_content(spark, sf_dir)
        .agg(F.count("*"), F.sum(F.length("text")), F.sum("n_kept"))
        .collect()
    )


def _consume_t22(spark, sf_dir):
    # r15: non-Latin lang-ID — pure JVM codegen map pass (regexp_count
    # script classes + stopword HOFs); agg consumes every column
    import __spark_entry__ as entry_mod

    return (
        entry_mod.q_lang_id_multiscript(spark, sf_dir)
        .agg(F.count("*"), F.sum("kana_chars"), F.sum("hangul_chars"),
             F.sum("han_chars"), F.sum("score_ru"))
        .collect()
    )


def _consume_pdf3(spark, sf_dir):
    # r15: PDF text extraction through standard-security decryption —
    # the pdf1 shape + per-doc RC4/AES work, R6 2.B memoized per worker
    import __spark_entry__ as entry_mod

    return (
        entry_mod.q_pdf_encrypted_extract(spark, sf_dir)
        .agg(F.count("*"), F.sum(F.length("text")))
        .collect()
    )


WITNESSES = {
    "t15_line_dedup (agg-consumed)": _consume_t15,
    "smp7_soft_dedup_weights (agg-consumed)": _consume_smp7,
    # late-r10 extension
    "rep1_source_report (agg-consumed)": _consume_rep1,
    "smp10_annealing_schedule (agg-consumed)": _consume_smp10,
    # r12 extension: the multimodal codecs + banded fingerprint joins
    "m3_image_phash_dedup (agg-consumed)": _consume_m3,
    "m4_audio_fingerprint_dedup (agg-consumed)": _consume_m4,
    # r13 extension: video frame extraction + the acquisition families
    "m9_avi_frame_scan (agg-consumed)": _consume_m9,
    "url1_domain_cap (agg-consumed)": _consume_url1,
    "html1_extract_text (agg-consumed)": _consume_html1,
    # r14 extension: the rest of the acquisition stack + tokenizers
    "warc1_crawl_roundtrip (agg-consumed)": _consume_warc1,
    "pdf1_text_extract (agg-consumed)": _consume_pdf1,
    "lg1_link_graph_prior (agg-consumed)": _consume_lg1,
    "cdx1_index_lookup (agg-consumed)": _consume_cdx1,
    "rob1_robots_gate (agg-consumed)": _consume_rob1,
    "t20_unigram_encode (agg-consumed)": _consume_t20,
    # r15 extension: density main-content extraction, non-Latin
    # lang-ID, extraction through standard-security encryption
    "html2_main_content (agg-consumed)": _consume_html2,
    "t22_lang_id_multiscript (agg-consumed)": _consume_t22,
    "pdf3_encrypted_extract (agg-consumed)": _consume_pdf3,
}


def main() -> None:
    from muopdb_spark.session import get_spark

    spark = get_spark("sf1-witnesses")
    spark.sparkContext.setLogLevel("ERROR")

    sf1 = os.path.join(WORK, "sf1.0")
    synthesize(spark, 10, sf1)
    dirs = [("sf0.1", BASE), ("sf1.0", sf1)]

    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    todo = {n: f for n, f in WITNESSES.items()
            if not only or any(o in n for o in only)}
    times: dict[str, dict[str, float]] = {}
    for name, fn in todo.items():
        fn(spark, "/root/testdata/sf0.001")  # precompile
        times[name] = {}
        for label, d in dirs:
            best = None
            for _ in range(2):
                t0 = time.monotonic()
                fn(spark, d)
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            times[name][label] = round(best, 2)
            print(f"{name} @ {label}: {times[name][label]:.2f}s", flush=True)

    print("\n| query | sf0.1 (s) | sf1.0 (s) | 10x step |")
    print("|---|---|---|---|")
    for name, t in times.items():
        s1, s10 = t["sf0.1"], t["sf1.0"]
        print(f"| {name} | {s1:.2f} | {s10:.2f} "
              f"| {s10 / max(s1, 1e-9):.1f}x |")
    print()
    print(json.dumps(times))
    spark.stop()


if __name__ == "__main__":
    main()
