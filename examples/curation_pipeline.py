"""End-to-end training-data curation pipeline over the documents
fixture — the full pass a pretraining corpus goes through before
tokenization, each stage one of the engine's operators:

    JSONL ingest -> exact dedup -> line-level keep-first dedup ->
    near-dup clustering with quality-aware KEEP-BEST resolution ->
    passage-dup filter -> duplicated-span removal -> benchmark
    decontamination -> PII scrub ->
    repetition-quality filter -> stratified sampling -> soft-dedup
    reweighting + weighted token-budget selection -> sequence
    packing -> parquet out -> DAY 2: incremental dedup of a new batch
    against the curated corpus's durable signature artifact

Run: python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from muopdb_spark.operators.contamination import contamination_report_split  # noqa: E402
from muopdb_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    ngram_jaccard_pairs,
    passage_dedup_stats,
)
from muopdb_spark.operators.substring import remove_duplicate_spans  # noqa: E402
from muopdb_spark.operators.export import write_shards  # noqa: E402
from muopdb_spark.operators.graph import dup_clusters  # noqa: E402
from muopdb_spark.operators.lm import (  # noqa: E402
    lm_bits_per_token,
    perplexity_buckets,
)
from muopdb_spark.operators.packing import chunk_documents  # noqa: E402
from muopdb_spark.operators.quality_model import (  # noqa: E402
    score_quality,
    train_quality_classifier,
)
from muopdb_spark.operators.packing import pack_sequences, sequence_stats  # noqa: E402
from muopdb_spark.operators.pii import scrub_pii  # noqa: E402
from muopdb_spark.operators.quality import (  # noqa: E402
    c4_line_filter, gopher_quality_flags, quality_percentile_by_source,
    repetition_stats,
)
from muopdb_spark.operators.sampling import stratified_hash_sample  # noqa: E402
from muopdb_spark.operators.textstats import ws_token_count  # noqa: E402
from muopdb_spark.session import get_spark  # noqa: E402
from muopdb_spark.sources.jsonl import read_jsonl, write_jsonl  # noqa: E402


def _pin(df, prev=None):
    """Materialize a pipeline stage and TRUNCATE its lineage
    (localCheckpoint): by stage 9 the logical plan is ~10 stages of
    joins/UDFs deep and every later action re-plans all of it —
    Catalyst analysis cost is super-linear in plan size, and the
    un-truncated example spent minutes in the driver planning hundreds
    of micro-jobs. Checkpointing each stage keeps every plan shallow.
    (In a production pipeline this is a parquet write per stage — same
    effect, plus restartability.)"""
    df = df.localCheckpoint(eager=True)
    if prev is not None:
        prev.unpersist()
    return df


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="curation_")
    try:
        # 0a. ACQUISITION (r13/r14): the corpus arrives as a CRAWL
        #     ARCHIVE — WARC files (the CommonCrawl container), each
        #     record an HTTP response holding a page. Read the archive
        #     (byte-range indexed scan), extract training text
        #     (boilerplate and script suppression) and gate URLs
        #     (canonicalize, URL dedup, per-domain cap) BEFORE
        #     anything touches text.
        from pyspark.sql import functions as F  # noqa: F811

        from muopdb_spark.operators.html import extract_text
        from muopdb_spark.operators.urls import domain_cap, url_dedup
        from muopdb_spark.sources.warc import read_warc, write_warc_sharded

        fixture = spark.read.parquet(f"{sf_dir}/documents.parquet")
        d = F.col("doc_id")
        pages = fixture.select(
            "doc_id", "lang", "source", "n_chars",
            F.concat(
                F.lit("HTTPS://WWW.Site"), (d % 97).cast("string"),
                F.lit(".COM/p/"), d.cast("string"),
                F.lit("?utm_source=crawl"),
            ).alias("url"),
            F.concat(
                F.lit("<html><head><title>doc</title><script>x()"
                      "</script></head><body><nav>menu</nav><p>"),
                F.col("text"),
                F.lit("</p><a href='https://www.Site"),
                ((d * 3) % 97).cast("string"),
                F.lit(".COM/ref'>see</a>"
                      "<footer>f</footer></body></html>"),
            ).alias("html"),
        )
        # the "crawler output": a sharded member-per-record WARC
        # archive; everything downstream reads ONLY the archive
        warc_dir = os.path.join(tmp, "crawl")
        write_warc_sharded(
            pages, warc_dir, payload_col="html", n_shards=4
        )
        crawled = read_warc(spark, warc_dir, types=("response",)) \
            .select(
                F.col("target_uri").alias("url"),
                F.decode("payload", "UTF-8").alias("html"),
            ).join(
                pages.select("doc_id", "url", "lang", "source",
                             "n_chars"),
                "url",
            )
        # politeness gate (RFC 9309): every 10th host disallows /p/ —
        # parsed once on the hosts-sized side, corpus gated via
        # broadcast join + JVM rule fold
        from muopdb_spark.operators.robots import parse_robots, robots_gate

        h = F.col("id")
        robots = spark.range(97).select(
            F.concat(
                F.lit("www.site"), h.cast("string"), F.lit(".com")
            ).alias("host"),
            F.when(
                h % 10 == 0, F.lit("User-agent: *\nDisallow: /p/\n")
            ).otherwise(F.lit("")).alias("robots_txt"),
        )
        polite = robots_gate(crawled, parse_robots(robots)).filter(
            "robots_allowed"
        ).drop("robots_allowed")
        gated = domain_cap(url_dedup(polite), cap=10 ** 6)
        extracted = extract_text(gated, html_col="html").select(
            "doc_id", "text"
        )
        raw = gated.select(
            "doc_id", "lang", "source", "n_chars"
        ).join(extracted, "doc_id")
        print(f"acquisition: {pages.count()} archived pages -> "
              f"{polite.count()} after robots gate -> "
              f"{raw.count()} after WARC read + URL gate (HTML "
              f"stripped, boilerplate dropped)")

        # 0a'. link-graph quality prior (r14): domain-level PageRank
        #      over the pages' anchor links — the RefinedWeb/Gopher
        #      URL-scoring signal, joinable to docs by registered
        #      domain as a mixture-weight prior downstream
        from muopdb_spark.operators.html import extract_links
        from muopdb_spark.operators.urls import domain_quality_prior

        prior = domain_quality_prior(
            crawled, extract_links(crawled), n_iter=3
        )
        top = prior.orderBy(F.desc("rank")).limit(3).collect()
        print("link-graph prior (top-3 domains): "
              + ", ".join(f"{r['domain']} rank={r['rank']:.5f} "
                          f"in={r['in_domains']}" for r in top))

        # 0. land the corpus as JSONL (the interchange format), read it
        #    back schema-enforced — storage from here on is parquet
        write_jsonl(raw, os.path.join(tmp, "landing"), compression="gzip")
        docs = read_jsonl(
            spark, os.path.join(tmp, "landing"),
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        n0 = docs.count()

        # 0b. unicode/whitespace canonicalization (t17) BEFORE any
        #     hashing: NFC-variant or invisibly-padded duplicates must
        #     hash identically for every dedup stage below (the
        #     fixture is clean ASCII, so n_cleaned is 0 here — the
        #     stage earns its keep on real corpora, where the
        #     real-corpus smoke test exercises it)
        from muopdb_spark.operators.normalize import clean_text

        cl = clean_text(docs)
        n_cleaned = cl.filter("changed").count()
        prev = docs
        docs = _pin(docs.drop("text").join(
            cl.filter("text_clean IS NOT NULL")
              .select("doc_id", F.col("text_clean").alias("text")),
            "doc_id",
        ), prev)

        # 1. exact dedup: keep the canonical copy of byte-identical docs
        canon = exact_dedup(docs).filter("is_canonical").select("doc_id")
        docs = _pin(docs.join(canon, "doc_id", "left_semi"))
        n1 = docs.count()

        # 1b. line-level keep-first dedup (C4 §2.2 at line granularity,
        #     as FineWeb/RefinedWeb apply it): a line survives only at
        #     its globally first occurrence; docs reassemble from their
        #     surviving lines, and a doc that was ALL boilerplate is
        #     dropped. Runs before near-dup clustering so shared
        #     boilerplate can't glue unrelated docs into one cluster.
        from muopdb_spark.operators.dedup import line_dedup

        ld = line_dedup(docs)
        prev = docs
        docs = _pin(docs.drop("text").join(
            ld.filter(F.col("kept_lines") > 0)
              .select("doc_id", F.col("text_clean").alias("text")),
            "doc_id",
        ), prev)
        n1b = docs.count()

        # 2. near-dup clustering: transitive clusters over 3-gram
        #    Jaccard pairs; KEEP-BEST resolution (FineWeb refinement,
        #    d10) — the surviving copy of duplicated content is the
        #    cluster's highest-quality member, not whichever has the
        #    smallest id
        from muopdb_spark.operators.graph import cluster_representatives
        from muopdb_spark.operators.textstats import quality_features

        pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.8)
        clusters = dup_clusters(docs.select("doc_id"), pairs)
        scores = quality_features(docs).select("doc_id", "quality")
        keepers = cluster_representatives(clusters, scores).filter("keep")
        n_keeper_not_min = keepers.filter(
            F.col("doc_id") != F.col("cluster_id")
        ).count()
        prev = docs
        docs = _pin(docs.join(
            keepers.select("doc_id"), "doc_id", "left_semi"
        ), prev)
        n2 = docs.count()

        # 2b. passage-level dup filter: drop docs whose k-token windows
        #     are mostly copies of other docs' windows (document-level
        #     dedup misses these — Lee et al. 2021)
        prof = passage_dedup_stats(docs, k=10)
        prev = docs
        docs = _pin(docs.join(
            prof.filter(F.col("dup_frac") <= 0.6).select("doc_id"),
            "doc_id", "left_semi",
        ), prev)
        n2b = docs.count()

        # 2c. exact-substring span REMOVAL (Lee et al. 2107.06499):
        #     surviving docs can still carry long verbatim spans
        #     duplicated elsewhere (boilerplate, licenses); cut the
        #     >= 15-token duplicated spans (keeping each span's first
        #     occurrence) instead of dropping whole docs. Runs AFTER
        #     doc-level dedup on purpose — that shrinks the corpus
        #     before this stage's token-explode, the production
        #     ordering. Only docs that actually lost a span are
        #     rewritten (cleaned text is the NORMALIZED token stream;
        #     untouched docs keep their original bytes). On this
        #     fixture the count is 0: its only span-sharers are
        #     whole-doc near-dups already removed at stage 2.
        spans = remove_duplicate_spans(docs, k=15)
        rewritten = spans.filter(F.col("kept_tokens") < F.col("n_tokens"))
        n_span_cut = rewritten.count()
        prev = docs
        docs = _pin(docs.join(
            rewritten.select("doc_id", "text_clean"), "doc_id", "left",
        ).withColumn(
            "text", F.coalesce(F.col("text_clean"), F.col("text"))
        ).drop("text_clean"), prev)

        # 3. decontamination: drop docs overlapping the "benchmark"
        #    slice (stand-in for a held-out eval set)
        report = contamination_report_split(docs, F.col("id") % 20 == 0)
        clean_ids = report.filter(~F.col("is_contaminated")).select("doc_id")
        bench_slice = docs.filter(F.col("doc_id") % 20 == 0) \
            .select("doc_id", "text").localCheckpoint(eager=True)
        prev = docs
        docs = _pin(docs.filter(F.col("doc_id") % 20 != 0)
                    .join(clean_ids, "doc_id", "left_semi"), prev)
        n3 = docs.count()

        # 3b. SURGICAL decontamination (GPT-3 appendix-C treatment):
        #     docs under the doc-drop threshold can still leak short
        #     benchmark n-gram runs — cut just those >= 4-token windows
        #     and keep the rest of each document
        from muopdb_spark.operators.substring import (
            remove_contaminated_spans,
        )

        dec = remove_contaminated_spans(docs, bench_slice, k=4)
        n_cut_tokens = dec.agg(
            F.sum(F.col("n_tokens") - F.col("kept_tokens"))
        ).first()[0] or 0
        prev = docs
        docs = _pin(docs.drop("text").join(
            dec.filter(F.col("kept_tokens") > 0)
               .select("doc_id", F.col("text_clean").alias("text")),
            "doc_id",
        ), prev)
        n3b = docs.count()

        # 3c. FUZZY decontamination (the Llama-3/DCLM "fuzzy dedup vs
        #     benchmarks" pass): paraphrase-adjacent near-dups of a
        #     benchmark doc clear 3a's gram-fraction threshold only
        #     partially and 3b cuts only literal windows — drop whole
        #     docs whose shingle-set Jaccard vs any benchmark doc is
        #     >= 0.8 (MinHash-LSH candidates, exact-Jaccard verified)
        from muopdb_spark.operators.contamination import (
            fuzzy_contamination_verdicts,
        )

        fuzzy = fuzzy_contamination_verdicts(
            docs.select("doc_id", "text"), bench_slice, threshold=0.8,
        )
        prev = docs
        docs = _pin(
            docs.join(fuzzy.select("doc_id"), "doc_id", "left_anti"), prev
        )
        n3c = docs.count()

        # 4. PII scrub: redact, keep the redacted text
        docs = scrub_pii(docs).withColumn("text", F.col("redacted")).drop("redacted")

        # 4b. C4 line cleaning: strip boilerplate lines, drop docs with
        #     nothing left (single-line fixture docs mostly pass whole)
        cleaned = c4_line_filter(docs, min_line_words=2, min_kept_lines=0)
        docs = docs.join(
            cleaned.select("doc_id", "clean_text"), "doc_id"
        ).withColumn(
            "text",
            F.when(F.length("clean_text") > 0, F.col("clean_text"))
            .otherwise(F.col("text")),
        ).drop("clean_text")

        # 5. repetition-quality filter (Gopher-style): drop degenerate
        #    docs; gopher_quality_flags reports the table-A1 signals
        #    (thresholds tuned for the short fixture docs)
        rep = repetition_stats(docs)
        flags = gopher_quality_flags(docs)
        keep = (
            rep.join(flags.select("doc_id", "alpha_frac"), "doc_id")
            .filter(
                (F.col("distinct_ratio") >= 0.2)
                & (F.col("dup_gram_frac") <= 0.5)
                & (F.col("alpha_frac") >= 0.8)
            ).select("doc_id")
        )
        quality_input = docs  # stage-5c trains on the pre-gate corpus
        prev = docs
        docs = _pin(docs.join(keep, "doc_id", "left_semi"), prev)
        n5 = docs.count()

        # 5b. LM perplexity selection (CCNet, Wenzek et al. LREC 2020
        #     §4.3): train an add-k bigram LM on the surviving docs,
        #     rank bits/token WITHIN EACH LANGUAGE, and keep the
        #     head+middle thirds (tail dropped) — the per-language cut
        #     is what keeps one easy language from monopolizing the
        #     budget. approx=True is the no-window scale path
        #     (per-language percentile sketch + broadcast CASE).
        scored = lm_bits_per_token(docs).join(
            docs.select("doc_id", "lang"), "doc_id"
        ).select(
            "doc_id", "lang",
            F.round("bits_per_token", 6).alias("bits_per_token"),
        )
        buckets = perplexity_buckets(scored, approx=True)
        bucket_counts = {
            r["ppl_bucket"]: r["n"]
            for r in buckets.groupBy("ppl_bucket")
            .agg(F.count("*").alias("n")).collect()
        }
        prev = docs
        docs = _pin(docs.join(
            buckets.filter(F.col("ppl_bucket") != "tail").select("doc_id"),
            "doc_id", "left_semi",
        ), prev)
        n5b = docs.count()

        # 5b2. per-source quality calibration: keep the top 90% of
        #      each SOURCE by composite quality — a global threshold
        #      would over-prune whole domains whose score distribution
        #      sits lower (the FineWeb/DCLM-style domain-fair cut)
        cal = quality_percentile_by_source(docs, keep_frac=0.9)
        prev = docs
        docs = _pin(docs.join(
            cal.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi",
        ), prev)
        n5c = docs.count()

        # 5c. distill the RULE-quality verdicts into a trained
        #     classifier (GPT-3-style model-based filter): positive =
        #     passed the stage-5 rule gates. The coefficient dict is
        #     the portable artifact a production run applies to NEW
        #     batches as a pure map-side expression (no rules, no ML
        #     runtime at inference). Only the rule verdicts are
        #     learnable from quality features — dedup/decontamination
        #     removals are content-identity decisions and stay
        #     rule-based.
        rule_pos = keep.withColumn("pos", F.lit(1))
        coef = train_quality_classifier(
            quality_input.join(rule_pos, "doc_id", "left"),
            F.col("pos").isNotNull(),
        )
        agree = (
            score_quality(quality_input, coef)
            .join(rule_pos, "doc_id", "left")
            .select(
                ((F.col("p_reference") >= 0.5) == F.col("pos").isNotNull())
                .cast("int").alias("ok")
            )
            .agg(F.avg("ok")).collect()[0][0]
        )

        # 6. language rebalancing: deterministic stratified sample
        prev = docs
        docs = _pin(stratified_hash_sample(
            docs, strata_col="lang", key_col="doc_id",
            fractions={"en": 1.0, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 0.5},
        ), prev)
        n6 = docs.count()

        # 6b. soft-dedup reweighting + weighted token-budget selection
        #     (SoftDedup/DCLM, smp7 -> smp8): duplicated content that
        #     SURVIVED the hard gates is downweighted (inverse geometric
        #     mean of gram document-frequency), then the corpus is
        #     sampled with keep probability proportional to the weight,
        #     scaled so EXPECTED kept tokens hit the budget — duplicated
        #     mass is attenuated, unique information preserved
        from muopdb_spark.operators.dedup import soft_dedup_weights
        from muopdb_spark.operators.sampling import (
            weighted_token_budget_sample,
        )

        weights = soft_dedup_weights(docs)
        sel_base = docs.select(
            "doc_id", ws_token_count("text").cast("long").alias("n_tokens")
        ).join(weights.select("doc_id", "soft_weight"), "doc_id")
        budget = 12_000
        selected = weighted_token_budget_sample(
            sel_base, key_col="doc_id", token_col="n_tokens",
            weight_col="soft_weight", budget_tokens=budget,
        )
        sel_manifest = selected.agg(
            F.count("*").alias("kept"),
            F.sum("n_tokens").alias("kept_tokens"),
            F.round(F.avg("soft_weight"), 4).alias("mean_weight"),
        ).first()
        prev = docs
        docs = _pin(docs.join(
            selected.select("doc_id"), "doc_id", "left_semi"
        ), prev)
        n6b = docs.count()

        # 7. sequence packing: 512-token training sequences per
        #    language, counted in BPE SUBWORD units — the budget a
        #    training run actually pays (context-window slots) — under
        #    a merge list learned on the curated corpus itself.
        #    Whitespace counts undercount the rare/agglutinated words
        #    BPE splits; the printed ws-vs-bpe token sums show the gap.
        from muopdb_spark.operators.vocab import bpe_token_count, bpe_train

        # 50 merges: the fixture vocabulary is tiny, so a production-
        # sized merge list fuses every word back to one subword and the
        # bpe-vs-ws gap degenerates to zero; a small list keeps rare
        # words split, which is the realistic regime
        merges = bpe_train(docs, num_merges=50)
        sized = bpe_token_count(docs, merges, out_col="n_tokens").select(
            "doc_id", "lang", "text", "n_tokens",
        )
        tok_units = sized.agg(
            F.sum("n_tokens").alias("bpe"),
            F.sum(ws_token_count("text").cast("long")).alias("ws"),
        ).first()
        packed = pack_sequences(sized, group_col="lang", budget=512)
        fill = sequence_stats(packed, group_col="lang")

        # 8. model-ready parquet, partitioned by language
        out = os.path.join(tmp, "curated")
        sized.join(packed.select("doc_id", "seq_id", "seq_offset"), "doc_id") \
             .write.mode("overwrite").partitionBy("lang").parquet(out)

        n_seqs = fill.count()

        # 8b. training-shard export: deterministic global shuffle into
        #     fixed shards, reproducible order inside each shard
        shards_out = os.path.join(tmp, "shards")
        write_shards(docs.select("doc_id", "lang", "text"), shards_out,
                     n_shards=4)
        n_shards_written = (
            spark.read.parquet(shards_out).select("shard_id").distinct().count()
        )

        # 8c. RAG chunk export: the same curated corpus as overlapping
        #     retrieval passages (32-token windows, stride 24)
        n_chunks = chunk_documents(docs, size=32, overlap=8).count()

        # 8d. trainer handoff: the curated corpus as flat int32
        #     token-id shards + (doc_id, n_tokens) indexes under the
        #     stage-7 merge list — what a data loader actually mmaps
        from muopdb_spark.operators.export import write_token_shards

        tok_out = os.path.join(tmp, "token_shards")
        tok_man = write_token_shards(
            docs.select("doc_id", "text"), tok_out, merges, n_shards=4
        ).agg(F.sum("n_tokens"), F.sum("bin_bytes")).first()
        n_tok_exported, n_tok_bytes = tok_man[0], tok_man[1]

        # 9. DAY 2: a new ingest batch arrives. Run the full
        #    QUALITY-GATED admission round (w6 = w5 + the t2 composite
        #    quality pre-gate, cheapest filter first): bootstrap the
        #    corpus + signature artifact ONCE, then admit_batch gates on
        #    quality, dedups intra-batch and against the artifact, and
        #    records EVERY rejection (reason-tagged) in the audit
        #    parquet. Same operator the stream serves via foreachBatch.
        from muopdb_spark.streaming.admission import (
            admit_batch,
            bootstrap_corpus,
        )

        day2_corpus = os.path.join(tmp, "corpus_admitted")
        sig_path = os.path.join(tmp, "corpus_sigs")
        rejected_path = os.path.join(tmp, "rejected")
        bootstrap_corpus(docs.select("doc_id", "text"), day2_corpus, sig_path)
        new_batch = raw.join(docs.select("doc_id"), "doc_id", "left_anti") \
                       .orderBy("doc_id").limit(200) \
                       .select("doc_id", "text")
        n_new = new_batch.count()
        # the full three-gate round (w7): quality -> DSIR importance
        # ("does this doc look like the curated corpus" — ratio table
        # trained raw-vs-curated, a durable broadcast artifact in
        # production) -> near-dup vs the signature artifact
        from muopdb_spark.operators.dsir import dsir_log_ratios

        ratios = dsir_log_ratios(
            raw.select("doc_id", "text"), docs.select("doc_id", "text")
        ).localCheckpoint(eager=True)
        admit_batch(new_batch, 1, day2_corpus, sig_path, rejected_path,
                    threshold=0.8, quality_min=0.2,
                    dsir_ratios=ratios, dsir_min=-0.05)
        audit = spark.read.parquet(rejected_path) \
            .groupBy("reason").count().collect() \
            if os.path.exists(rejected_path) else []
        reject_by_reason = {r["reason"]: r["count"] for r in audit}
        n_rejected = sum(reject_by_reason.values())

        print(f"ingested={n0} (cleaned_changed={n_cleaned}) "
              f"exact_dedup={n1} line_dedup={n1b} "
              f"keep_best={n2} (keeper_not_min_id={n_keeper_not_min}) "
              f"passage_dup={n2b} span_rewritten={n_span_cut} "
              f"decontaminated={n3} "
              f"(surgical: cut {n_cut_tokens} leaked tokens, "
              f"{n3b} docs survive; fuzzy: {n3b - n3c} near-dup "
              f"docs dropped, {n3c} survive) quality={n5} "
              f"perplexity={n5b} (buckets: {bucket_counts}) "
              f"calibrated={n5c} sampled={n6} "
              f"budget_selected={n6b} "
              f"(budget={budget} kept_tokens={sel_manifest['kept_tokens']} "
              f"mean_weight={sel_manifest['mean_weight']}) "
              f"sequences={n_seqs} "
              f"(packed in BPE units: {tok_units['bpe']} subwords vs "
              f"{tok_units['ws']} ws tokens) "
              f"shards={n_shards_written} rag_chunks={n_chunks} "
              f"token_shards=4 ({n_tok_exported} ids, {n_tok_bytes} bytes)")
        print(f"distilled classifier reproduces the rule-quality "
              f"verdicts on {agree:.0%} of docs")
        print(f"day2: batch={n_new} rejected={n_rejected} "
              f"by_reason={reject_by_reason} "
              f"admitted={n_new - n_rejected}")
        print("sample sequence fill:",
              [(r.lang, r.seq_id, r.n_docs, r.sum_tokens)
               for r in fill.orderBy("lang", "seq_id").limit(5).collect()])

        # epilogue: the per-source dataset card (rep1) over the RAW
        # ingest — the hygiene summary a pipeline publishes alongside
        # its output (dup/contamination rates explain the stage counts
        # above)
        from muopdb_spark.operators.contamination import benchmark_grams
        from muopdb_spark.operators.report import source_report

        card = source_report(
            raw, lang_col="lang",
            bench_grams=benchmark_grams(bench_slice),
        ).orderBy(F.desc("n_docs"), "source").limit(5).collect()
        print("dataset card (top-5 sources):")
        for r in card:
            print(f"  {r.source}: docs={r.n_docs} tokens={r.total_tokens} "
                  f"quality={r.mean_quality} dup={r.exact_dup_rate} "
                  f"contaminated={r.contaminated_rate} "
                  f"lang={r.top_lang}/{r.n_langs}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
