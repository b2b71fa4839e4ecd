"""Continuous corpus admission: stream documents in, admit only those
that are not near-duplicates of the corpus admitted so far.

This is the streaming face of incremental dedup
(operators/dedup.incremental_minhash_pairs): the corpus state that
matters is the FIXED-WIDTH MinHash signature artifact, which grows
monotonically as batches are admitted — exactly the LSM/WAL admission
shape of the reference's ingest path (wal append -> flush), applied to
corpus curation:

  - per micro-batch: dedup within the batch, then against the
    signature artifact; admitted text appends to the corpus, admitted
    SIGNATURES append to the artifact, so the next batch dedups
    against old ∪ previously-admitted with no corpus re-shingling
  - rejected docs land in a side parquet with the corpus doc they
    matched and the batch id — at-least-once foreachBatch replays are
    deduplicable downstream by (batch_id, new_id), the same idempotency
    contract as streaming/serving.py
  - at 100 TB the per-batch cost is one scan of the signature parquet
    (columnar, ~400 bytes/doc) + point reads of candidate corpus text;
    the batch side is broadcast throughout (see docs/SCALE.md, d7)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from muopdb_spark.operators.dedup import (
    incremental_minhash_pairs,
    minhash_lsh_pairs,
    minhash_signature_df,
)


def bootstrap_corpus(
    docs: DataFrame,
    corpus_path: str,
    sig_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> None:
    """Seed the admission state: write the initial corpus and its
    signature artifact (the one-time cost; every later batch appends)."""
    docs.write.mode("overwrite").parquet(corpus_path)
    minhash_signature_df(
        docs, text_col=text_col, id_col=id_col, n=n,
        num_hashes=num_hashes, bands=bands,
    ).drop("sh").write.mode("overwrite").parquet(sig_path)


def admit_batch(
    batch_df: DataFrame,
    batch_id: int,
    corpus_path: str,
    sig_path: str,
    rejected_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.8,
    quality_min: float | None = None,
    benchmark_grams: DataFrame | None = None,
    contamination_k: int = 8,
    dsir_ratios: DataFrame | None = None,
    dsir_min: float | None = None,
    dsir_buckets: int = 4096,
    benchmark_sig: DataFrame | None = None,
    benchmark_jaccard: float = 0.8,
    blocklist: list[str] | None = None,
    blocklist_max_frac: float = 0.0,
    url_state_path: str | None = None,
    url_col: str = "url",
    benchmark_bloom: DataFrame | None = None,
    bloom_k: int = 8,
    bloom_m_bits: int = 1 << 20,
    bloom_n_hashes: int = 4,
) -> None:
    """One admission round (callable directly for batch pipelines, or
    from the stream's foreachBatch): OPTIONAL blocklist gate
    (``blocklist`` — t19's wordlist_gate, the cheapest rung, runs
    first; rejections audit as reason='blocked'), OPTIONAL quality gate (composite
    quality score >= quality_min, the t2 formula — a pure map-side
    expression, so the gate adds zero shuffles to the round), OPTIONAL
    decontamination gate (reject any doc sharing a >= contamination_k
    token window with the eval benchmark — "never train on eval";
    ``benchmark_grams`` is the durable broadcast-sized distinct-hash
    artifact from substring.contamination_gram_table built with the
    SAME k), OPTIONAL importance gate (DSIR mean per-gram log-ratio >=
    dsir_min against a caller-provided durable ratio table — "does
    this doc look like the quality target"; the 4096-row table
    broadcasts, the only shuffle is the batch-sized per-doc rollup),
    then intra-batch dedup (keep the lowest id of any near-dup pair),
    then cross dedup vs the artifact; append admitted text +
    signatures, record EVERY rejection to rejected_path —
    quality-gated docs with reason='quality', benchmark overlaps with
    reason='contaminated', importance-gated with reason='importance'
    (corpus_id/jaccard null), dedup-rejected docs with
    reason='duplicate' and the corpus doc they matched — so the audit
    trail accounts for the whole batch. Cheap gates run BEFORE
    signing, so rejected docs never pay minhash cost — cheapest filter
    first, the standard curation ordering.

    ``dsir_ratios`` must come from dsir_log_ratios with the SAME
    ``dsir_buckets`` — at 100 TB it is a build-once corpus artifact
    (see __spark_entry__._dsir_weights_table), not per-batch work.

    ``benchmark_sig`` (OPTIONAL fuzzy-decontamination gate, the
    streaming face of c3 as ``benchmark_grams`` is of c2): a durable
    minhash_signature_df of the eval benchmark WITH its `sh` column
    (build once — benchmarks are static). Docs whose exact shingle
    Jaccard vs any benchmark doc reaches ``benchmark_jaccard`` are
    rejected reason='contaminated_fuzzy' with the matched bench id and
    jaccard recorded. This gate runs right AFTER the batch is signed
    and REUSES that one signing pass (contamination.
    fuzzy_contamination_pairs with corpus_sig=batch signature), so it
    adds no corpus-sized work — only the broadcast band probe and the
    candidate-bounded verify.

    ``url_state_path`` (OPTIONAL URL-frontier gate, r14 — the
    streaming face of urls.url_dedup and the CCNet/incremental-crawl
    "have we processed this URL" check): batch URLs are canonicalized
    (urls.url_normalize), intra-batch keep-first deduped, then probed
    against the durable canonical-URL state parquet — a re-crawl of a
    known URL is rejected reason='url_duplicate' BEFORE any content
    gate runs (the cheapest possible rung: no text is touched). URLs
    that pass record into the state AFTER the round's corpus/signature
    appends land — frontier semantics: "processed", not "admitted", so
    a page later rejected on quality is not re-processed every crawl.
    The append order is the crash-consistency contract (r15): state
    LAST, like WAL-before-flush. A crash mid-batch before the state
    append means the foreachBatch replay re-runs the whole round —
    safe, because url_dedup, every dedup gate, and the (batch_id,
    new_id) audit key are idempotent. Appending state FIRST would make
    the replay reject the entire batch as reason='url_duplicate'
    (at-most-once delivery — the r14 bug this ordering fixes). Probe
    shape is the d7 artifact pattern: state scan x broadcast batch
    keys (left_semi), seen set is batch-bounded; the state is never
    shuffled. At-least-once replays of a COMPLETED round append
    duplicate state rows — harmless for the semi-join probe, same
    idempotency posture as the rejection audit."""
    spark = batch_df.sparkSession
    batch_df = batch_df.localCheckpoint(eager=True)
    if url_state_path is not None:
        import os as _os

        from muopdb_spark.operators.urls import url_dedup

        if url_col not in batch_df.columns:
            raise ValueError(
                f"admit_batch: url_col {url_col!r} not in batch"
            )
        kept = url_dedup(
            batch_df, url_col=url_col, id_col=id_col
        ).localCheckpoint(eager=True)
        if _os.path.isdir(url_state_path):
            state = spark.read.parquet(url_state_path)
            seen = (
                state.join(
                    F.broadcast(kept.select("url_canon").distinct()),
                    "url_canon",
                    "left_semi",
                )
                .select("url_canon")
                .distinct()
                .localCheckpoint(eager=True)
            )
            fresh = kept.join(
                F.broadcast(seen), "url_canon", "left_anti"
            ).localCheckpoint(eager=True)
        else:
            fresh = kept
        url_rejected = batch_df.join(
            fresh.select(id_col), id_col, "left_anti"
        ).select(
            F.col(id_col).cast("long").alias("new_id"),
            F.lit(None).cast("long").alias("corpus_id"),
            F.lit(None).cast("double").alias("est_jaccard"),
            F.lit(None).cast("double").alias("jaccard"),
            F.lit("url_duplicate").alias("reason"),
            F.lit(batch_id).cast("long").alias("batch_id"),
        )
        if not url_rejected.isEmpty():
            url_rejected.write.mode("append").parquet(rejected_path)
        gated = fresh.drop("url_canon").localCheckpoint(eager=True)
        if not gated.isEmpty():
            _admit_content(
                gated, batch_id, corpus_path, sig_path, rejected_path,
                text_col=text_col, id_col=id_col, n=n,
                num_hashes=num_hashes, bands=bands, threshold=threshold,
                quality_min=quality_min,
                benchmark_grams=benchmark_grams,
                contamination_k=contamination_k,
                dsir_ratios=dsir_ratios, dsir_min=dsir_min,
                dsir_buckets=dsir_buckets, benchmark_sig=benchmark_sig,
                benchmark_jaccard=benchmark_jaccard,
                blocklist=blocklist,
                blocklist_max_frac=blocklist_max_frac,
                benchmark_bloom=benchmark_bloom, bloom_k=bloom_k,
                bloom_m_bits=bloom_m_bits, bloom_n_hashes=bloom_n_hashes,
            )
        # frontier record LAST: only after the corpus/signature appends
        # have landed is a URL durably 'processed' — see the docstring's
        # crash-consistency contract
        fresh.select("url_canon").write.mode("append").parquet(
            url_state_path
        )
        return

    _admit_content(
        batch_df, batch_id, corpus_path, sig_path, rejected_path,
        text_col=text_col, id_col=id_col, n=n, num_hashes=num_hashes,
        bands=bands, threshold=threshold, quality_min=quality_min,
        benchmark_grams=benchmark_grams,
        contamination_k=contamination_k, dsir_ratios=dsir_ratios,
        dsir_min=dsir_min, dsir_buckets=dsir_buckets,
        benchmark_sig=benchmark_sig,
        benchmark_jaccard=benchmark_jaccard, blocklist=blocklist,
        blocklist_max_frac=blocklist_max_frac,
        benchmark_bloom=benchmark_bloom, bloom_k=bloom_k,
        bloom_m_bits=bloom_m_bits, bloom_n_hashes=bloom_n_hashes,
    )


def _admit_content(
    batch_df: DataFrame,
    batch_id: int,
    corpus_path: str,
    sig_path: str,
    rejected_path: str,
    *,
    text_col: str,
    id_col: str,
    n: int,
    num_hashes: int,
    bands: int,
    threshold: float,
    quality_min: float | None,
    benchmark_grams: DataFrame | None,
    contamination_k: int,
    dsir_ratios: DataFrame | None,
    dsir_min: float | None,
    dsir_buckets: int,
    benchmark_sig: DataFrame | None,
    benchmark_jaccard: float,
    blocklist: list[str] | None,
    blocklist_max_frac: float,
    benchmark_bloom: DataFrame | None,
    bloom_k: int,
    bloom_m_bits: int,
    bloom_n_hashes: int,
) -> None:
    """The content gates + dedup + appends of one admission round
    (everything downstream of the URL-frontier gate). Split out so
    admit_batch can append the URL state AFTER these writes land."""
    spark = batch_df.sparkSession
    if blocklist:
        # cheapest gate of all (array-literal HOF expression, no
        # stoplist broadcast, no regex corpus scan) — run it first;
        # reason='blocked' in the audit trail
        from muopdb_spark.operators.quality import wordlist_gate

        ok = (
            wordlist_gate(
                batch_df, blocklist, text_col=text_col, id_col=id_col,
                max_frac=blocklist_max_frac,
            )
            .filter("keep")
            .select(id_col)
        )
        blk_rejected = batch_df.join(ok, id_col, "left_anti").select(
            F.col(id_col).cast("long").alias("new_id"),
            F.lit(None).cast("long").alias("corpus_id"),
            F.lit(None).cast("double").alias("est_jaccard"),
            F.lit(None).cast("double").alias("jaccard"),
            F.lit("blocked").alias("reason"),
            F.lit(batch_id).cast("long").alias("batch_id"),
        )
        if not blk_rejected.isEmpty():
            blk_rejected.write.mode("append").parquet(rejected_path)
        batch_df = batch_df.join(ok, id_col, "left_semi").localCheckpoint(
            eager=True
        )
        if batch_df.isEmpty():
            return

    if quality_min is not None:
        from muopdb_spark.operators.textstats import quality_features

        ok = (
            quality_features(batch_df, text_col=text_col, id_col=id_col)
            .filter(F.col("quality") >= F.lit(float(quality_min)))
            .select(id_col)
        )
        quality_rejected = batch_df.join(ok, id_col, "left_anti").select(
            F.col(id_col).cast("long").alias("new_id"),
            F.lit(None).cast("long").alias("corpus_id"),
            F.lit(None).cast("double").alias("est_jaccard"),
            F.lit(None).cast("double").alias("jaccard"),
            F.lit("quality").alias("reason"),
            F.lit(batch_id).cast("long").alias("batch_id"),
        )
        if not quality_rejected.isEmpty():
            quality_rejected.write.mode("append").parquet(rejected_path)
        batch_df = batch_df.join(ok, id_col, "left_semi").localCheckpoint(
            eager=True
        )
        if batch_df.isEmpty():
            return

    if benchmark_grams is not None:
        from muopdb_spark.operators.substring import gram_positions

        # OPTIONAL bloom pre-filter (r14, operators/bloom.py): when
        # the caller also maintains the distributed Bloom artifact of
        # the SAME benchmark grams (bloom_build with bloom_k ==
        # contamination_k), provably-clean docs skip the exact gram
        # probe entirely — OUTCOME-INVARIANT (no false negatives), the
        # exact gate just runs over the maybe-suspects only. At
        # corpus-scale protected sets this is the path that keeps the
        # gate alive after benchmark_grams stops being broadcastable.
        suspects = batch_df
        if benchmark_bloom is not None:
            from muopdb_spark.operators.bloom import bloom_gate

            if bloom_k != contamination_k:
                # a different window size breaks the no-false-negative
                # guarantee the skip relies on
                raise ValueError(
                    f"admit_batch: bloom_k ({bloom_k}) must equal "
                    f"contamination_k ({contamination_k})"
                )

            suspects = (
                bloom_gate(
                    batch_df, benchmark_bloom, text_col=text_col,
                    id_col=id_col, k=bloom_k, m_bits=bloom_m_bits,
                    n_hashes=bloom_n_hashes,
                )
                .filter(~F.col("provably_clean"))
                .drop("provably_clean")
            )
        hits = (
            gram_positions(
                suspects, text_col=text_col, id_col=id_col,
                k=contamination_k,
            )
            .join(F.broadcast(benchmark_grams.select("gh")), "gh")
            .select(F.col("id").alias(id_col))
            .distinct()
        )
        cont_rejected = batch_df.join(hits, id_col, "left_semi").select(
            F.col(id_col).cast("long").alias("new_id"),
            F.lit(None).cast("long").alias("corpus_id"),
            F.lit(None).cast("double").alias("est_jaccard"),
            F.lit(None).cast("double").alias("jaccard"),
            F.lit("contaminated").alias("reason"),
            F.lit(batch_id).cast("long").alias("batch_id"),
        )
        if not cont_rejected.isEmpty():
            cont_rejected.write.mode("append").parquet(rejected_path)
        batch_df = batch_df.join(hits, id_col, "left_anti").localCheckpoint(
            eager=True
        )
        if batch_df.isEmpty():
            return

    if dsir_ratios is not None and dsir_min is not None:
        from muopdb_spark.operators.dsir import dsir_weights

        w = dsir_weights(
            batch_df, dsir_ratios, text_col=text_col, id_col=id_col,
            n_buckets=dsir_buckets,
        )
        # round like the smp6 oracle so the boundary compare is
        # engine-stable
        ok = w.filter(
            F.round(F.col("log_weight"), 6) >= F.lit(float(dsir_min))
        ).select(id_col)
        imp_rejected = batch_df.join(ok, id_col, "left_anti").select(
            F.col(id_col).cast("long").alias("new_id"),
            F.lit(None).cast("long").alias("corpus_id"),
            F.lit(None).cast("double").alias("est_jaccard"),
            F.lit(None).cast("double").alias("jaccard"),
            F.lit("importance").alias("reason"),
            F.lit(batch_id).cast("long").alias("batch_id"),
        )
        if not imp_rejected.isEmpty():
            imp_rejected.write.mode("append").parquet(rejected_path)
        batch_df = batch_df.join(ok, id_col, "left_semi").localCheckpoint(
            eager=True
        )
        if batch_df.isEmpty():
            return

    # sign the batch ONCE — the intra pass, the cross pass, and the
    # artifact append all derive from this one shingle+minhash pass
    # (it used to run three times; measured 13.7 s -> ~8 s per sf0.1
    # admission round)
    bsig = minhash_signature_df(
        batch_df, text_col=text_col, id_col=id_col, n=n,
        num_hashes=num_hashes, bands=bands,
    ).localCheckpoint(eager=True)

    if benchmark_sig is not None:
        # fuzzy decontamination (c3's streaming face): reuses the
        # signing pass above — the only added work is benchmark-sized
        from muopdb_spark.operators.contamination import (
            fuzzy_contamination_pairs,
        )

        fz = fuzzy_contamination_pairs(
            batch_df, None, text_col=text_col, id_col=id_col, n=n,
            num_hashes=num_hashes, bands=bands,
            threshold=benchmark_jaccard,
            bench_sig=benchmark_sig, corpus_sig=bsig,
        ).localCheckpoint(eager=True)
        if not fz.isEmpty():
            fz.select(
                F.col(id_col).cast("long").alias("new_id"),
                F.col("bench_id").cast("long").alias("corpus_id"),
                "est_jaccard", "jaccard",
                F.lit("contaminated_fuzzy").alias("reason"),
                F.lit(batch_id).cast("long").alias("batch_id"),
            ).write.mode("append").parquet(rejected_path)
        fz_ids = fz.select(id_col).distinct()
        batch_df = batch_df.join(fz_ids, id_col, "left_anti")
        bsig = bsig.join(
            fz_ids.select(F.col(id_col).alias("id")), "id", "left_anti",
        )
        if batch_df.isEmpty():
            return

    # intra-batch: a batch can carry near-dups of itself that the
    # corpus artifact knows nothing about
    intra = minhash_lsh_pairs(
        batch_df, text_col=text_col, id_col=id_col, n=n,
        num_hashes=num_hashes, bands=bands, threshold=threshold,
        sig=bsig,
    )
    # materialize the (small) intra rejection pairs: the plan embeds the
    # full intra LSH band-join + exact-Jaccard verify subtree, and it
    # feeds the batch anti-join, the bsig anti-join, AND the audit
    # record — without the pin that subtree re-executes once per
    # downstream consumer (~3x inside incremental_minhash_pairs plus
    # the signature append)
    intra = intra.localCheckpoint(eager=True)
    intra_rejected = intra.select(F.col("doc_b").alias("id")).distinct()
    if not intra.isEmpty():
        intra.select(
            F.col("doc_b").cast("long").alias("new_id"),
            F.col("doc_a").cast("long").alias("corpus_id"),
            "est_jaccard", "jaccard",
            F.lit("intra_duplicate").alias("reason"),
            F.lit(batch_id).cast("long").alias("batch_id"),
        ).write.mode("append").parquet(rejected_path)
    batch_df = batch_df.join(
        intra_rejected.select(F.col("id").alias(id_col)),
        on=id_col, how="left_anti",
    )
    bsig = bsig.join(intra_rejected, on="id", how="left_anti")

    dups = incremental_minhash_pairs(
        batch_df,
        spark.read.parquet(sig_path),
        spark.read.parquet(corpus_path),
        text_col=text_col, id_col=id_col, n=n,
        num_hashes=num_hashes, bands=bands, threshold=threshold,
        sig=bsig,
    ).localCheckpoint(eager=True)

    cross_rejected = dups.select(F.col("new_id").alias(id_col)).distinct()
    admitted = batch_df.join(
        cross_rejected, on=id_col, how="left_anti"
    ).localCheckpoint(eager=True)
    # append in the DURABLE corpus schema: gate plumbing may have
    # added batch-only columns (e.g. the url column the frontier gate
    # reads) — appending them verbatim would leave mixed parquet
    # schemas behind; a batch MISSING corpus columns is a caller error
    corpus_cols = spark.read.parquet(corpus_path).columns
    missing = [c for c in corpus_cols if c not in admitted.columns]
    if missing:
        raise ValueError(
            f"admit_batch: batch lacks corpus columns {missing}"
        )
    admitted = admitted.select(*corpus_cols)
    # order matters for crash-consistency: signatures FIRST, corpus
    # text second (r16 — the reverse order could leave corpus text
    # with no signature, which a foreachBatch replay's dedup probe
    # cannot see, re-appending the same documents as duplicate corpus
    # rows). A crash between the writes instead leaves a DANGLING
    # signature: on replay the band probe matches it, but the exact-
    # Jaccard verify inner-joins corpus TEXT (incremental_minhash_pairs
    # csh join) and finds none, so the candidate drops and the doc is
    # re-admitted — the only residue is a duplicate signature row,
    # which every probe already tolerates (candidates are .distinct()).
    bsig.join(
        cross_rejected.select(F.col(id_col).alias("id")),
        on="id", how="left_anti",
    ).drop("sh").write.mode("append").parquet(sig_path)
    admitted.write.mode("append").parquet(corpus_path)
    dups.select(
        F.col("new_id").cast("long"),
        F.col("corpus_id").cast("long"),
        "est_jaccard", "jaccard",
        F.lit("duplicate").alias("reason"),
        F.lit(batch_id).cast("long").alias("batch_id"),
    ).write.mode("append").parquet(rejected_path)


def stream_admission(
    doc_stream: DataFrame,
    corpus_path: str,
    sig_path: str,
    rejected_path: str,
    checkpoint_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.8,
    quality_min: float | None = None,
    benchmark_grams: DataFrame | None = None,
    contamination_k: int = 8,
    dsir_ratios: DataFrame | None = None,
    dsir_min: float | None = None,
    dsir_buckets: int = 4096,
    benchmark_sig: DataFrame | None = None,
    benchmark_jaccard: float = 0.8,
    blocklist: list[str] | None = None,
    blocklist_max_frac: float = 0.0,
    url_state_path: str | None = None,
    url_col: str = "url",
    benchmark_bloom: DataFrame | None = None,
    bloom_k: int = 8,
    bloom_m_bits: int = 1 << 20,
    bloom_n_hashes: int = 4,
    trigger_available_now: bool = False,
    processing_time: str = "1 second",
):
    """Start the continuous admission query; returns the
    StreamingQuery. `doc_stream` is any streaming DataFrame with
    (id_col, text_col); state must be seeded with bootstrap_corpus."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        admit_batch(
            batch_df, batch_id, corpus_path, sig_path, rejected_path,
            text_col=text_col, id_col=id_col, n=n,
            num_hashes=num_hashes, bands=bands, threshold=threshold,
            quality_min=quality_min, benchmark_grams=benchmark_grams,
            contamination_k=contamination_k, dsir_ratios=dsir_ratios,
            dsir_min=dsir_min, dsir_buckets=dsir_buckets,
            benchmark_sig=benchmark_sig,
            benchmark_jaccard=benchmark_jaccard,
            blocklist=blocklist,
            blocklist_max_frac=blocklist_max_frac,
            url_state_path=url_state_path, url_col=url_col,
            benchmark_bloom=benchmark_bloom, bloom_k=bloom_k,
            bloom_m_bits=bloom_m_bits, bloom_n_hashes=bloom_n_hashes,
        )
        batch_df.sparkSession.catalog.clearCache()

    writer = (
        doc_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
