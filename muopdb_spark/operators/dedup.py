"""Deduplication suite for large-scale training-data pipelines.

Beyond-reference operators (BASELINE.json north star): exact dedup,
MinHash + LSH near-dup, SimHash, n-gram Jaccard, embedding-cosine
near-dup. All built from native Column expressions (md5/transform/
array_min/explode) so the hot path stays JVM-side; the only shuffles
are the unavoidable ones (LSH band join, pair verification).

Scale notes (100 TB):
  - Signatures (minhash/simhash/fingerprints) are pure map-side
    expressions — no shuffle, no Python.
  - LSH candidate generation shuffles only (band_idx, band_hash,
    doc_id) triples, not documents.
  - Pair verification joins signatures/shingle-sets back by doc id —
    an equi join Catalyst can plan; skew on viral bands is handled by
    AQE skew-join splitting.
  - Brute-force embedding pairs is quadratic and kept for the oracle /
    small dims; the scale path is LSH bucketing (see
    muopdb_spark.index.ann_lsh).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from muopdb_spark.functions.distance import cosine_similarity
from muopdb_spark.functions.text import simple_tokens

# --------------------------------------------------------------- helpers


def normalized_text(col: Column | str) -> Column:
    """Whitespace-collapsed lowercase text — the canonical form for
    exact-duplicate hashing."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint (md5 of normalized text)."""
    return F.md5(normalized_text(col))


def shingles_of(toks: Column, n: int = 3) -> Column:
    """Distinct n-gram word shingles from a TOKEN ARRAY column.

    IMPORTANT: pass a materialized column reference (stage the token
    array with a select/withColumn first), not an inline tokenizer
    expression — `toks` is referenced ~3n times here and Catalyst only
    avoids re-evaluation for cheap (attribute/literal) subexpressions.
    """
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """One-expression shingles (convenience/tests). For bulk work use
    shingle_df, which tokenizes each row once instead of ~3n times."""
    return shingles_of(simple_tokens(col), n)


def shingle_df(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", n: int = 3,
) -> DataFrame:
    """(id, sh): distinct n-gram word shingles, Arrow-batched.

    Deliberately a pandas UDF rather than the built-in-expression twin
    (word_shingles): exploding a higher-order-function array triggers
    InferFiltersFromGenerate, whose synthesized `size(sh) > 0` predicate
    is pushed into the scan with the WHOLE tokenize+shingle expression
    substituted — interpreted, with no common-subexpression elimination,
    so the tokenizer re-runs per element_at reference inside the n-gram
    lambda (measured 20x at sf0.1). A Python eval node is a hard
    pushdown/collapse barrier AND vectorizes the string work; semantics
    are pinned identical to word_shingles by tests and the DuckDB oracle.
    """
    import re

    rx = re.compile(r"[^a-z0-9]+")

    @F.pandas_udf("array<string>")
    def _sh(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = [w for w in rx.split(t.lower() if t is not None else "") if w]
            if len(toks) < n:
                out.append([])
            else:
                # dict.fromkeys == array_distinct: dedupe, keep first-seen order
                out.append(list(dict.fromkeys(
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                )))
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), _sh(F.col(text_col)).alias("sh"))


def minhash_signature(shingles: Column, num_hashes: int = 8) -> list[Column]:
    """MinHash over an md5 hash family: h_i(S) = min over s∈S of
    md5(i || ':' || s), compared as hex strings. Pure map-side."""
    def hasher(i: int):
        # closure factory — a default-arg lambda would be introspected as
        # the 2-arg (element, index) transform variant
        return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))

    return [
        F.array_min(F.transform(shingles, hasher(i))) for i in range(num_hashes)
    ]


# -------------------------------------------------------------- operators


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup: group by content fingerprint, keep the lowest id as
    the canonical representative. Returns
    (id_col, fingerprint, group_size, is_canonical)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("fingerprint")
    return (
        df.select(id_col, fingerprint(text_col).alias("fingerprint"))
        .withColumn("group_size", F.count("*").over(w))
        .withColumn("is_canonical", F.col(id_col) == F.min(id_col).over(w))
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact set Jaccard of two array columns.

    The expensive array_intersect is evaluated ONCE: it is bound as the
    single element of a transform() whose lambda computes the ratio —
    a NamedLambdaVariable reference, which Catalyst cannot substitute
    back into two copies of the intersect (writing `inter/union` with
    two F.size(F.array_intersect(...)) literals doubles the verify cost
    of every dedup operator that joins shingle sets back)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    return F.element_at(
        F.transform(
            F.array(inter),
            lambda i: F.when(
                F.size(a) + F.size(b) - i > 0,
                i / (F.size(a) + F.size(b) - i),
            ).otherwise(F.lit(0.0)),
        ),
        1,
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    ranked: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard >= t).

    Candidate generation uses PREFIX FILTERING (the all-pairs similarity
    join trick, cf. Bayardo et al. WWW'07): order each doc's shingles by
    a global total order — document frequency ascending, shingle text as
    tie-break, so the prefix holds the RAREST shingles — and index only
    the first |S| - ceil(t*|S|) + 1. Any pair with jaccard >= t has
    |A∩B| >= t*max(|A|,|B|), so by pigeonhole it shares a prefix shingle:
    exact (never misses a pair), and the inverted-index self-join fans
    out over rare shingles only. Verification joins the full shingle
    sets back and computes exact Jaccard.

    EAGER: calling this launches the shingle+rank subtree immediately
    (lineage-truncating localCheckpoint — see the inline comment for
    why). Downstream operators (e.g. .limit()) therefore cannot avoid
    the upstream work; checkpoint storage is freed when the returned
    plan is garbage-collected.
    """
    # One linear pass up to the ranked table: shingle -> explode (which
    # drops empty-shingle docs for free) -> window df-count (one shuffle
    # by shingle) -> re-pack groupBy (one shuffle by id). n_sh is the
    # exploded row count per id — shingles_of() emits DISTINCT shingles,
    # so count(*) == |shingle set| and the expensive shingle expression
    # is evaluated exactly once per row (the old shape persisted the
    # shingle DF just to stop re-evaluation; measured ~2s of columnar
    # cache build for the array<string> column at sf0.1).
    from pyspark.sql.window import Window

    if ranked is not None:
        # caller-provided DURABLE ranked-shingle table (id, n_sh,
        # sh_ranked) — parquet-backed and lineage-free, so the Arrow
        # shingle pass and both ranking shuffles below never run; the
        # table is a pure function of (corpus, n), so results are
        # identical to the from-scratch path (the oracle checks that)
        return _ppjoin_from_ranked(ranked, threshold)
    sh = shingle_df(df, text_col=text_col, id_col=id_col, n=n)
    exploded = sh.select("id", F.explode("sh").alias("shingle"))
    ranked = (
        exploded.withColumn("df", F.count("*").over(Window.partitionBy("shingle")))
        .groupBy("id")
        .agg(
            F.count("*").cast("int").alias("n_sh"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "shingle"))),
                lambda s: s["shingle"],
            ).alias("sh_ranked"),
        )
    )
    # ranked feeds three branches (prefix index + both verification
    # sides); without materialization the whole upstream pipeline
    # re-runs per branch (measured 25s vs 5s at sf0.1 — AQE does not
    # reuse the aggregate's exchange across the self-join's sides).
    # localCheckpoint(eager) rather than persist+count: it TRUNCATES
    # the lineage, so the three consuming shuffle-map stages CANNOT
    # recompute the subtree even under eviction/race — with
    # persist+count, concurrent stages racing an unpopulated or
    # evicted cache each re-ran every partition (cache writes don't
    # dedupe across in-flight stages; measured 14-22s vs 3.5s at
    # sf0.1, and the r4 bench outlier reps were this). A/B r5 at
    # sf0.1: persist [3.65, 2.54, 2.52, 2.10] vs localCheckpoint
    # [2.15, 2.14, 2.07, 2.14] — tighter and faster.
    #
    # Plan-shape alternatives measured head-to-head in r5 (interleaved
    # reps, one session, sf0.1) and REJECTED — this shape won them all:
    #   - groupBy(shingle).count + join instead of the df window, with
    #     candidate-only set verification (zero persist): 5.4-7.8s vs
    #     2.0-5.7s here — the pandas-UDF shingle pass re-runs 3x and
    #     dominates.
    #   - extra persist of the narrow exploded (id, shingle) table as a
    #     recompute bound: +0.2-0.5s on every rep for protection the
    #     MEMORY_AND_DISK level already provides (eviction spills to
    #     disk; it does not recompute).
    #   - xxhash64 shingles (array<long> cache instead of array<string>):
    #     warm floor identical (2.0-2.4s vs 1.8-2.2s) — the cost is the
    #     UDF pass + fixed overheads, not shuffle width — and it would
    #     soften the exactness claim for a 2^-64 collision.
    # The warm floor is ~2s in every shape; the r4 bench outliers
    # ([4.01, 11.45, 6.89]) were first-exec codegen (rep0) plus box load
    # (bench.py now compiles this pipeline at the smoke SF before
    # timing).
    ranked = ranked.localCheckpoint(eager=True)
    return _ppjoin_from_ranked(ranked, threshold)


def _ppjoin_from_ranked(ranked: DataFrame, threshold: float) -> DataFrame:
    """Prefix-filter + PPJoin + exact verification over a materialized
    ranked-shingle table (id, n_sh, sh_ranked) — shared by the
    from-scratch and the durable-artifact serving paths."""
    prefix_len = (F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1).cast("int")
    inv = ranked.select(
        "id",
        "n_sh",
        F.posexplode(F.slice("sh_ranked", 1, prefix_len)).alias("pos", "shingle"),
    )
    a, b = inv.alias("a"), inv.alias("b")
    # size-compatibility (exact): jaccard >= t implies
    # t * max(|A|,|B|) <= min(|A|,|B|)
    size_ok = (
        F.least(F.col("a.n_sh"), F.col("b.n_sh"))
        >= F.lit(threshold) * F.greatest(F.col("a.n_sh"), F.col("b.n_sh"))
    )
    # positional filter (PPJoin, Xiao et al. WWW'08, exact): a match at
    # 0-based prefix position p leaves at most n_sh - p shingles that
    # can still intersect (both lists share the same global rarity
    # order), and jaccard >= t needs overlap >= t/(1+t)·(|A|+|B|).
    # The 1e-9 slack keeps the integer-vs-real comparison conservative
    # (never drops a true pair). Cuts candidates 43.5k -> 12.8k at
    # sf0.1 before the distinct.
    alpha = F.lit(threshold / (1.0 + threshold)) * (
        F.col("a.n_sh") + F.col("b.n_sh")
    )
    pos_ok = (
        F.least(
            F.col("a.n_sh") - F.col("a.pos"), F.col("b.n_sh") - F.col("b.pos")
        ).cast("double")
        >= alpha - F.lit(1e-9)
    )
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id"))
            & size_ok
            & pos_ok,
        )
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .distinct()
    )
    # verification reads the shingle SETS back from `ranked` (rarity
    # order is irrelevant to set intersection)
    sa = ranked.select(F.col("id").alias("doc_a"), F.col("sh_ranked").alias("sh_a"))
    sb = ranked.select(F.col("id").alias("doc_b"), F.col("sh_ranked").alias("sh_b"))
    # Verification: broadcast the candidate PAIRS (ids only — orders of
    # magnitude smaller than the shingle table; at 100 TB the prefix
    # index bounds candidates per doc, and a too-big candidate set
    # falls back to a shuffle join by removing the hint) so the two
    # shingle-set joins stay shuffle-free, and compute array_intersect
    # ONCE per pair (the old jaccard() helper evaluated it twice —
    # Catalyst does not CSE across the division; measured ~2x the
    # verify stage cost at sf0.1).
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double")
    return (
        sa.join(F.broadcast(cand), "doc_a")
        .join(sb, "doc_b")
        .withColumn("inter", inter)
        .withColumn(
            "jaccard",
            F.col("inter") / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signature_df(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """(id, sh, h0..h{H-1}, b0..b{B-1}): distinct shingle sets, MinHash
    signature, and banded LSH keys — one Arrow shingle pass, then pure
    JVM md5 folds; no shuffle.

    The (id, h*, b*) projection (drop `sh`) is the durable corpus
    artifact for INCREMENTAL dedup: a fixed ~[num_hashes + bands] hashes
    per document regardless of document size, so at 100 TB of corpus
    text the signature index is a few hundred GB that dedup of an
    incoming batch scans INSTEAD of the corpus text (see
    incremental_minhash_pairs)."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sh = shingle_df(df, text_col=text_col, id_col=id_col, n=n)
    sh = sh.filter(F.size("sh") > 0)
    sig = sh.select(
        "id", "sh",
        *[h.alias(f"h{i}") for i, h in enumerate(minhash_signature(F.col("sh"), num_hashes))],
    )
    band_cols = [
        F.md5(F.concat_ws("|", *[F.col(f"h{j}") for j in range(b * rows_per_band, (b + 1) * rows_per_band)])).alias(f"b{b}")
        for b in range(bands)
    ]
    return sig.select("id", "sh", *[F.col(f"h{i}") for i in range(num_hashes)], *band_cols)


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.8,
    sig: DataFrame | None = None,
) -> DataFrame:
    """MinHash + banded LSH near-dup detection with exact verification:

      shingle -> minhash signature -> band hashes -> band-bucket join
      (candidates) -> exact Jaccard on shingle sets -> threshold.

    Output: (doc_a, doc_b, est_jaccard, jaccard) for candidate pairs
    that share >= 1 LSH band AND pass exact Jaccard >= threshold.
    est_jaccard = fraction of matching minhashes.

    EAGER: calling this materializes the signature subtree immediately
    (lineage-truncating localCheckpoint, rationale inline); checkpoint
    storage is freed when the returned plan is garbage-collected.

    ``sig``: pass a prebuilt (already materialized) minhash_signature_df
    WITH the `sh` column to share one shingle+minhash pass across
    callers (streaming/admission.py signs each batch once for the
    intra, cross, and artifact-append stages).
    """
    if sig is None:
        sig = minhash_signature_df(
            df, text_col=text_col, id_col=id_col, n=n,
            num_hashes=num_hashes, bands=bands,
        )
        # the signature subtree feeds three plan branches (bucket
        # explode + both verification sides); materialize so the
        # md5-heavy minhash pass runs once instead of three times.
        # localCheckpoint(eager) rather than persist+count: truncating
        # the lineage makes the concurrent consumer stages structurally
        # unable to recompute the subtree (with a cache they race it on
        # eviction — the bimodal 6-14s timings in BENCH_r02; see the d2
        # A/B in ngram_jaccard_pairs)
        sig = sig.localCheckpoint(eager=True)

    # candidates: explode bands, equi-join within (band_idx, band_hash) buckets
    buckets = sig.select(
        "id",
        F.posexplode(F.array(*[F.col(f"b{b}") for b in range(bands)])).alias("band_idx", "band_hash"),
    )
    ca, cb = buckets.alias("ca"), buckets.alias("cb")
    cand = (
        ca.join(
            cb,
            (F.col("ca.band_idx") == F.col("cb.band_idx"))
            & (F.col("ca.band_hash") == F.col("cb.band_hash"))
            & (F.col("ca.id") < F.col("cb.id")),
        )
        .select(F.col("ca.id").alias("doc_a"), F.col("cb.id").alias("doc_b"))
        .distinct()
    )

    # verification: join signatures+shingles back, exact jaccard
    sa = sig.select(
        F.col("id").alias("doc_a"), F.col("sh").alias("sh_a"),
        *[F.col(f"h{i}").alias(f"ha{i}") for i in range(num_hashes)],
    )
    sb = sig.select(
        F.col("id").alias("doc_b"), F.col("sh").alias("sh_b"),
        *[F.col(f"h{i}").alias(f"hb{i}") for i in range(num_hashes)],
    )
    est = sum(
        F.when(F.col(f"ha{i}") == F.col(f"hb{i}"), 1).otherwise(0) for i in range(num_hashes)
    ) / float(num_hashes)
    out = (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("est_jaccard", est)
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select(
        "doc_a", "doc_b",
        F.round("est_jaccard", 6).alias("est_jaccard"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def minhash_lsh_pairs_from_artifact(
    corpus_df: DataFrame,
    corpus_sigs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Corpus-self near-dup pairs SERVED from the durable signature
    artifact (the full-corpus twin of incremental_minhash_pairs):
    candidate generation scans ONLY the fixed-width (id, h*, b*)
    artifact — the corpus text is never re-shingled for signing — and
    exact-Jaccard verification re-shingles ONLY candidate ids (semi
    join into the text scan). Output and semantics are IDENTICAL to
    minhash_lsh_pairs over the same corpus, which is exactly what the
    oracle checks.

    At 100 TB the artifact is ~(num_hashes+bands)*32 bytes/doc of
    columnar parquet vs re-tokenizing the corpus per run — this is the
    d3 serving path once signatures exist (they are appended on
    admission, streaming/admission.py)."""
    buckets = corpus_sigs.select(
        "id",
        F.posexplode(
            F.array(*[F.col(f"b{b}") for b in range(bands)])
        ).alias("band_idx", "band_hash"),
    )
    ca, cb2 = buckets.alias("ca"), buckets.alias("cb")
    cand = (
        ca.join(
            cb2,
            (F.col("ca.band_idx") == F.col("cb.band_idx"))
            & (F.col("ca.band_hash") == F.col("cb.band_hash"))
            & (F.col("ca.id") < F.col("cb.id")),
        )
        .select(F.col("ca.id").alias("doc_a"), F.col("cb.id").alias("doc_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cand_ids = (
        cand.select(F.col("doc_a").alias("id"))
        .union(cand.select(F.col("doc_b").alias("id")))
        .distinct()
        .withColumnRenamed("id", id_col)
    )
    csh = shingle_df(
        corpus_df.join(F.broadcast(cand_ids), on=id_col, how="semi"),
        text_col=text_col, id_col=id_col, n=n,
    ).localCheckpoint(eager=True)
    sa = corpus_sigs.select(
        F.col("id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"ha{i}") for i in range(num_hashes)],
    )
    sb = corpus_sigs.select(
        F.col("id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"hb{i}") for i in range(num_hashes)],
    )
    est = sum(
        F.when(F.col(f"ha{i}") == F.col(f"hb{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    ) / float(num_hashes)
    sha = csh.select(F.col("id").alias("doc_a"), F.col("sh").alias("sh_a"))
    shb = csh.select(F.col("id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .join(sha, "doc_a").join(shb, "doc_b")
        .withColumn("est_jaccard", est)
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select(
            "doc_a", "doc_b",
            F.round("est_jaccard", 6).alias("est_jaccard"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


def incremental_minhash_pairs(
    new_df: DataFrame,
    corpus_sigs: DataFrame,
    corpus_df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.8,
    sig: DataFrame | None = None,
) -> DataFrame:
    """Dedup an INCOMING batch against an EXISTING corpus using the
    corpus's durable signature artifact — the incremental flavor that
    matters at 100 TB, where re-running corpus-wide dedup per ingest
    batch (minhash_lsh_pairs over old ∪ new) would re-shingle 100 TB to
    admit a few GB:

      - corpus text is NOT rescanned for signatures; only the compact
        (id, h*, b*) artifact (built once by minhash_signature_df,
        appended to as batches are admitted) streams through candidate
        generation
      - the new batch is the small side by construction, so its band
        table is BROADCAST to the corpus-signature scan: candidate
        generation shuffles nothing
      - exact-Jaccard verification re-reads corpus text ONLY for
        candidate ids (broadcast semi join into the corpus scan — the
        parquet bloom-filter / row-group-pruning point-lookup path)

    Output: (new_id, corpus_id, est_jaccard, jaccard) for cross pairs
    sharing >= 1 LSH band with exact Jaccard >= threshold. Same
    candidate rule + verification as minhash_lsh_pairs, restricted to
    new × corpus.

    EAGER: materializes the new batch's signature subtree (it feeds
    the band join, the est-jaccard join, and the verification join)
    via lineage-truncating localCheckpoint.

    ``sig``: prebuilt, already-materialized minhash_signature_df of the
    NEW batch (with `sh`) to share one signing pass across callers.
    """
    if sig is None:
        nsig = minhash_signature_df(
            new_df, text_col=text_col, id_col=id_col, n=n,
            num_hashes=num_hashes, bands=bands,
        )
        # same barrier rationale as minhash_lsh_pairs: lineage-truncated
        # materialization, immune to the concurrent-consumer recompute
        # race
        nsig = nsig.localCheckpoint(eager=True)
    else:
        nsig = sig

    def _bands(sig: DataFrame, out_id: str) -> DataFrame:
        return sig.select(
            F.col("id").alias(out_id),
            F.posexplode(
                F.array(*[F.col(f"b{b}") for b in range(bands)])
            ).alias("band_idx", "band_hash"),
        )

    cand = (
        _bands(corpus_sigs, "corpus_id")
        .join(F.broadcast(_bands(nsig, "new_id")), ["band_idx", "band_hash"])
        .select("new_id", "corpus_id")
        .distinct()
    )
    na = nsig.select(
        F.col("id").alias("new_id"), F.col("sh").alias("sh_a"),
        *[F.col(f"h{i}").alias(f"ha{i}") for i in range(num_hashes)],
    )
    cb = corpus_sigs.select(
        F.col("id").alias("corpus_id"),
        *[F.col(f"h{i}").alias(f"hb{i}") for i in range(num_hashes)],
    )
    cand_ids = cand.select(F.col("corpus_id").alias(id_col)).distinct()
    csh = shingle_df(
        corpus_df.join(F.broadcast(cand_ids), on=id_col, how="semi"),
        text_col=text_col, id_col=id_col, n=n,
    ).select(F.col("id").alias("corpus_id"), F.col("sh").alias("sh_b"))
    est = sum(
        F.when(F.col(f"ha{i}") == F.col(f"hb{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    ) / float(num_hashes)
    return (
        cand.join(na, "new_id").join(cb, "corpus_id").join(csh, "corpus_id")
        .withColumn("est_jaccard", est)
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select(
            "new_id", "corpus_id",
            F.round("est_jaccard", 6).alias("est_jaccard"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


def passage_dedup_stats(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Passage-level duplication profile at fixed k-token granularity
    (the window-level view of Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better": duplication lives INSIDE
    documents that are not whole-document duplicates).

    Each document is split into non-overlapping k-token passages (the
    tail passage may be short); a passage is DUPLICATED if its text
    occurs in >= 2 distinct documents. Output per surviving doc
    (>= 1 token): (doc_id, n_passages, n_dup_passages, dup_frac).

    Scale: passage hashing is map-side expression work (tokens
    materialized once per row, md5 per window); ONE text scan total.
    "occurs in >= 2 distinct docs" is computed as min(doc_id) !=
    max(doc_id) over a window by passage hash — O(1) window state, no
    distinct-count set, and no groupBy+join-back (which would scan and
    re-tokenize the corpus twice). Shuffles: once on the md5 passage
    hash (uniform — no salting needed even on repetitive corpora),
    once on doc_id for the rollup. Linear, no quadratic step."""
    from pyspark.sql.window import Window

    staged = df.select(
        F.col(id_col).alias("doc_id"), simple_tokens(text_col).alias("toks")
    ).filter(F.size("toks") > 0)
    npass = F.ceil(F.size("toks") / F.lit(float(k))).cast("int")
    passages = staged.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), npass - 1),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice(F.col("toks"), i * k + 1, k))
                ),
            )
        ).alias("ph"),
    )
    w = Window.partitionBy("ph")
    return (
        passages
        .withColumn(
            "is_dup", F.min("doc_id").over(w) != F.max("doc_id").over(w)
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_passages"),
            F.sum(F.col("is_dup").cast("long")).alias("n_dup_passages"),
        )
        .withColumn(
            "dup_frac",
            F.round(F.col("n_dup_passages") / F.col("n_passages"), 6),
        )
    )


def line_dedup(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-wide LINE-level exact dedup with keep-first semantics —
    the C4 duplicated-span rule at line granularity (Raffel et al.
    2020 §2.2 discard repeated spans; FineWeb / RefinedWeb apply it
    per line): a line survives only at its globally FIRST occurrence
    (ordered by (doc_id, line_no)); every later copy anywhere in the
    corpus is dropped and the documents are reassembled from their
    surviving lines in original order. Lines shorter than `min_chars`
    (default: empty lines) never participate — they are kept verbatim,
    not collapsed to one global copy.

    Output: (doc_id, text_clean, n_lines, kept_lines) for every input
    doc; kept_lines == 0 means the whole document was boilerplate
    already seen elsewhere.

    Scale (100 TB): first-occurrence is computed as a per-line-hash
    min(struct(doc_id, line_no)) AGGREGATE — partial aggregation
    collapses each partition's duplicate lines before the shuffle
    (the dominant case: boilerplate repeats millions of times), so
    the exchange carries ~distinct-lines rows, not the corpus line
    stream; a window over the hash would sort the full stream
    instead. Hash is BINARY(16) md5 (the d9 treatment) so shuffle
    bytes don't carry line text. Winners broadcast back by hash join
    (AQE decides broadcast vs shuffle from the distinct-line count),
    then one doc_id shuffle reassembles. Keep-first is inherently
    order-dependent — same documented caveat as d9's removal path."""
    from pyspark.sql.window import Window  # noqa: F401  (doc symmetry)

    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\n")
        ).alias("line_no", "line"),
    ).withColumn(
        "lh",
        F.when(
            F.length("line") >= int(min_chars),
            F.unhex(F.md5(F.col("line").cast("binary"))),
        ),
    )
    winners = (
        lines.filter(F.col("lh").isNotNull())
        .groupBy("lh")
        .agg(F.min(F.struct("id", "line_no")).alias("w"))
        .select("lh", F.col("w.id").alias("wid"),
                F.col("w.line_no").alias("wln"))
    )
    marked = lines.join(winners, "lh", "left").withColumn(
        "kept",
        F.col("lh").isNull()  # short/empty lines always survive
        | ((F.col("id") == F.col("wid")) & (F.col("line_no") == F.col("wln"))),
    )
    rebuilt = (
        marked.groupBy("id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("line_no", "line", "kept"))
            ).alias("ls")
        )
        .select(
            F.col("id").alias(id_col),
            F.concat_ws(
                "\n",
                F.transform(
                    F.filter(F.col("ls"), lambda s: s["kept"]),
                    lambda s: s["line"],
                ),
            ).alias("text_clean"),
            F.size("ls").cast("long").alias("n_lines"),
            F.size(F.filter(F.col("ls"), lambda s: s["kept"]))
            .cast("long").alias("kept_lines"),
        )
    )
    return rebuilt


def soft_dedup_weights(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    hot_gram_salts: int | None = None,
) -> DataFrame:
    """Duplication-aware REWEIGHTING — the soft alternative to hard
    removal (cf. SoftDedup, He et al. 2024; DataComp-LM keeps near-dups
    but downweights them): each document gets a sampling weight equal
    to the inverse GEOMETRIC MEAN of the corpus document-frequency of
    its distinct word n-grams,

        soft_weight = exp(-mean over doc's grams of ln df(gram))

    so unique content weighs 1.0, a doc whose every gram appears in c
    docs weighs ~1/c, and partially-duplicated docs land in between —
    duplicated information is attenuated instead of destroyed, which
    preserves the tail that hard thresholds clip.

    Output: (id_col, n_grams, soft_weight); docs too short to shingle
    (< n tokens) carry weight 1.0.

    Scale (100 TB): ONE shingle pass over the corpus — each gram's
    document frequency is a count window over the gram-hash partition
    (r16; the earlier groupBy-df + join-back form shingled the corpus
    TWICE, once per side of the self-join, and at corpus scale — df
    table past broadcast size — paid a SECOND gram-keyed shuffle of
    the stream for the join). Grams ride as BINARY(16) md5 so the
    single gram-keyed shuffle never carries gram text; the per-doc
    mean is a partial-agg aggregate over the windowed stream.

    Skew trade, stated honestly: a boilerplate gram present in c docs
    makes one window partition of c rows, and unlike a join AQE
    cannot split a window partition — but the window computes only
    count(*) (no order-by), WindowExec spills, and the join-back
    alternative concentrates the same hot gram into one join
    partition anyway once df_t exceeds broadcast size.

    ``hot_gram_salts`` (r17, r16 VERDICT #6 — the two-level-
    aggregation escape of guide §2.5, now implemented): when set to S,
    gram document frequencies come from a SALTED two-level aggregate —
    count per (gh, pmod(xxhash64(id), S)) first (map-side partial agg
    collapses each task's copies of a hot gram to <= S rows before the
    shuffle, and the hottest gram lands in S reduce groups instead of
    one window partition), then sum per gh, then an equi join back to
    the gram stream, which AQE's skew-join handling CAN split (it
    cannot split a window partition). Costs one extra planning of the
    shingle subtree (the stream feeds both the count side and the
    probe side), so the default stays the single-pass window form;
    engage it when a corpus's hottest gram dominates the window
    stage's task-time max. Bit-identical output either way
    (tests/test_soft_dedup.py pins equality and the salted plan
    shape).
    """
    from pyspark.sql import Window

    g = (
        shingle_df(df, text_col=text_col, id_col=id_col, n=n)
        .select("id", F.explode("sh").alias("gram"))
        .select("id", F.unhex(F.md5("gram")).alias("gh"))
    )
    if hot_gram_salts is not None and hot_gram_salts > 1:
        salted = g.select(
            "gh",
            F.pmod(F.xxhash64("id"), F.lit(int(hot_gram_salts)))
            .alias("_salt"),
        )
        df_t = (
            salted.groupBy("gh", "_salt")
            .agg(F.count("*").alias("_c"))
            .groupBy("gh")
            .agg(F.sum("_c").alias("df"))
        )
        with_df = g.join(df_t, "gh").select("id", "df")
    else:
        with_df = g.select(
            "id", F.count("*").over(Window.partitionBy("gh")).alias("df")
        )
    sc = (
        with_df.groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.avg(F.log(F.col("df"))).alias("_m"),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(sc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0).cast("long")).alias("n_grams"),
            F.round(
                F.coalesce(F.exp(-F.col("_m")), F.lit(1.0)), 6
            ).alias("soft_weight"),
        )
    )


_HEXDIG = "0123456789abcdef"


def _simhash_from_hexes(hexes: Column, bits: int) -> Column:
    """SimHash accumulator over a column of per-token md5 hex strings.

    Bit b comes from hex digit b//4 (low bit first within the digit);
    signature bit b is 1 iff sum over tokens of (2*bit_b - 1) > 0.
    Pure expression — map-side, no shuffle, no Python.
    """
    assert bits % 4 == 0 and bits <= 60

    def digit_val(h: Column, pos: int) -> Column:
        return F.instr(F.lit(_HEXDIG), F.substring(h, pos + 1, 1)) - 1

    def vote_merge(b: int):
        # closure factory: pyspark introspects lambda arity, so a
        # default-arg capture (lambda s, h, b=b) would be mis-parsed as
        # a 3-arg lambda
        return lambda s, h: s + (
            F.shiftright(digit_val(h, b // 4), b % 4).bitwiseAND(F.lit(1)) * 2 - 1
        )

    acc = F.lit(0).cast("long")
    for b in range(bits):
        vote = F.aggregate(hexes, F.lit(0), vote_merge(b))
        acc = acc + F.when(vote > 0, F.lit(2 ** b)).otherwise(F.lit(0)).cast("long")
    return acc


def simhash_bits(col: Column | str, bits: int = 16) -> Column:
    """One-expression SimHash (for ad-hoc use; simhash_table materializes
    the md5 array once so each token hashes once, not once per bit)."""
    toks = F.array_distinct(simple_tokens(col))
    return _simhash_from_hexes(F.transform(toks, lambda t: F.md5(t)), bits)


def simhash_table(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", bits: int = 16,
) -> DataFrame:
    toks = F.array_distinct(simple_tokens(text_col))
    staged = df.select(id_col, F.transform(toks, lambda t: F.md5(t)).alias("_hx"))
    return staged.select(id_col, _simhash_from_hexes(F.col("_hx"), bits).alias("simhash"))


def hamming(a: Column, b: Column, bits: int = 16) -> Column:
    x = a.bitwiseXOR(b)
    return sum(F.shiftright(x, i).bitwiseAND(F.lit(1)) for i in range(bits))


def simhash_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    max_hamming: int = 2,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance. Candidates via
    half-signature buckets (a pair within hamming<=h for small h shares
    at least one half when h <= 1 per half... for h <= max_hamming=2 we
    use (hi, lo) halves: any pair with hamming <= 2 differs by <= 2 bits,
    so at least one half is EQUAL only when both diffs fall in the other
    half — to stay exact we union both half-buckets AND verify; pairs
    with one diff in each half are caught by neither bucket, so for
    exactness at small scale we fall back to a self-join on a coarse
    bucket = simhash >> bits/2 OR simhash & mask, then verify hamming."""
    sig = simhash_table(df, text_col=text_col, id_col=id_col, bits=bits)
    half = bits // 2
    mask = (1 << half) - 1
    buck = sig.select(
        F.col(id_col).alias("id"), "simhash",
        F.posexplode(
            F.array(
                F.shiftright("simhash", half).cast("long"),
                F.col("simhash").bitwiseAND(F.lit(mask)).cast("long"),
            )
        ).alias("half_idx", "half_val"),
    )
    a, b = buck.alias("a"), buck.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.half_idx") == F.col("b.half_idx"))
            & (F.col("a.half_val") == F.col("b.half_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    # NOTE: half-bucketing guarantees recall only for hamming <= 1 per
    # half; with max_hamming=2 a (1,1) split pair is missed by design —
    # this is the standard LSH recall/cost tradeoff and is documented in
    # the oracle, which applies the same bucket condition.
    return (
        cand.withColumn("hamming", hamming(F.col("sh_a"), F.col("sh_b"), bits))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def embedding_near_dup_pairs_df(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Pure-DataFrame brute-force cosine pairs (zip_with/aggregate exprs).
    Kept as the reference implementation; embedding_near_dup_pairs is the
    vectorized production path."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_similarity(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def embedding_near_dup(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    exact: bool = False,
    num_planes: int = 12,
    num_tables: int = 4,
    seed: int = 42,
    max_bucket_size: int | None = None,
    num_blocks: int = 8,
) -> DataFrame:
    """Embedding-cosine near-dup pairs — THE entry point for
    `dedup --method embedding`. The DEFAULT path is sub-quadratic:
    RP-LSH candidate generation (index.ann_lsh.build_rp_lsh — one
    map-side Arrow matmul per partition, no training pass) followed by
    exact per-bucket cosine verification, so precision is 1.0 and only
    recall depends on the LSH knobs (num_planes narrows buckets,
    num_tables multiplies chances; exact duplicates always collide).
    At 100 TB the corpus never enters an all-pairs join: the shuffle
    carries (table, bucket, id) triples and verification touches
    bucket-local rows only.

    `exact=True` switches to the all-pairs block-nested-loop referee
    (embedding_near_dup_pairs) — O(n^2) compute BY CONTRACT, for
    recall measurement and oracle checks at fixture scale, never the
    production path. Same output schema either way:
    (id_a, id_b, cosine) with id_a < id_b, cosine rounded to 6."""
    if exact:
        return embedding_near_dup_pairs(
            df, vec_col=vec_col, id_col=id_col, threshold=threshold,
            num_blocks=num_blocks,
        )
    from muopdb_spark.index.ann_lsh import build_rp_lsh, lsh_near_dup_pairs

    index = build_rp_lsh(
        df, vec_col=vec_col, id_col=id_col,
        num_planes=num_planes, num_tables=num_tables, seed=seed,
    )
    return lsh_near_dup_pairs(
        index, threshold=threshold, max_bucket_size=max_bucket_size,
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    num_blocks: int = 8,
) -> DataFrame:
    """Embedding-cosine near-dup pairs — distributed block-nested-loop
    with Arrow-batched numpy matmul per block pair. This is the EXACT
    REFEREE (reach it via embedding_near_dup(exact=True)); the default
    production path is the RP-LSH route in embedding_near_dup, which
    is sub-quadratic — do not point a 100 TB corpus at this form.

    Vectors are hashed into `num_blocks` blocks; every block pair (i<=j)
    becomes one applyInPandas group that computes the block×block cosine
    matrix in float64 numpy and emits pairs above threshold. Fully
    distributed (no driver collect): each row is replicated ~num_blocks
    times through one shuffle, and compute parallelism is
    num_blocks*(num_blocks+1)/2 independent tasks.

    Still inherently quadratic — this is the exact path / recall oracle;
    the sub-quadratic scale path buckets first (IVF / LSH, see
    muopdb_spark.index).
    """
    import numpy as np
    import pandas as pd

    B = num_blocks
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(B)).alias("blk"),
    )
    others = F.array(*[F.lit(i) for i in range(B)])
    left = (
        base.withColumn("bj", F.explode(others))
        .filter(F.col("blk") <= F.col("bj"))
        .select(F.col("blk").alias("bi"), "bj", F.lit("L").alias("side"), "id", "vec")
    )
    right = (
        base.withColumn("bi", F.explode(others))
        .filter(F.col("bi") < F.col("blk"))  # strict: diagonal handled by L alone
        .select("bi", F.col("blk").alias("bj"), F.lit("R").alias("side"), "id", "vec")
    )
    tagged = left.unionByName(right)

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        lmask = pdf["side"] == "L"
        lids = pdf.loc[lmask, "id"].to_numpy()
        lmat = np.array(pdf.loc[lmask, "vec"].tolist(), dtype=np.float64)
        diagonal = pdf["bi"].iat[0] == pdf["bj"].iat[0]
        if diagonal:
            rids, rmat = lids, lmat
        else:
            rids = pdf.loc[~lmask, "id"].to_numpy()
            rmat = np.array(pdf.loc[~lmask, "vec"].tolist(), dtype=np.float64)
        if len(lids) == 0 or len(rids) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        # dot / (|a|*|b|) — same formula shape as the SQL oracle's
        # list_cosine_similarity, so round-6 values agree
        sims = (lmat @ rmat.T) / np.outer(
            np.linalg.norm(lmat, axis=1), np.linalg.norm(rmat, axis=1)
        )
        ia, ib = np.where(sims >= threshold)
        a_ids, b_ids = lids[ia], rids[ib]
        keep = a_ids != b_ids
        a_ids, b_ids, s = a_ids[keep], b_ids[keep], sims[ia[keep], ib[keep]]
        lo, hi = np.minimum(a_ids, b_ids), np.maximum(a_ids, b_ids)
        out = pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": np.round(s, 6)})
        return out.drop_duplicates(["id_a", "id_b"])

    return (
        tagged.groupBy("bi", "bj")
        .applyInPandas(block_pairs, schema="id_a long, id_b long, cosine double")
        .dropDuplicates(["id_a", "id_b"])
    )
