"""N-gram language-model quality scoring (CCNet-style perplexity filter).

Trains an add-k-smoothed bigram LM over the corpus itself and scores
each document by bits-per-token — the average negative log2 conditional
probability of its bigrams under that LM.  High-bits (high-perplexity)
documents read as "unlike the corpus" and are the standard removal
candidates in the CCNet quality-filtering stage (Wenzek et al., LREC
2020); using the corpus LM instead of an external KenLM model
(Heafield, WMT 2011) keeps the operator self-contained and fully
oracle-checkable against plain SQL.

Reference parity note: the reference engine (hicder/muopdb) has no LM
scorer — this is part of the training-data-pipeline surface layered on
top of its document model (documents table, tokenizer contract shared
with rs/index/src/utils/tokenizer.rs semantics: lowercase alnum runs).

Scale design (100 TB):
  - Both count tables are plain ``groupBy().count()`` aggregates —
    map-side partial combine, one shuffle each, keyed on tokens (high
    cardinality, no skew beyond Zipf head, which partial aggregation
    absorbs).
  - ``vocab_size`` caps the unigram table at the top-K most frequent
    tokens (deterministic count-desc, token-asc tiebreak); everything
    else folds to ``<unk>``.  That bounds the broadcast size of both
    count tables (bigram table further prunable with ``min_count``),
    so scoring is two broadcast joins + one per-doc partial agg —
    no quadratic work, no driver materialization.
  - The self-contained ``lm_bits_per_token`` materializes the bigram
    stream once (localCheckpoint) and feeds all four consuming
    aggregates from it.  At 100 TB you train once with
    ``train_bigram_lm``, persist the two count DataFrames as a durable
    artifact (the t6_bm25 corpus-stats pattern, index/terms.py), and
    score any stream against it — scoring is then a single Arrow
    tokenize pass + broadcast joins + one per-doc partial agg.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

BOS = "<s>"
UNK = "<unk>"


def bigram_stream(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, w1, w2) — one row per bigram, BOS-prepended.

    A doc with tokens [a, b] yields (<s>,a), (a,b); an empty doc yields
    nothing (handled by the left join in the scorers).

    Arrow-batched pandas UDF for the same reason as dedup.shingle_df:
    exploding a higher-order-function array triggers
    InferFiltersFromGenerate, whose synthesized size()>0 predicate is
    pushed into the scan with the whole tokenize+pair expression
    substituted and interpreted per row (measured: counting the sf0.1
    bigram stream took 13.9 s JVM-side vs ~1 s through this path).
    Tokens are alnum runs, so the 'w1 w2' space-join is lossless and
    split_part recovers the words JVM-side after the explode.
    """
    rx = re.compile(r"[^a-z0-9]+")

    @F.pandas_udf("array<string>")
    def _bg(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = [w for w in rx.split(t.lower() if t is not None else "") if w]
            if not toks:
                out.append([])
            else:
                toks = [BOS] + toks
                out.append(
                    [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]
                )
        return pd.Series(out)

    return (
        df.select(F.col(id_col).alias("id"), F.explode(_bg(F.col(text_col))).alias("bg"))
        .select(
            "id",
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
        )
    )


def train_bigram_lm(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int | None = None,
    min_count: int = 1,
    stream: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame | None]:
    """Count tables for an add-k bigram LM: (unigram, bigram, vocab, keep).

    unigram: (w1, c1) — context counts (#bigrams whose first word is
    w1; BOS appears here, never as w2).
    bigram:  (w1, w2, c12), prunable with ``min_count``.
    vocab:   single row (vs) — |distinct w2| AFTER any vocab fold; the
    smoothing denominator.
    keep:    (tok) — the retained vocabulary when ``vocab_size`` is
    set (None otherwise); pass it to score_bits_per_token so new
    streams fold OOV tokens exactly as training did.

    With ``vocab_size`` set, tokens outside the top-K by corpus
    frequency (tie-break: token asc, deterministic) fold to <unk> in
    BOTH positions before counting, bounding every table for broadcast.

    ``stream``: pass a prebuilt (and ideally pinned) bigram_stream to
    avoid re-running the Arrow tokenize pass per consuming aggregate.
    """
    b = (
        stream
        if stream is not None
        else bigram_stream(df, text_col=text_col, id_col=id_col)
    )
    keep: DataFrame | None = None
    if vocab_size is not None:
        keep = (
            b.groupBy("w2")
            .count()
            .orderBy(F.desc("count"), F.asc("w2"))
            .limit(int(vocab_size))
            .select(F.col("w2").alias("tok"))
        )
        b = _fold_oov(b, keep)
    uni = b.groupBy("w1").agg(F.count("*").cast("double").alias("c1"))
    big = b.groupBy("w1", "w2").agg(F.count("*").cast("double").alias("c12"))
    if min_count > 1:
        big = big.where(F.col("c12") >= F.lit(float(min_count)))
    vocab = b.agg(F.countDistinct("w2").cast("double").alias("vs"))
    return uni, big, vocab, keep


def _fold_oov(b: DataFrame, keep: DataFrame) -> DataFrame:
    """Fold (w1, w2) outside the keep-list to <unk> (BOS never folds).
    keep is vocab_size rows by construction — always broadcastable."""
    k1 = F.broadcast(
        keep.select(F.col("tok").alias("w1"), F.lit(True).alias("in1"))
    )
    k2 = F.broadcast(
        keep.select(F.col("tok").alias("w2"), F.lit(True).alias("in2"))
    )
    return (
        b.join(k1, "w1", "left")
        .join(k2, "w2", "left")
        .select(
            "id",
            F.when(F.col("in1").isNotNull() | (F.col("w1") == BOS), F.col("w1"))
            .otherwise(F.lit(UNK))
            .alias("w1"),
            F.when(F.col("in2").isNotNull(), F.col("w2"))
            .otherwise(F.lit(UNK))
            .alias("w2"),
        )
    )


def score_bits_per_token(
    df: DataFrame,
    uni: DataFrame,
    big: DataFrame,
    vocab: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
    keep: DataFrame | None = None,
    stream: DataFrame | None = None,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id_col, *carry, n_bigrams, bits_per_token) for every input doc.

    ``carry`` (r17, the smp10 quality_features pattern): extra ``df``
    columns to ride through the final per-doc projection, so a caller
    that needs e.g. the language next to the score does not plan a
    second ``df`` scan + join back on the id (requires the usual
    unique/non-null id precondition the join form also relied on).

    bits = -log2((c12 + k) / (c1 + k·V)) per bigram, averaged per doc;
    unseen bigrams/contexts get the add-k floor (counts coalesce to 0).
    Docs with no tokens score 0.0 with n_bigrams = 0.  Pass the
    training ``keep`` list when the LM was vocab-capped so a new
    stream folds OOV exactly as training did.  The count tables are
    broadcast-hinted ONLY when the LM was vocab-capped (``keep``
    present) — a capped vocab bounds both tables by construction; an
    uncapped LM's bigram table is O(corpus bigram types) and force-
    broadcasting it would OOM the driver at scale, so Catalyst picks
    the join strategy there (AQE still broadcasts when it measures the
    table small).  The scored stream never shuffles except the final
    per-doc partial agg.
    """
    s = (
        stream
        if stream is not None
        else bigram_stream(df, text_col=text_col, id_col=id_col)
    )
    if keep is not None:
        s = _fold_oov(s, keep)
    bounded = keep is not None
    big_j = F.broadcast(big) if bounded else big
    uni_j = F.broadcast(uni) if bounded else uni
    kc = F.lit(float(k))
    sc = (
        s.join(big_j, ["w1", "w2"], "left")
        .join(uni_j, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "id",
            (
                -F.log2(
                    (F.coalesce(F.col("c12"), F.lit(0.0)) + kc)
                    / (F.coalesce(F.col("c1"), F.lit(0.0)) + kc * F.col("vs"))
                )
            ).alias("bits"),
        )
    )
    agg = sc.groupBy("id").agg(
        F.count("*").alias("n_bigrams"), F.avg("bits").alias("bpt")
    )
    return (
        df.select(F.col(id_col).alias("id"), *[F.col(c) for c in carry])
        .join(agg, "id", "left")
        .select(
            F.col("id").alias(id_col),
            *[F.col(c) for c in carry],
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.round(F.coalesce(F.col("bpt"), F.lit(0.0)), 6).alias("bits_per_token"),
        )
    )


def lm_bits_per_token(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Train-on-self + score in one plan (no vocab cap): the
    oracle-checkable query path.  Production path: train_bigram_lm with
    a vocab cap once, persist, then score_bits_per_token per stream.

    The bigram stream feeds four aggregates (uni/big/vocab/score);
    localCheckpoint pins it so the Arrow tokenize pass runs exactly
    once (the dedup.py lineage-truncation pattern)."""
    s = bigram_stream(df, text_col=text_col, id_col=id_col).localCheckpoint(
        eager=True
    )
    uni, big, vocab, _ = train_bigram_lm(
        df, text_col=text_col, id_col=id_col, stream=s
    )
    return score_bits_per_token(
        df, uni, big, vocab, text_col=text_col, id_col=id_col, k=k, stream=s
    )


def perplexity_buckets(
    scored: DataFrame,
    *,
    lang_col: str = "lang",
    bits_col: str = "bits_per_token",
    id_col: str = "doc_id",
    approx: bool = False,
    approx_accuracy: int = 10000,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al., LREC 2020 §4.3):
    within each LANGUAGE, rank documents by LM bits-per-token (lower =
    more target-like) and cut at the 1/3 and 2/3 marks — head trains,
    middle is kept with caveats, tail is dropped. `scored` carries
    (id_col, lang_col, bits_col), e.g. score_bits_per_token joined
    with the language column.

    Two plans, same contract as quality_percentile_by_source:

    - ``approx=False`` (the oracle-checkable reference semantics):
      rank window per language with the bucket boundary decided in
      INTEGER arithmetic (3*rank <= n, 3*rank <= 2n) — no float
      boundary, engine-exact. The window shuffles the corpus on the
      low-cardinality language key, so one dominant language is one
      hot partition — wrong shape at 100 TB.
    - ``approx=True`` (the scale path): per-language
      approx_percentile(bits, [1/3, 2/3]) — sketch-sized shuffle —
      then a broadcast join + map-side CASE. Divergence is confined
      to boundary-score ties plus sketch error, pinned by
      tests/test_lm.py::test_ppl_buckets_approx_matches_exact.

    Ordering ties break on (bits, id); callers should round bits the
    same way on both engines (the t13 query ranks the ROUNDED value).
    """
    if not approx:
        w = Window.partitionBy(lang_col).orderBy(
            F.col(bits_col).asc(), F.col(id_col).asc()
        )
        rn = F.row_number().over(w)
        n = F.count("*").over(Window.partitionBy(lang_col))
        bucket = (
            F.when(rn * 3 <= n, F.lit("head"))
            .when(rn * 3 <= n * 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
        )
        return scored.select(
            id_col, lang_col, bits_col, bucket.alias("ppl_bucket")
        )
    thr = scored.groupBy(lang_col).agg(
        F.percentile_approx(
            bits_col, [1.0 / 3.0, 2.0 / 3.0], approx_accuracy
        ).alias("_cuts")
    )
    joined = scored.join(F.broadcast(thr), lang_col)
    bucket = (
        F.when(F.col(bits_col) <= F.col("_cuts")[0], F.lit("head"))
        .when(F.col(bits_col) <= F.col("_cuts")[1], F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return joined.select(
        id_col, lang_col, bits_col, bucket.alias("ppl_bucket")
    )


# ------------------------------------------------------------------
# r15: interpolated Kneser-Ney — the standard n-gram smoothing
# (Kneser & Ney 1995; Chen & Goodman 1998 empirical study), the
# method KenLM uses and CCNet's perplexity filter inherits. Unlike
# add-k (score_bits_per_token), the backoff weight of a word is its
# CONTEXT DIVERSITY (how many distinct left contexts it appears
# with), not its raw frequency — 'francisco' is frequent but nearly
# always follows 'san', so KN correctly gives it little unigram mass.


def train_kn_lm(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int | None = None,
    stream: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame | None]:
    """Count tables for an interpolated-KN bigram LM:
    (big, ctx, cont, totals, keep).

      big:    (w1, w2, c12)
      ctx:    (w1, c1, n1f) — context count + distinct-continuation
              count N1+(w1, ·)
      cont:   (w2, n1b) — distinct-left-context count N1+(·, w2)
      totals: single row (n1t, vs) — distinct bigram types
              N1+(·, ·) and |vocab| (the unseen-word uniform floor)

    All plain groupBy aggregates over one bigram stream — map-side
    partial combine, the same shuffle story as train_bigram_lm; with
    ``vocab_size`` every table is broadcast-bounded."""
    b = (
        stream
        if stream is not None
        else bigram_stream(df, text_col=text_col, id_col=id_col)
    )
    keep: DataFrame | None = None
    if vocab_size is not None:
        keep = (
            b.groupBy("w2")
            .count()
            .orderBy(F.desc("count"), F.asc("w2"))
            .limit(int(vocab_size))
            .select(F.col("w2").alias("tok"))
        )
        b = _fold_oov(b, keep)
    big = b.groupBy("w1", "w2").agg(F.count("*").cast("double").alias("c12"))
    ctx = big.groupBy("w1").agg(
        F.sum("c12").alias("c1"),
        F.count("*").cast("double").alias("n1f"),
    )
    cont = big.groupBy("w2").agg(
        F.count("*").cast("double").alias("n1b")
    )
    totals = big.agg(
        F.count("*").cast("double").alias("n1t"),
        F.countDistinct("w2").cast("double").alias("vs"),
    )
    return big, ctx, cont, totals, keep


def score_kn_bits_per_token(
    df: DataFrame,
    big: DataFrame,
    ctx: DataFrame,
    cont: DataFrame,
    totals: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    d: float = 0.75,
    keep: DataFrame | None = None,
    stream: DataFrame | None = None,
) -> DataFrame:
    """(id, n_bigrams, kn_bits_per_token): average -log2 interpolated-
    KN probability per bigram, discount ``d``:

      p_cont(w2) = N1+(·,w2) / N1+(·,·)      (unseen w2: 1/|vocab|)
      seen ctx:  p = max(c12-d, 0)/c1 + d·N1+(w1,·)/c1 · p_cont(w2)
      unseen ctx:                p = p_cont(w2)

    Total over any stream (every branch coalesces); the join shape is
    score_bits_per_token's — broadcast-hinted only when vocab-capped,
    final per-doc partial agg is the sole shuffle."""
    if not 0.0 < d < 1.0:
        raise ValueError(f"score_kn_bits_per_token: d must be in (0,1), got {d}")
    s = (
        stream
        if stream is not None
        else bigram_stream(df, text_col=text_col, id_col=id_col)
    )
    if keep is not None:
        s = _fold_oov(s, keep)
    bounded = keep is not None
    big_j = F.broadcast(big) if bounded else big
    ctx_j = F.broadcast(ctx) if bounded else ctx
    cont_j = F.broadcast(cont) if bounded else cont
    dd = F.lit(float(d))
    p_cont = F.coalesce(
        F.col("n1b") / F.col("n1t"), F.lit(1.0) / F.col("vs")
    )
    p_seen = (
        F.greatest(F.coalesce(F.col("c12"), F.lit(0.0)) - dd, F.lit(0.0))
        / F.col("c1")
        + dd * F.col("n1f") / F.col("c1") * p_cont
    )
    p = F.when(F.col("c1").isNotNull() & (F.col("c1") > 0), p_seen) \
        .otherwise(p_cont)
    sc = (
        s.join(big_j, ["w1", "w2"], "left")
        .join(ctx_j, ["w1"], "left")
        .join(cont_j, ["w2"], "left")
        .crossJoin(F.broadcast(totals))
        .select("id", (-F.log2(p)).alias("bits"))
    )
    agg = sc.groupBy("id").agg(
        F.count("*").alias("n_bigrams"), F.avg("bits").alias("bpt")
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(agg, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long")
            .alias("n_bigrams"),
            F.round(F.coalesce(F.col("bpt"), F.lit(0.0)), 6)
            .alias("kn_bits_per_token"),
        )
    )
