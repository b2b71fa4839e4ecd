"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): select raw-corpus documents that look like a TARGET
corpus by (1) fitting cheap bag-of-hashed-n-gram language models to
both corpora, (2) scoring each raw document with the importance
log-ratio sum_g [ln p_target(g) - ln p_raw(g)] over its n-grams, and
(3) resampling by weight with the Gumbel-top-k trick. The standard
domain-targeting step of pretraining-data assembly (e.g. "select
web documents that look like Wikipedia+books").

Spark-first and fully deterministic / oracle-transcribable:
  - features are word unigrams+bigrams hashed into `n_buckets` via the
    md5 32-bit prefix (the same engine-portable rule as
    operators/sampling) — the paper's hashed n-gram generative model;
  - the two count tables are one explode + groupBy(bucket) each,
    bounded at n_buckets rows; per-bucket add-one-smoothed log-ratios
    broadcast-join back to the exploded grams and roll up in ONE
    groupBy(id) — the corpus never shuffles except on the doc id;
  - resampling uses Gumbel noise derived from the md5 hash of the doc
    id (u = (h + 0.5) / 2^32, g = -ln(-ln u)), so the selected set is
    reproducible across runs, partitionings, and engines; top-k is one
    TakeOrderedAndProject, never a full sort.

Scale (100 TB): the count tables are n_buckets rows regardless of
corpus size (map-side partial aggregation does the heavy lifting);
scoring is a broadcast join + one doc-keyed aggregate; selection is a
global top-k. The target corpus is typically small (a quality sample);
both paths only ever scan it once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "hashed_ngram_buckets",
    "dsir_log_ratios",
    "dsir_weights",
    "dsir_sample",
]


def _tokens(text_col: Column) -> Column:
    """Lowercase alnum-run tokens (the engine-wide tokenizer rule)."""
    return F.filter(
        F.split(F.lower(text_col), r"[^a-z0-9]+"), lambda t: t != ""
    )


def _bucket(gram: Column, n_buckets: int) -> Column:
    """Engine-portable hash bucket: md5 32-bit prefix mod n_buckets."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
        % F.lit(int(n_buckets))
    )


def hashed_ngram_buckets(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """(id, bucket) — one row per unigram/bigram OCCURRENCE, hashed.
    Pure JVM: tokenize once, build bigrams with zip_with over the
    shifted token array, explode the concatenation."""
    toks = _tokens(F.col(text_col))
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.concat(toks, bigrams)).alias("gram"),
    ).select("id", _bucket(F.col("gram"), n_buckets).alias("bucket"))


def _bucket_counts(grams: DataFrame) -> DataFrame:
    return grams.groupBy("bucket").agg(F.count("*").alias("c"))


def dsir_log_ratios(
    raw: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    raw_grams: DataFrame | None = None,
) -> DataFrame:
    """Per-bucket importance log-ratio table (bucket, log_ratio):
    ln p_target(b) - ln p_raw(b), add-one smoothed over n_buckets.
    At most n_buckets rows — broadcast-sized by construction.

    ``raw_grams``: a prebuilt hashed_ngram_buckets(raw) to share ONE
    tokenize/explode pass with dsir_weights — at 100 TB the raw-corpus
    gram stream is the dominant cost and both steps consume the same
    stream, so callers should build it once (see q_dsir_sample)."""
    tc = _bucket_counts(
        hashed_ngram_buckets(
            target, text_col=text_col, id_col=id_col, n_buckets=n_buckets
        )
    ).withColumnRenamed("c", "ct")
    if raw_grams is None:
        raw_grams = hashed_ngram_buckets(
            raw, text_col=text_col, id_col=id_col, n_buckets=n_buckets
        )
    rc = _bucket_counts(raw_grams).withColumnRenamed("c", "cr")
    spark = raw.sparkSession
    buckets = spark.range(int(n_buckets)).select(F.col("id").alias("bucket"))
    joined = buckets.join(tc, "bucket", "left").join(rc, "bucket", "left") \
        .fillna(0, subset=["ct", "cr"])
    # totals stay IN-PLAN (window over the <= n_buckets-row table, not
    # a driver collect) so ratios compose into one job
    t_total = F.sum("ct").over(Window.partitionBy())
    r_total = F.sum("cr").over(Window.partitionBy())
    log_ratio = (
        F.log((F.col("ct") + 1).cast("double") / (t_total + n_buckets))
        - F.log((F.col("cr") + 1).cast("double") / (r_total + n_buckets))
    )
    return joined.select("bucket", log_ratio.alias("log_ratio"))


def dsir_weights(
    raw: DataFrame,
    ratios: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    normalize: bool = True,
    raw_grams: DataFrame | None = None,
) -> DataFrame:
    """Per-document importance log-weight (id_col, n_grams, log_weight):
    the sum of its grams' bucket log-ratios, length-normalized by
    default (sum-form favors long documents; the mean is the standard
    per-token form). Gram-less documents get log_weight 0.

    ``raw_grams``: share one gram pass with dsir_log_ratios (see its
    docstring)."""
    grams = raw_grams if raw_grams is not None else hashed_ngram_buckets(
        raw, text_col=text_col, id_col=id_col, n_buckets=n_buckets
    )
    agg = (
        grams.join(F.broadcast(ratios), "bucket")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("log_ratio").alias("_lw"),
        )
    )
    lw = F.col("_lw") / F.col("n_grams") if normalize else F.col("_lw")
    out = agg.select("id", "n_grams", lw.alias("log_weight"))
    # keep gram-less docs (defined weight 0) so selection is total
    base = raw.select(F.col(id_col).alias("id"))
    return (
        base.join(out, "id", "left")
        .fillna({"n_grams": 0, "log_weight": 0.0})
        .withColumnRenamed("id", id_col)
    )


def dsir_sample(
    weights: DataFrame,
    *,
    n: int,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
    salt: str = "",
) -> DataFrame:
    """Gumbel-top-k resampling: key = log_weight + Gumbel(h(id)) where
    the Gumbel noise derives from the doc id's md5 32-bit prefix
    (u = (h + 0.5) / 2^32) — sampling WITHOUT replacement proportional
    to exp(log_weight), reproducible across runs and engines. One
    global top-k (TakeOrderedAndProject), no full sort."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16, 10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(float(2**32))
    gumbel = -F.log(-F.log(u))
    return (
        weights.withColumn("sample_key", F.round(F.col(weight_col) + gumbel, 6))
        .orderBy(F.desc("sample_key"), F.asc(id_col))
        .limit(int(n))
    )
