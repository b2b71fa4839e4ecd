"""Model-based quality filtering: a trained reference-vs-corpus classifier.

The GPT-3 data pipeline (Brown et al. 2020, appendix A) and CCNet
(Wenzek et al. 2020) both gate web documents with a LINEAR CLASSIFIER
trained to separate a trusted "reference" slice (WebText / Wikipedia)
from the raw corpus, then keep documents scoring reference-like.  This
operator reproduces that stage end to end on the engine's own quality
signals:

  - FEATURES are the JVM-side per-doc quality features
    (operators/textstats.quality_features — token counts, alpha
    fraction, stopword ratio, ...): map-side Catalyst expressions,
    no Python.
  - TRAINING is pyspark.ml LogisticRegression (distributed L-BFGS —
    each iteration is one treeAggregate gradient pass over the
    feature table; no shuffle, driver holds only the coefficient
    vector).  Class imbalance is handled with the standard
    inverse-frequency instance weights.
  - SCORING does NOT run the mllib model: the fitted coefficients are
    extracted (a handful of doubles) and the probability is emitted as
    a plain Catalyst expression sigmoid(b0 + sum bi*xi) — so inference
    is map-side, whole-stage-codegen eligible, and usable in any
    downstream plan (joins, filters, streaming) with zero ML runtime.

Scale (100 TB): features and scoring are map-side; training cost is
#iterations linear scans over a (small, numeric) feature table — and
the reference slice needed for labels is typically <<1% of the corpus,
so training can also run on a sample without changing the contract.

TRAINING has no SQL oracle by design (iterative L-BFGS is not
SQL-expressible); classifier behavior is pinned in
tests/test_quality_model.py on synthetic separable corpora (AUC,
direction, determinism) and the scoring expression is checked against
the mllib model's own predictions to 1e-6. SERVING is oracle-checked
since r16: the t10/t10b rows pin the durable artifact's coefficients
as SQL literals and hash-match the scored output (__spark_entry__).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from muopdb_spark.operators.textstats import quality_features

FEATURES = ["n_chars", "n_tokens", "avg_token_len", "alpha_frac", "stopword_ratio"]


def train_quality_classifier(
    df: DataFrame,
    positive: Column,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    reg_param: float = 0.01,
    max_iter: int = 50,
) -> dict[str, float]:
    """Fit the reference-vs-corpus classifier; returns the coefficient
    dict {feature: weight, "__intercept__": b0} — a tiny, durable,
    engine-agnostic artifact (persist it as JSON next to the index
    TOC; scoring needs nothing else)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = quality_features(df, text_col=text_col, id_col=id_col)
    labeled = feats.join(
        df.select(id_col, positive.cast("double").alias("label")), id_col
    )
    # inverse-frequency weights: the reference slice is small by
    # construction, and unweighted LR would learn the base rate
    # (one agg job for both counts)
    counts = labeled.agg(
        F.count("*").alias("n"), F.sum("label").alias("np")
    ).collect()[0]
    n, n_pos = int(counts["n"]), int(counts["np"] or 0)
    n_pos = max(n_pos, 1)
    w_pos = n / (2.0 * n_pos)
    w_neg = n / (2.0 * max(n - n_pos, 1))
    labeled = labeled.withColumn(
        "weight", F.when(F.col("label") == 1.0, w_pos).otherwise(w_neg)
    )
    asm = VectorAssembler(inputCols=FEATURES, outputCol="features")
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        weightCol="weight",
        regParam=reg_param,
        maxIter=max_iter,
        standardization=True,
    )
    model = lr.fit(asm.transform(labeled))
    out = {f: float(c) for f, c in zip(FEATURES, model.coefficients)}
    out["__intercept__"] = float(model.intercept)
    return out


def quality_score_expr(coef: dict[str, float]) -> Column:
    """sigmoid(b0 + sum bi * feature_i) as a pure Catalyst expression
    over quality_features columns — map-side inference, no ML runtime."""
    z = F.lit(coef["__intercept__"])
    for f in FEATURES:
        z = z + F.lit(coef[f]) * F.col(f).cast("double")
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_quality(
    df: DataFrame,
    coef: dict[str, float],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, p_reference): every document's probability of being
    reference-like under the trained classifier."""
    feats = quality_features(df, text_col=text_col, id_col=id_col)
    return feats.select(
        id_col, F.round(quality_score_expr(coef), 6).alias("p_reference")
    )


def classifier_quality_scores(
    df: DataFrame,
    positive: Column,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    reg_param: float = 0.01,
    max_iter: int = 50,
) -> DataFrame:
    """Train-on-self + score in one call (the query path)."""
    coef = train_quality_classifier(
        df,
        positive,
        text_col=text_col,
        id_col=id_col,
        reg_param=reg_param,
        max_iter=max_iter,
    )
    return score_quality(df, coef, text_col=text_col, id_col=id_col)


def sigmoid(z: float) -> float:
    return 1.0 / (1.0 + math.exp(-z))
