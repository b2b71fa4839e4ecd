"""Reference-vs-corpus quality classifier (operators/quality_model.py):
separability on a synthetic corpus, agreement between the Catalyst
scoring expression and the mllib model, and determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from muopdb_spark.operators.quality_model import (
    FEATURES,
    classifier_quality_scores,
    score_quality,
    train_quality_classifier,
)


@pytest.fixture(scope="module")
def corpus(spark):
    """60 'reference' docs (long, clean, stopword-rich English) vs 60
    'junk' docs (short, symbol-heavy) — linearly separable on the
    quality features."""
    ref = (
        "the quick brown fox jumps over the lazy dog and then the "
        "fox runs into the forest where it finds a quiet stream and "
        "drinks the cool water before it sleeps in the shade"
    )
    junk = "$$$ !!! @@@ ### xx 123"
    rows = [(i, ref + f" variant {i}", 1) for i in range(60)]
    rows += [(100 + i, junk + f" {i}", 0) for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, text string, is_ref int")


def test_separates_reference_from_junk(spark, corpus):
    scored = classifier_quality_scores(corpus, F.col("is_ref") == 1)
    rows = scored.join(corpus.select("doc_id", "is_ref"), "doc_id").collect()
    p_ref = [r.p_reference for r in rows if r.is_ref == 1]
    p_junk = [r.p_reference for r in rows if r.is_ref == 0]
    assert min(p_ref) > max(p_junk)  # AUC = 1 on a separable corpus
    assert min(p_ref) > 0.5 and max(p_junk) < 0.5


def test_expr_matches_mllib_predictions(spark, corpus):
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    from muopdb_spark.operators.textstats import quality_features

    coef = train_quality_classifier(corpus, F.col("is_ref") == 1)
    got = {r.doc_id: r.p_reference for r in score_quality(corpus, coef).collect()}

    # independent mllib scoring path on the same features/weights
    feats = quality_features(corpus).join(
        corpus.select("doc_id", F.col("is_ref").cast("double").alias("label")),
        "doc_id",
    )
    n = feats.count()
    n_pos = feats.filter("label = 1.0").count()
    feats = feats.withColumn(
        "weight",
        F.when(F.col("label") == 1.0, n / (2.0 * n_pos)).otherwise(
            n / (2.0 * (n - n_pos))
        ),
    )
    asm = VectorAssembler(inputCols=FEATURES, outputCol="features")
    model = LogisticRegression(
        featuresCol="features", labelCol="label", weightCol="weight",
        regParam=0.01, maxIter=50, standardization=True,
    ).fit(asm.transform(feats))
    mllib = {
        r.doc_id: float(r.probability[1])
        for r in model.transform(asm.transform(feats)).select(
            "doc_id", "probability"
        ).collect()
    }
    for d, p in got.items():
        assert abs(p - mllib[d]) < 1e-6, (d, p, mllib[d])


def test_coefficients_are_portable_artifact(spark, corpus):
    coef = train_quality_classifier(corpus, F.col("is_ref") == 1)
    assert set(coef) == set(FEATURES) | {"__intercept__"}
    # scoring from the dict alone (no model object) is deterministic
    a = sorted(map(tuple, score_quality(corpus, coef).collect()))
    b = sorted(map(tuple, score_quality(corpus, coef).collect()))
    assert a == b


def test_scoring_plan_is_jvm_only(spark, corpus):
    coef = train_quality_classifier(corpus, F.col("is_ref") == 1)
    plan = (
        score_quality(corpus, coef)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan, plan
    assert "Exchange" not in plan, plan  # fully map-side inference
