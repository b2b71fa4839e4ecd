"""Deterministic sampling operators: reproducibility, partitioning
independence, stratified exactness, reservoir cardinality."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from muopdb_spark.operators.sampling import (
    deterministic_reservoir,
    hash_sample,
    stratified_hash_sample,
)


def _expected_keys(keys, fraction, salt=""):
    thr = format(min(int(fraction * 2**32), 2**32 - 1), "08x")
    return {
        k for k in keys
        if hashlib.md5(f"{salt}{k}".encode()).hexdigest()[:8] < thr
    }


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_hash_sample_matches_reference_md5(docs):
    keys = [r["doc_id"] for r in docs.select("doc_id").collect()]
    got = {r["doc_id"] for r in hash_sample(docs, key_col="doc_id", fraction=0.3).collect()}
    assert got == _expected_keys(keys, 0.3)


def test_hash_sample_partitioning_invariant(docs):
    a = {r["doc_id"] for r in hash_sample(docs, key_col="doc_id", fraction=0.5).collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(
            docs.repartition(13, "lang"), key_col="doc_id", fraction=0.5
        ).collect()
    }
    assert a == b  # df.sample() would fail this


def test_hash_sample_salt_decorrelates(docs):
    a = {r["doc_id"] for r in hash_sample(docs, key_col="doc_id", fraction=0.5, salt="a").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, key_col="doc_id", fraction=0.5, salt="b").collect()}
    assert a != b
    # both still ~half (very loose bound; n=500 at sf0.001... use 3-sigma-ish)
    n = docs.count()
    for s in (a, b):
        assert 0.3 * n < len(s) < 0.7 * n


def test_fraction_bounds():
    with pytest.raises(ValueError):
        from muopdb_spark.operators.sampling import _threshold_hex

        _threshold_hex(1.5)


def test_stratified_fractions(docs):
    out = stratified_hash_sample(
        docs, strata_col="lang", key_col="doc_id",
        fractions={"fr": 1.0, "zh": 0.0},
        default_fraction=0.25,
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang.get("fr") == totals["fr"]  # keep-all stratum
    assert "zh" not in by_lang  # dropped stratum
    for lang in set(totals) - {"fr", "zh"}:  # default strata: ~25%
        assert by_lang.get(lang, 0) < 0.6 * totals[lang]


def test_reservoir_exact_n_and_deterministic(docs):
    out = deterministic_reservoir(docs, strata_col="lang", key_col="doc_id", n=7)
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, total in totals.items():
        assert counts[lang] == min(7, total)
    # deterministic: second run identical
    again = deterministic_reservoir(docs, strata_col="lang", key_col="doc_id", n=7)
    assert sorted(map(tuple, out.select("lang", "doc_id").collect())) == sorted(
        map(tuple, again.select("lang", "doc_id").collect())
    )
