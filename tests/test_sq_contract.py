"""Driver-contract gate for the SQ8 estimate + exact-re-rank query:
the final top-10 must EQUAL brute force at the correctness-gate scale
factor (sf0.01) AND the bench scale factor (sf0.1) — i.e. the
estimated top-300 candidate pool contains the true top-10 at both
scales.  Plus unit pins for the quantizer itself."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from muopdb_spark.index.sq import (
    SqCodebook,
    sq_encode,
    sq_est_score,
    train_sq,
)


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as m

    return m


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_sq8_rerank_is_exact_on_fixture(spark, entry, sf):
    got = [(r["vec_id"], r["score"]) for r in entry.q_sq8_rerank(spark, sf).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    exp = [
        (int(a), float(b))
        for a, b in con.execute(entry.oracle_sql()["v24_sq8_rerank"]).fetchall()
    ]
    assert got == exp


def test_codes_in_range_and_estimate_tight(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = train_sq(emb)
    enc = sq_encode(emb, cb)
    rows = enc.select("vec_id", "embedding", "sq_code").collect()
    assert all(0 <= c <= 255 for r in rows for c in r.sq_code)
    # decoded estimate within the quantization error bound of the true
    # distance: |est - true| <= ||per-dim half-step|| for every vector
    q = [float(x) for x in rows[0].embedding]
    est = {
        r.vec_id: r.est
        for r in enc.withColumn("est", sq_est_score(q, cb))
        .select("vec_id", "est").collect()
    }
    bound = float(np.linalg.norm(np.array(cb.scales)))  # 1 step per dim
    for r in rows:
        true = float(np.linalg.norm(np.array(r.embedding, dtype=np.float64) - np.array(q)))
        assert abs(est[r.vec_id] - true) <= bound + 1e-9


def test_codebook_roundtrip():
    cb = SqCodebook(mins=[0.0, -1.5], scales=[0.01, 0.02])
    back = SqCodebook.from_json(cb.to_json())
    assert back == cb


def test_constant_dim_does_not_divide_by_zero(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 5.0]), (2, [1.0, 7.0])], "vec_id long, embedding array<double>"
    )
    cb = train_sq(df)
    enc = sq_encode(df, cb).collect()
    # dim 0 is constant: every code 0, decode returns min exactly
    assert all(r.sq_code[0] == 0 for r in enc)
    est = (
        sq_encode(df, cb)
        .withColumn("est", sq_est_score([1.0, 5.0], cb))
        .orderBy("vec_id")
        .collect()
    )
    assert abs(est[0].est) < 1e-6  # exact self-distance on clean codes
