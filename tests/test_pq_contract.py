"""Driver-contract gate for the PQ-ADC + exact-re-rank query: the final
top-10 must EQUAL brute force at the correctness-gate scale factor
(sf0.01) — i.e. the ADC top-300 candidate pool contains the true top-10
(random vectors are PQ's worst case for rank noise; sf0.1 is verified
out-of-band, see q_pq_adc_rerank docstring)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as m

    return m


def test_pq_rerank_is_exact_on_fixture(spark, entry):
    got = [(r["vec_id"], r["score"]) for r in entry.q_pq_adc_rerank(spark, SF).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    exp = [
        (int(a), float(b))
        for a, b in con.execute(entry.oracle_sql()["v11_pq_adc_rerank"]).fetchall()
    ]
    assert got == exp
