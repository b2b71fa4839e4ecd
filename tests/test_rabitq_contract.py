"""Driver-contract gate for the RaBitQ estimate + exact-re-rank query:
the final top-10 must EQUAL brute force at the correctness-gate scale
factor (sf0.01) AND the bench scale factor (sf0.1) — i.e. the estimated
top-300 candidate pool contains the true top-10 at both scales."""

import duckdb
import pytest


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as m

    return m


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_rabitq_rerank_is_exact_on_fixture(spark, entry, sf):
    got = [(r["vec_id"], r["score"]) for r in entry.q_rabitq_rerank(spark, sf).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    exp = [
        (int(a), float(b))
        for a, b in con.execute(entry.oracle_sql()["v13_rabitq_rerank"]).fetchall()
    ]
    assert got == exp
