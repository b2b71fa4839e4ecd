"""Oracle gate for __spark_entry__.extra_queries() — the queries kept
OUT of the driver's 50-slot correctness window because their operator
families have unique witnesses inside it. Each is still held to the
driver's exact bar locally: run on Spark at sf0.01 — the SAME scale
as the driver's window since r15 (the r14 verdict's item 3; override
with SPARK_GRAFT_TEST_SF_DIR for quick iteration) — compare row
count, column names, and order-insensitive values against its
oracle_sql() twin on DuckDB (same compare as
tools/check_correctness.py)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_no_overlap_and_window_size():
    # r17: the driver's gate reads the FIRST 50 entries of queries()
    # in dict order (verified vs CORRECTNESS_r02/r03 history), so the
    # first 50 must stay the committed r16 window and every entry past
    # 50 (the r17 swap-backs) must be oracle-backed; the extra set
    # never shadows a registered name
    qs, extra = entry_mod.queries(), entry_mod.extra_queries()
    assert len(qs) >= 50, f"driver window under-filled ({len(qs)})"
    oracles = entry_mod.oracle_sql()
    tail = list(qs)[50:]
    assert all(n in oracles for n in tail), f"tail entries lack oracles: {tail}"
    assert not set(qs) & set(extra)


# r17 (r16 VERDICT #3 — driver pytest over budget): the ~100-query
# extras oracle sweep is ~10 minutes of the default run and is exactly
# the comparison tools/check_correctness.py records over the FULL
# registry (window + extras, same sf0.01 scale, same normalize) as the
# round's committed artifact — so the per-query sweep moves to the
# `slow` tier (`pytest -m slow`, run and recorded each round), and the
# default tier keeps a cross-family smoke at the same scale.
_EXTRA_SMOKE = (
    "v15_knn_dot", "j7_range_count_join", "t2_contains_stemmed_ru",
    "smp5h_temperature_mixture_hash", "src2_fvecs_roundtrip",
    "w6_stream_quality_admission", "d6_dup_clusters",
)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(entry_mod.extra_queries()))
def test_extra_query_matches_oracle(name, spark, sf_dir, oracle_con):
    fn = entry_mod.extra_queries()[name]
    got = _normalize(fn(spark, sf_dir).toPandas())
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        # no-oracle-by-design (approximate path): rows-only check, the
        # same weaker gate the driver records
        assert len(got) > 0
        return
    exp = _normalize(oracle_con.execute(sql).fetchdf())
    assert len(got) == len(exp), f"{name}: rowcount {len(got)} != {len(exp)}"
    assert list(got.columns) == list(exp.columns)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("name", _EXTRA_SMOKE)
def test_extra_query_smoke_matches_oracle(name, spark, sf_dir, oracle_con):
    """Default-tier sentinel: one extras query per operator family
    group (distance, temporal join, stemming, sampling, offline
    source, streaming admission, dedup graph) against its oracle at
    the full sf_dir scale — catches a broken shared operator without
    paying for the whole sweep."""
    test_extra_query_matches_oracle(name, spark, sf_dir, oracle_con)
