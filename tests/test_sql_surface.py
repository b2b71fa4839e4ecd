"""SQL surface: registered UDFs + distance SQL text must agree exactly
with the Column-API engine paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from muopdb_spark.sql import distance_sql, register_functions, register_tables


@pytest.fixture(scope="module", autouse=True)
def _registered(spark, sf_dir):
    register_functions(spark)
    register_tables(spark, sf_dir)


def test_sql_knn_matches_column_api(spark, sf_dir):
    from muopdb_spark.operators.knn import knn

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    lit = "array(" + ", ".join(f"{x}D" for x in qv) + ")"
    d = distance_sql("l2", "cast(embedding as array<double>)", lit)
    got = spark.sql(f"""
        SELECT vec_id, round({d}, 6) AS score
        FROM embeddings
        ORDER BY {d} ASC, vec_id ASC
        LIMIT 10
    """).collect()
    want = knn(emb, qv, 10, vector_col="embedding", id_col="vec_id",
               metric="l2", score_decimals=6).collect()
    assert [(r.vec_id, r.score) for r in got] == [(r.vec_id, r.score) for r in want]


@pytest.mark.parametrize("metric", ["l2", "l2_squared", "dot", "cosine"])
def test_distance_sql_equals_column_expr(spark, metric):
    from muopdb_spark.functions.distance import score_expr

    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 0.5, -1.0])],
        "a array<double>, b array<double>",
    )
    via_sql = df.selectExpr(f"{distance_sql(metric, 'a', 'b')} AS d").first()["d"]
    via_col = df.select(score_expr(metric, F.col("a"), F.col("b")).alias("d")).first()["d"]
    assert via_sql == pytest.approx(via_col, rel=1e-12)


def test_sql_stem_matches_engine(spark):
    rows = spark.sql("""
        SELECT mu_stem('corriendo', 'es') AS es,
               mu_stem('abbandonata', 'it') AS it,
               mu_stem('running', 'english') AS en,
               mu_stem_tokens('meninas bonitas', 'pt') AS pt_toks,
               mu_tokens('Hello, World! 42') AS toks
    """).first()
    from muopdb_spark.functions.snowball import italian_stem, spanish_stem
    from muopdb_spark.functions.text import stem_word

    assert rows.es == spanish_stem("corriendo")
    assert rows.it == italian_stem("abbandonata")
    assert rows.en == stem_word("running", "english")
    assert rows.pt_toks == ["menin", "bonit"]
    assert rows.toks == ["hello", "world", "42"]


def test_sql_fingerprint_matches_engine(spark, sf_dir):
    from muopdb_spark.operators.dedup import fingerprint

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    docs.createOrReplaceTempView("_fp_docs")
    via_sql = {r.doc_id: r.fp for r in spark.sql(
        "SELECT doc_id, mu_fingerprint(text) AS fp FROM _fp_docs").collect()}
    via_col = {r.doc_id: r.fp for r in docs.select(
        "doc_id", fingerprint("text").alias("fp")).collect()}
    assert via_sql == via_col


def test_sql_id_hex(spark):
    row = spark.sql("SELECT mu_id_hex(1, 255) AS h").first()
    assert row.h == "0" * 15 + "1" + "0" * 14 + "ff"
