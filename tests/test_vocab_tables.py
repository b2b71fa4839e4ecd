"""vocab_tables (single-scan token+pair vocabulary) must be
bit-identical to the two-table token_vocab/pair_vocab composition it
trades off against (see the vocab.py docstring for when each wins)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from muopdb_spark.operators.vocab import pair_vocab, token_vocab, vocab_tables


def _two_table(docs, token_k, pair_k):
    t = token_vocab(docs, top_k=token_k).select(
        F.lit("token").alias("kind"),
        F.col("token").alias("term"),
        "count",
        "rank",
    )
    p = pair_vocab(docs, top_k=pair_k).select(
        F.lit("pair").alias("kind"),
        F.concat_ws(" ", "left", "right").alias("term"),
        "count",
        "rank",
    )
    return t.unionByName(p)


def _docs(spark):
    rows = [
        (i, f"alpha beta gamma doc{i % 7} beta alpha beta {'x ' * (i % 5)}end")
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_equal_to_two_table_form(spark):
    docs = _docs(spark)
    for tk, pk in ((150, 50), (5, 3), (None, None)):
        a = sorted(
            tuple(r)
            for r in _two_table(docs, tk, pk).collect()
        )
        b = sorted(
            tuple(r)
            for r in vocab_tables(
                docs, token_top_k=tk, pair_top_k=pk
            ).collect()
        )
        assert a == b, f"mismatch at top_k=({tk},{pk})"


def test_min_count(spark):
    docs = _docs(spark)
    out = vocab_tables(docs, token_top_k=10, pair_top_k=10, min_count=200)
    assert all(r["count"] >= 200 for r in out.collect())


def test_single_scan_plan(spark):
    docs = _docs(spark)
    plan = (
        vocab_tables(docs, token_top_k=150, pair_top_k=50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one source, no per-kind corpus-wide window (the salted lane
    # window partitions by (kind, salt); the final window runs over
    # <= buckets*k survivors)
    assert len(re.findall(r"Scan ExistingRDD|FileScan", plan)) == 1
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
