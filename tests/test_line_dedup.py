"""Corpus-wide line-level keep-first dedup (operators/dedup.line_dedup,
the C4/FineWeb repeated-span rule at line granularity): hand-checkable
keep-first semantics across and within documents, short-line exemption,
reassembly order, and the aggregate-not-window plan shape."""

from __future__ import annotations

from muopdb_spark.operators.dedup import line_dedup


def _df(spark, *texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_keep_first_across_documents(spark):
    df = _df(
        spark,
        "alpha beta\ncookie banner text\ngamma",
        "cookie banner text\ndelta",
        "epsilon\ncookie banner text",
    )
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    # first occurrence (doc 0, line 1) survives; later copies dropped
    assert out[0]["text_clean"] == "alpha beta\ncookie banner text\ngamma"
    assert out[1]["text_clean"] == "delta"
    assert out[2]["text_clean"] == "epsilon"
    assert out[1]["n_lines"] == 2 and out[1]["kept_lines"] == 1
    assert out[2]["n_lines"] == 2 and out[2]["kept_lines"] == 1


def test_keep_first_within_document(spark):
    df = _df(spark, "x y z\nmid\nx y z")
    r = line_dedup(df).first()
    assert r["text_clean"] == "x y z\nmid"
    assert r["n_lines"] == 3 and r["kept_lines"] == 2


def test_fully_duplicate_doc_empties(spark):
    df = _df(spark, "seen once", "seen once")
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    assert out[0]["kept_lines"] == 1
    assert out[1]["kept_lines"] == 0 and out[1]["text_clean"] == ""


def test_short_lines_exempt(spark):
    # empty lines (and anything under min_chars) are kept verbatim in
    # EVERY doc, never collapsed to one global copy
    df = _df(spark, "a1\n\nb1", "a2\n\nb2")
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    assert out[0]["text_clean"] == "a1\n\nb1"
    assert out[1]["text_clean"] == "a2\n\nb2"
    longer = line_dedup(df, min_chars=3).collect()
    # with min_chars=3 the 2-char lines are exempt too
    assert all(r["kept_lines"] == r["n_lines"] for r in longer)


def test_reassembly_preserves_order(spark):
    df = _df(spark, "\n".join(f"line number {i} unique" for i in range(20)))
    r = line_dedup(df).first()
    assert r["text_clean"] == "\n".join(
        f"line number {i} unique" for i in range(20)
    )


def test_plan_uses_partial_aggregate_not_window(spark, sf_dir):
    """First-occurrence must be a hash aggregate (map-side combine
    collapses duplicate lines before the shuffle), not a window sort
    of the corpus line stream."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        line_dedup(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    head = plan.split("collect_list")[0]  # the winners side
    assert "HashAggregate" in head
    assert "Window" not in head
