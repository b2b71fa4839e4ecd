"""Repetition-based quality filtering — the Gopher/Dolma-style signals
that catch boilerplate, spam, and degenerate generations in a
pretraining corpus:

  - distinct-token ratio (low => the document repeats itself)
  - top n-gram occurrence fraction (one phrase dominating the doc)
  - duplicate n-gram fraction (how much of the doc is covered by
    n-grams that occur more than once)

The published rules are line/paragraph-based where documents have
lines; over single-line text the same signals are computed at the word
n-gram level, with deterministic tie-breaks (count desc, gram asc) so
results are exactly reproducible and oracle-checkable.

Scale notes (100 TB):
  - Token/n-gram generation is map-side (Arrow-batched shingling, one
    tokenizer pass per row — dedup.shingle_df rationale).
  - The per-(doc, gram) counts partially aggregate map-side; the only
    shuffles are on (doc_id, gram) and doc_id — no corpus-wide state,
    no skew (keys are per-document).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _gram_rows(df: DataFrame, *, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, gram) one row per n-gram OCCURRENCE (not distinct)."""
    import re

    rx = re.compile(r"[^a-z0-9]+")

    @F.pandas_udf("array<string>")
    def _grams(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = [w for w in rx.split(t.lower() if t is not None else "") if w]
            out.append(
                [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
                if len(toks) >= n else []
            )
        return pd.Series(out)

    return (
        df.select(F.col(id_col).alias("id"), _grams(F.col(text_col)).alias("gs"))
        .select("id", F.explode("gs").alias("gram"))
    )


def repetition_stats(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 3,
) -> DataFrame:
    """Per-document repetition report:
      (id_col, n_tokens, n_distinct_tokens, distinct_ratio,
       top_gram, top_gram_frac, dup_gram_frac)

    top_gram_frac: occurrences of the most frequent top_n-gram divided
    by total top_n-gram occurrences (ties: count desc, gram asc).
    dup_gram_frac: fraction of dup_n-gram occurrences whose gram occurs
    more than once in the document. Docs too short to form a gram get
    frac 0.0 and a null top_gram.
    """
    toks = _gram_rows(df, text_col=text_col, id_col=id_col, n=1)
    tok_stats = toks.groupBy("id").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("gram").alias("n_distinct_tokens"),
    ).withColumn(
        "distinct_ratio",
        F.round(F.col("n_distinct_tokens").cast("double") / F.col("n_tokens"), 6),
    )

    top = _gram_rows(df, text_col=text_col, id_col=id_col, n=top_n)
    top_counts = top.groupBy("id", "gram").agg(F.count("*").alias("c"))
    w = Window.partitionBy("id").orderBy(F.col("c").desc(), F.col("gram").asc())
    tot = Window.partitionBy("id")
    top_stats = (
        top_counts.withColumn("total", F.sum("c").over(tot))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "id",
            F.col("gram").alias("top_gram"),
            F.round(F.col("c").cast("double") / F.col("total"), 6).alias("top_gram_frac"),
        )
    )

    dup = _gram_rows(df, text_col=text_col, id_col=id_col, n=dup_n)
    dup_counts = dup.groupBy("id", "gram").agg(F.count("*").alias("c"))
    dup_stats = dup_counts.groupBy("id").agg(
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).cast("double")
            / F.sum("c"),
            6,
        ).alias("dup_gram_frac")
    )

    base = df.select(F.col(id_col).alias("id"))
    out = (
        base.join(tok_stats, "id", "left")
        .join(top_stats, "id", "left")
        .join(dup_stats, "id", "left")
        .fillna(0, subset=["n_tokens", "n_distinct_tokens"])
        .fillna(0.0, subset=["distinct_ratio", "top_gram_frac", "dup_gram_frac"])
    )
    return out.withColumnRenamed("id", id_col)
