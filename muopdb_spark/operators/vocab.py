"""Corpus vocabulary building — step 1 of tokenizer training
(BPE/WordPiece/unigram-LM, Sennrich et al. 2016 arXiv:1508.07909): the
corpus-wide token frequency table and the adjacent-pair frequency table
the first merge round consumes. At 100 TB this is the canonical
map-side-combine workload: the explode emits one row per token
occurrence, but partial aggregation collapses each partition to its
DISTINCT tokens before the shuffle, so the exchange moves vocabulary-
sized partials (~1e5-1e7 rows/partition), not the corpus token stream.
With a vocab budget (``top_k``) the head is cut with orderBy + limit —
TakeOrderedAndProject, per-partition heaps, no full sort — and only
the k surviving rows are ranked (a k-row single-partition window).
Without a budget the rank window runs over the whole vocabulary table:
post-aggregation rows, never the corpus stream, but still one
partition — pass top_k for the production path.

Determinism: ties rank lexicographically (count DESC, token ASC), so
the table is stable across partitionings and engines — required for a
reproducible tokenizer artifact and for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from muopdb_spark.functions.text import simple_tokens

__all__ = ["token_vocab", "pair_vocab"]


def token_vocab(
    df: DataFrame,
    *,
    text_col: str = "text",
    top_k: int | None = None,
    min_count: int = 1,
) -> DataFrame:
    """(token, count, rank): corpus-wide token frequencies, ranked by
    (count DESC, token ASC). ``top_k`` keeps the head of the table
    (tokenizer vocab budget); ``min_count`` drops the hapax tail
    BEFORE ranking (the standard vocab-truncation rule)."""
    counts = (
        df.select(F.explode(simple_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("count"))
        .filter(F.col("count") >= int(min_count))
    )
    order = [F.desc("count"), F.asc("token")]
    if top_k is not None:
        counts = counts.orderBy(*order).limit(int(top_k))
    return counts.select(
        "token",
        "count",
        F.row_number().over(Window.orderBy(*order)).cast("long").alias("rank"),
    )


def pair_vocab(
    df: DataFrame,
    *,
    text_col: str = "text",
    top_k: int | None = None,
    min_count: int = 1,
) -> DataFrame:
    """(left, right, count, rank): adjacent-token pair frequencies —
    what a BPE merge round maximizes over. Pairs are built with
    zip_with over the shifted token array (pure JVM, no shuffle until
    the vocabulary-sized aggregate)."""
    toks = simple_tokens(text_col)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    counts = (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .groupBy("left", "right")
        .agg(F.count("*").cast("long").alias("count"))
        .filter(F.col("count") >= int(min_count))
    )
    order = [F.desc("count"), F.asc("left"), F.asc("right")]
    if top_k is not None:
        counts = counts.orderBy(*order).limit(int(top_k))
    return counts.select(
        "left",
        "right",
        "count",
        F.row_number().over(Window.orderBy(*order)).cast("long").alias("rank"),
    )
