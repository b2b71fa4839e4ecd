"""Train/test contamination detection for training-data pipelines.

Benchmark (eval-set) leakage into a training corpus is detected by
n-gram overlap: a corpus document is contaminated when a meaningful
fraction of its word n-grams also appear in any benchmark document.
This is the standard decontamination pass run before LLM pretraining
(n-gram collision against held-out eval sets).

Beyond-reference operator (BASELINE.json north star: the reference is a
vector store; its corpus-hygiene counterpart is this module plus
operators/dedup.py).

Scale notes (100 TB corpus, ~10^5-doc benchmark):
  - The benchmark side is tiny by construction (eval sets are MBs) —
    its distinct-gram table is broadcast, so the corpus side never
    shuffles documents or grams: explode is map-side, the gram join is
    a broadcast hash join, and the per-doc rollup ships only
    (doc_id, count) partials thanks to partial aggregation.
  - Gram strings can be md5/xxhash64-hashed to fixed width before the
    broadcast if benchmark vocab is large; the join key never leaves
    the map side either way.
  - Shingling reuses dedup.shingle_df (Arrow-batched, one tokenizer
    pass per row — see its docstring for why it beats the built-in
    higher-order-function expression under InferFiltersFromGenerate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from muopdb_spark.operators.dedup import shingle_df


def benchmark_grams(
    benchmark: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Distinct n-gram table (gram) of the benchmark set. Small enough
    to broadcast; build once, reuse across corpus partitions."""
    sh = shingle_df(benchmark, text_col=text_col, id_col=id_col, n=n)
    return sh.select(F.explode("sh").alias("gram")).distinct()


def contamination_report_split(
    df: DataFrame,
    bench_pred,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """contamination_report when benchmark and corpus are slices of ONE
    table (`bench_pred` over the id column picks the benchmark rows):
    shingles the table once — a single Arrow pass, materialized with a
    lineage-truncating localCheckpoint so the bench/corpus branches
    neither re-tokenize nor race a recomputable cache (measured 2x at
    sf0.1; see the d2 A/B in dedup.py) — instead of once per side."""
    sh = shingle_df(df, text_col=text_col, id_col=id_col, n=n) \
        .localCheckpoint(eager=True)
    bench = sh.filter(bench_pred).select(F.explode("sh").alias("gram")).distinct()
    corpus_sh = sh.filter(~bench_pred)
    return _report(corpus_sh, bench, id_col=id_col, threshold=threshold)


def _report(
    corpus_sh: DataFrame, bench_grams: DataFrame, *, id_col: str, threshold: float,
) -> DataFrame:
    # ONE aggregate, ZERO corpus-side shuffle joins: explode the grams
    # (explode_outer keeps gram-less docs), LEFT-broadcast-join the
    # benchmark set as a hit marker, and roll both counts up in the
    # same groupBy(id). An earlier shape computed n_contaminated in a
    # separate inner-join aggregate and re-joined it to the per-doc
    # gram counts on id — a corpus-sized SortMergeJoin that exists only
    # to reunite two aggregates of the same rows (and the hits side is
    # corpus-bounded, so broadcasting it instead would not survive
    # 100 TB). shingles are DISTINCT per doc, so count(gram) == |sh|.
    marked = (
        corpus_sh.select("id", F.explode_outer("sh").alias("gram"))
        .join(
            F.broadcast(bench_grams.withColumn("_hit", F.lit(1))),
            "gram", "left",
        )
        .groupBy("id")
        .agg(
            F.count("gram").cast("int").alias("n_grams"),
            F.count("_hit").cast("long").alias("n_contaminated"),
        )
    )
    frac = F.when(
        F.col("n_grams") > 0,
        F.col("n_contaminated").cast("double") / F.col("n_grams"),
    ).otherwise(F.lit(0.0))
    return (
        marked
        .withColumn("contamination", F.round(frac, 6))
        .withColumn("is_contaminated", F.col("contamination") >= F.lit(threshold))
        .withColumnRenamed("id", id_col)
    )


def contamination_report_vs_grams(
    corpus: DataFrame,
    bench_grams: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """contamination_report SERVED from a precomputed benchmark gram
    set (one `gram` column — benchmark_grams output, persisted once):
    benchmarks are static in production, so decontaminating each new
    corpus batch should never re-shingle the benchmark. Same verdict
    columns and semantics as contamination_report."""
    sh = shingle_df(corpus, text_col=text_col, id_col=id_col, n=n)
    return _report(sh, bench_grams, id_col=id_col, threshold=threshold)


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Per-corpus-doc contamination against a benchmark set.

    Returns (id_col, n_grams, n_contaminated, contamination,
    is_contaminated):
      - n_grams         distinct word n-grams in the document
      - n_contaminated  how many of those also occur anywhere in the
                        benchmark set
      - contamination   n_contaminated / n_grams (0.0 for docs too
                        short to shingle)
      - is_contaminated contamination >= threshold

    Docs with zero overlap (and docs shorter than n tokens) are kept —
    a decontamination pass needs the full verdict list, not only hits.
    """
    bench = benchmark_grams(benchmark, text_col=text_col, id_col=id_col, n=n)
    sh = shingle_df(corpus, text_col=text_col, id_col=id_col, n=n)
    return _report(sh, bench, id_col=id_col, threshold=threshold)
