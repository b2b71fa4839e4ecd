"""Per-source dataset hygiene report — the "dataset card" rollup a
curation pipeline publishes alongside the data (FineWeb/Dolma-style
per-source accounting: how big, how duplicated, how clean, how
contaminated each source is). One row per source:

  source, n_docs, total_tokens, mean_tokens, mean_quality,
  exact_dup_rate, [top_lang, n_langs,] [contaminated_rate]

Determinism/oracle-ability: every rate is an integer count divided
ONCE (IEEE double, both engines bit-identical); mean_quality
accumulates the per-doc 6-decimal quality as exact integer
MICRO-quality (q * 1e6 is integral after quality_features' round-6) so
the sum is order-independent — the smp8 decimal treatment applied to a
report. top_lang resolves ties deterministically: highest count, then
lexicographically smallest language.

Scale (100 TB): the per-doc features (tokens, quality) are map-side;
exact-dup needs the fingerprint shuffle it always needs (BINARY-width
keys, partial-agg combined); contamination probes a broadcast
benchmark gram table; the final rollup is one source-cardinality
aggregate. Nothing corpus-sized crosses the wire twice.

Beyond-reference operator (BASELINE.json north star: corpus hygiene).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def source_report(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    lang_col: str | None = None,
    bench_grams: DataFrame | None = None,
    n: int = 3,
    contamination_threshold: float = 0.2,
) -> DataFrame:
    """Build the per-source report. ``bench_grams``: a distinct `gram`
    table (contamination.benchmark_grams output) switches on the
    contaminated_rate column; ``lang_col`` switches on top_lang +
    n_langs.

    PRECONDITION (ADVICE r16, documented): ``id_col`` must be
    NON-NULL and UNIQUE per row. The language rollup reads the bare
    (source, lang) projection while the other rates read the
    quality/dedup join of the same table — identical multisets only
    when the inner joins on ``id_col`` are exactly row-preserving,
    i.e. no NULL ids (dropped by the joins, kept by the projection)
    and no duplicate ids (multiplied by the joins). Every curation
    source in this repo satisfies it (doc_id is the primary key);
    pre-filter/dedup upstream if yours does not."""
    from muopdb_spark.operators.contamination import (
        contamination_report_vs_grams,
    )
    from muopdb_spark.operators.dedup import exact_dedup
    from muopdb_spark.operators.textstats import quality_features

    keep = [id_col, source_col] + ([lang_col] if lang_col else [])
    base = docs.select(*keep)
    qf = quality_features(docs, text_col=text_col, id_col=id_col).select(
        id_col, "n_tokens",
        # exact micro-quality: quality is already round(·, 6), so
        # q * 1e6 is integral — round() only clears float residue
        F.round(F.col("quality") * 1e6).cast("long").alias("_q_micro"),
    )
    ed = exact_dedup(docs, text_col=text_col, id_col=id_col).select(
        id_col, "is_canonical",
    )
    per = base.join(qf, id_col).join(ed, id_col)
    if bench_grams is not None:
        cont = contamination_report_vs_grams(
            docs, bench_grams, text_col=text_col, id_col=id_col,
            n=n, threshold=contamination_threshold,
        ).select(id_col, "is_contaminated")
        per = per.join(cont, id_col, "left").withColumn(
            "is_contaminated",
            F.coalesce(F.col("is_contaminated"), F.lit(False)),
        )

    n_docs = F.count("*").cast("long")
    aggs = [
        n_docs.alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(
            F.sum("n_tokens").cast("double") / n_docs, 6
        ).alias("mean_tokens"),
        F.round(
            (F.sum("_q_micro").cast("double") / F.lit(1e6)) / n_docs, 6
        ).alias("mean_quality"),
        F.round(
            F.sum(F.when(F.col("is_canonical"), 0).otherwise(1))
            .cast("double") / n_docs, 6
        ).alias("exact_dup_rate"),
    ]
    if bench_grams is not None:
        aggs.append(
            F.round(
                F.sum(F.when(F.col("is_contaminated"), 1).otherwise(0))
                .cast("double") / n_docs, 6
            ).alias("contaminated_rate")
        )
    out = per.groupBy(source_col).agg(*aggs)

    if lang_col:
        # language stats need only (source, lang) — read them off the
        # bare projection, not `per`: a second consumer of `per` would
        # plan the whole quality/dedup/contamination join subtree
        # TWICE (guide §2.4), and every joined side is row-preserving
        # (qf/ed are per-doc projections/windows, cont is a left
        # join), so base and per carry the same (source, lang)
        # multiset (r16).
        lc = base.groupBy(source_col, lang_col).agg(
            F.count("*").cast("long").alias("_cnt")
        )
        w = Window.partitionBy(source_col).orderBy(
            F.col("_cnt").desc(), F.col(lang_col).asc()
        )
        top = lc.withColumn("_rn", F.row_number().over(w))
        langs = top.groupBy(source_col).agg(
            F.max(F.when(F.col("_rn") == 1, F.col(lang_col)))
            .alias("top_lang"),
            F.count("*").cast("long").alias("n_langs"),
        )
        out = out.join(langs, source_col)
    return out
