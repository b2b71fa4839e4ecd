"""Exact-substring deduplication (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better", arXiv:2107.06499): find
every token that lies inside a substring of >= k tokens occurring more
than once ANYWHERE in the corpus (across documents or repeated within
one), and optionally remove those spans.

The paper builds a corpus-wide suffix array on one large machine; the
standard distributed re-expression (used here) slides a k-token window
over every document and hashes each window. The two criteria are
EXACTLY equivalent at the token level:

  token t is inside some duplicated substring of length >= k
    <=>  t is covered by some duplicated k-gram window

(←: a duplicated k-gram IS a duplicated substring of length k covering
its tokens; →: any k-token window of a duplicated substring S with
|S| >= k that contains t is itself duplicated.) So modulo md5
collisions this computes the same duplicated-token set as the suffix
array, as ordinary DataFrame ops.

Plan shape / 100 TB notes:
  - one projection explodes (id, pos, gh) — one row per token, the
    irreducible payload of the formulation; gh is unhex(md5) BINARY(16)
    (half the shuffle bytes of the hex string; 128 bits so no birthday
    collisions at trillions of grams, unlike a 64-bit hash)
  - duplicated grams = groupBy(gh) with map-side partial aggregation
    (duplicate-heavy partitions collapse before the shuffle), then an
    inner join back on gh — AQE broadcasts the count table when the
    duplicated-gram set is small, and the join key is the hash itself
    so skew needs one gram repeated ~billions of times (a degenerate
    corpus; AQE skew-join splits it if so)
  - span merge is two windows partitioned BY DOCUMENT (gaps-and-islands
    over each doc's duplicated positions) — per-doc state, perfectly
    parallel, no hot key
  - span REMOVAL re-reads only documents that have islands (inner join
    on id) and filters the token array against the doc's own island
    list — O(n_tokens * n_islands) expression work per doc, no Python.

Contrast with passage_dedup_stats (operators/dedup.py:621): passages
are NON-overlapping fixed blocks (cheap, block-aligned); this operator
is the overlapping-window form that catches duplicated spans at ANY
offset, the semantics the paper showed actually matters for LMs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from muopdb_spark.functions.text import simple_tokens

__all__ = [
    "gram_positions",
    "duplicate_islands",
    "duplicate_span_stats",
    "remove_duplicate_spans",
    "remove_contaminated_spans",
    "contamination_gram_table",
]


def gram_positions(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """(id, pos, gh): one row per k-token sliding window. pos is the
    1-based token index of the window start; gh = unhex(md5(window
    joined by ' ')) — BINARY(16), engine-portable. Documents shorter
    than k tokens emit no rows."""
    toks = simple_tokens(text_col)
    staged = df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
    n = F.size("_toks")
    pos_arr = F.when(
        n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))
    ).otherwise(F.array().cast("array<int>"))
    return staged.select(
        "id", "_toks", F.explode(pos_arr).alias("pos")
    ).select(
        "id",
        "pos",
        F.unhex(
            F.md5(F.concat_ws(" ", F.slice(F.col("_toks"), F.col("pos"), k)))
        ).alias("gh"),
    )


def duplicate_islands(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    keep_first: bool = False,
) -> DataFrame:
    """(id, island, span_start, span_end, n_grams): maximal contiguous
    duplicated token runs per document. A position is duplicated when
    its k-gram hash occurs >= 2 times corpus-wide (across docs OR
    repeated within one); overlapping/adjacent windows merge.

    ``keep_first``: exclude each hash's globally-FIRST occurrence (by
    (doc_id, pos) order) from the duplicated set — the paper's removal
    semantics, which keeps one copy of duplicated content instead of
    deleting every copy (without it, two near-identical docs would
    BOTH be gutted). Plan cost: the first-occurrence rank needs the
    gram stream shuffled on gh (row_number per hash) instead of the
    profile path's partial-agg count + AQE-broadcast join-back — the
    price of an order-dependent definition; still one shuffle, no
    skew beyond a hash repeated ~billions of times."""
    grams = gram_positions(df, text_col=text_col, id_col=id_col, k=k)
    if keep_first:
        w_gh = Window.partitionBy("gh").orderBy("id", "pos")
        ranked = grams.withColumn(
            "rn", F.row_number().over(w_gh)
        ).withColumn("cnt", F.count("*").over(Window.partitionBy("gh")))
        dup_pos = ranked.filter(
            (F.col("cnt") >= 2) & (F.col("rn") >= 2)
        ).select("id", "pos")
    else:
        dup_hashes = grams.groupBy("gh").count().filter(F.col("count") >= 2)
        dup_pos = grams.join(dup_hashes.select("gh"), "gh").select("id", "pos")
    return _merge_positions_to_islands(dup_pos, k)


def _merge_positions_to_islands(dup_pos: DataFrame, k: int) -> DataFrame:
    """(id, pos) flagged window starts -> (id, island, span_start,
    span_end, n_grams) maximal merged token runs. The per-doc window is
    O(doc-windows), never corpus-wide."""
    w_doc = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max(F.col("pos") + F.lit(k - 1)).over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup_pos.withColumn(
        "new_span",
        F.when(
            prev_end.isNull() | (F.col("pos") > prev_end + 1), 1
        ).otherwise(0),
    ).withColumn("island", F.sum("new_span").over(w_doc))
    return flagged.groupBy("id", "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        F.count("*").cast("long").alias("n_grams"),
    )


def duplicate_span_stats(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Per-document exact-substring dedup stats: (id_col, n_tokens,
    n_dup_grams, n_dup_spans, dup_tokens, dup_frac) where dup_tokens is
    the size of the union of duplicated k-token windows — exactly the
    tokens inside some corpus-duplicated substring of length >= k.

    Plan note: rather than materializing islands (duplicate_islands +
    a groupBy(id, island) — an extra exchange), the union size is the
    sum of each position's MARGINAL contribution
    `min(k, (pos + k - 1) - max(prev_end, pos - 1))` under the same
    per-doc running-max window, and span count is the sum of new-span
    flags — so the whole rollup is one window + one groupBy(id) that
    REUSES the window's hash(id) partitioning (no second shuffle)."""
    grams = gram_positions(df, text_col=text_col, id_col=id_col, k=k)
    dup_hashes = grams.groupBy("gh").count().filter(F.col("count") >= 2)
    dup_pos = grams.join(dup_hashes.select("gh"), "gh").select("id", "pos")

    w_doc = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max(F.col("pos") + F.lit(k - 1)).over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    end = F.col("pos") + F.lit(k - 1)
    contrib = F.greatest(
        end - F.greatest(F.coalesce(prev_end, F.lit(0)), F.col("pos") - 1),
        F.lit(0),
    )
    new_span = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end + 1), 1
    ).otherwise(0)
    agg = (
        dup_pos.select(
            "id", contrib.alias("_contrib"), new_span.alias("_new")
        )
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_dup_grams"),
            F.sum("_new").cast("long").alias("n_dup_spans"),
            F.sum("_contrib").cast("long").alias("dup_tokens"),
        )
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(simple_tokens(text_col)).cast("long").alias("n_tokens"),
    )
    return (
        base.join(agg, "id", "left")
        .fillna(0, subset=["n_dup_grams", "n_dup_spans", "dup_tokens"])
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            "n_dup_grams",
            "n_dup_spans",
            "dup_tokens",
            F.round(
                F.col("dup_tokens") / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("dup_frac"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    keep_first: bool = True,
) -> DataFrame:
    """(id_col, text_clean, n_tokens, kept_tokens): the paper's removal
    step — drop every token covered by a duplicated >= k-token span,
    rejoin survivors with single spaces (token-stream semantics: the
    tokenizer already normalized case/punctuation). Documents with no
    duplicated span pass through with their full token stream.

    Default ``keep_first=True`` keeps each duplicated span's first
    occurrence (one copy of the content survives, like the reference
    suffix-array dedup); pass False to cut every occurrence."""
    islands = duplicate_islands(
        df, text_col=text_col, id_col=id_col, k=k, keep_first=keep_first
    )
    return _cut_spans(df, islands, text_col=text_col, id_col=id_col)


def _cut_spans(
    df: DataFrame, islands: DataFrame, *, text_col: str, id_col: str,
) -> DataFrame:
    """Drop every token covered by an island span; rejoin survivors
    with single spaces (token-stream semantics). Docs with no island
    pass through with their full token stream."""
    per_doc = islands.groupBy("id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    staged = df.select(
        F.col(id_col).alias("id"), simple_tokens(text_col).alias("_toks")
    ).join(per_doc, "id", "left")
    spans = F.coalesce(
        F.col("_spans"),
        F.array().cast("array<struct<span_start:int,span_end:int>>"),
    )
    kept = F.filter(
        F.col("_toks"),
        lambda t, i: ~F.exists(
            spans,
            lambda s: (i + 1 >= s["span_start"]) & (i + 1 <= s["span_end"]),
        ),
    )
    return staged.select(
        F.col("id").alias(id_col),
        F.concat_ws(" ", kept).alias("text_clean"),
        F.size("_toks").cast("long").alias("n_tokens"),
        F.size(kept).cast("long").alias("kept_tokens"),
    )


def remove_contaminated_spans(
    df: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """TOKEN-LEVEL decontamination — the surgical variant of
    operators/contamination's doc-level drop (the GPT-3 appendix-C /
    PaLM treatment: instead of discarding every training doc that
    overlaps an eval benchmark, cut ONLY the overlapping >= k-token
    windows and keep the rest of the document): a corpus token dies
    when it is covered by any k-token sliding window whose hash also
    occurs in the benchmark set; overlapping windows merge to maximal
    spans (the duplicate_islands rule) before cutting.

    Output: (id_col, text_clean, n_tokens, kept_tokens) for EVERY
    corpus doc — kept_tokens == n_tokens means untouched;
    kept_tokens == 0 means the doc was wholly benchmark material.

    Scale (100 TB corpus, MB-scale benchmark): the benchmark side
    collapses to a DISTINCT BINARY(16) gram-hash table (eval sets are
    tiny by construction) that BROADCASTS to the contamination probe —
    the corpus gram stream is filtered map-side and only the HIT
    positions (benchmark-bounded, not corpus-bounded) reach the
    per-doc island window. No corpus shuffle anywhere: probe is a
    broadcast hash join, island merge windows over hit docs only, and
    the cut is the same single left join + higher-order filter as
    remove_duplicate_spans."""
    bg = gram_positions(
        benchmark, text_col=bench_text_col, id_col=bench_id_col, k=k
    ).select("gh").distinct()
    grams = gram_positions(df, text_col=text_col, id_col=id_col, k=k)
    hit = grams.join(F.broadcast(bg), "gh").select("id", "pos")
    islands = _merge_positions_to_islands(hit, k)
    return _cut_spans(df, islands, text_col=text_col, id_col=id_col)


def contamination_gram_table(
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Distinct BINARY(16) k-window hash table (gh) of an eval
    benchmark — the durable broadcast-sized artifact the
    decontamination probe (remove_contaminated_spans, and the
    streaming admission gate) joins against. Eval sets are MBs by
    construction; build once, persist, reuse per batch."""
    return gram_positions(
        benchmark, text_col=text_col, id_col=id_col, k=k
    ).select("gh").distinct()
