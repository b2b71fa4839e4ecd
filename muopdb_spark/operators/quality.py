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
  - Every signal is a function of ONE document, so the whole report is
    a single Arrow-batched map pass — no shuffle, no cross-row state,
    each task's memory bounded by one batch of documents. (An earlier
    revision counted grams via explode + groupBy(doc, gram); that
    shape shuffles every gram occurrence of the corpus twice and was
    3x slower at sf0.1 — per-doc aggregation never belongs in a
    distributed groupBy.)
  - Tokenization happens once per row and all three gram sizes reuse
    the token list (dedup.shingle_df rationale).
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_RX = re.compile(r"[^a-z0-9]+")


def _doc_stats(text: str | None, top_n: int, dup_n: int) -> tuple:
    toks = [w for w in _TOKEN_RX.split(text.lower() if text else "") if w]
    n_tokens = len(toks)
    n_distinct = len(set(toks))
    distinct_ratio = round(n_distinct / n_tokens, 6) if n_tokens else 0.0

    top_gram, top_frac = None, 0.0
    if n_tokens >= top_n:
        grams = [" ".join(toks[i : i + top_n]) for i in range(n_tokens - top_n + 1)]
        counts = Counter(grams)
        # deterministic tie-break: count desc, gram asc
        top_gram, c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        top_frac = round(c / len(grams), 6)

    dup_frac = 0.0
    if n_tokens >= dup_n:
        grams = [" ".join(toks[i : i + dup_n]) for i in range(n_tokens - dup_n + 1)]
        counts = Counter(grams)
        dup = sum(c for c in counts.values() if c > 1)
        dup_frac = round(dup / len(grams), 6)

    return n_tokens, n_distinct, distinct_ratio, top_gram, top_frac, dup_frac


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
    schema = (
        "id long, n_tokens long, n_distinct_tokens long, "
        "distinct_ratio double, top_gram string, top_gram_frac double, "
        "dup_gram_frac double"
    )

    def gen(batches):
        for pdf in batches:
            rows = [
                (int(i), *_doc_stats(t, top_n, dup_n))
                for i, t in zip(pdf["id"], pdf["txt"])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "n_tokens", "n_distinct_tokens", "distinct_ratio",
                    "top_gram", "top_gram_frac", "dup_gram_frac",
                ],
            )

    slim = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("txt"))
    out = slim.mapInPandas(gen, schema=schema)
    return out.withColumnRenamed("id", id_col)


def gopher_quality_flags(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
    min_words: int = 50, max_words: int = 100_000,
) -> DataFrame:
    """Gopher-rule quality flags (Rae et al. 2021, "Scaling Language
    Models", table A1 — the published pretraining-corpus filter), one
    row per document with every signal surfaced so downstream policy can
    threshold differently per source:

      n_words, mean_word_len, symbol_ratio (#/... per word),
      bullet_ratio / ellipsis_ratio (of lines), alpha_frac (words with
      at least one letter), stop_hits (of the canonical 8 stopwords),
      passes (the conjunction at the published thresholds).

    Entirely JVM-side Catalyst expressions — split/filter/aggregate
    over arrays, zero Python in the plan, so the pass is map-side only
    and whole-stage-codegen eligible at any scale."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    lines = F.split(text, r"\n")
    n_words = F.size(words).cast("long")
    sum_len = F.aggregate(
        F.transform(words, F.length), F.lit(0.0), lambda a, x: a + x
    )
    mean_wl = F.when(n_words > 0, sum_len / n_words).otherwise(F.lit(0.0))
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ell = (
        (F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))) / 3
        + (F.length(text) - F.length(F.replace(text, F.lit("…"), F.lit(""))))
    )
    symbol_ratio = F.when(
        n_words > 0, (n_hash + n_ell) / n_words
    ).otherwise(F.lit(0.0))
    n_lines = F.size(lines)
    bullet_ratio = F.when(n_lines > 0, F.size(
        F.filter(lines, lambda l: F.ltrim(l).rlike(r"^(•|-|\*)"))
    ) / n_lines).otherwise(F.lit(0.0))
    ellipsis_ratio = F.when(n_lines > 0, F.size(
        F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"))
    ) / n_lines).otherwise(F.lit(0.0))
    alpha_frac = F.when(n_words > 0, F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ) / n_words).otherwise(F.lit(0.0))
    stops = F.array(*[F.lit(s) for s in
                      ("the", "be", "to", "of", "and", "that", "have", "with")])
    stop_hits = F.size(
        F.array_intersect(F.array_distinct(F.transform(words, F.lower)), stops)
    ).cast("long")
    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_ratio, 6).alias("bullet_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_ratio"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
    )
    passes = (
        (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("bullet_ratio") <= 0.9)
        & (F.col("ellipsis_ratio") <= 0.3)
        & (F.col("alpha_frac") >= 0.8)
        & (F.col("stop_hits") >= 2)
    )
    return out.withColumn("passes", passes)


def c4_line_filter(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
    min_line_words: int = 5, min_kept_lines: int = 1,
) -> DataFrame:
    """C4-rule line-level cleaning (Raffel et al. 2020, JMLR — the
    published Common Crawl cleanup): keep only lines that end in
    terminal punctuation (. ! ? "), have >= min_line_words words, and
    are not policy boilerplate (javascript / cookie / lorem ipsum /
    '{' lines). Returns (id_col, clean_text, n_lines, n_kept, kept) —
    kept=false means the whole document fails (fewer than
    min_kept_lines surviving lines) and downstream should drop it.

    JVM-side only: split -> filter with array lambdas -> array_join.
    One map pass, no shuffle, no Python."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(text, r"\n")

    def keep(line):
        t = F.trim(line)
        lower = F.lower(t)
        return (
            t.rlike(r'[.!?"]$')
            & (F.size(F.filter(F.split(t, r"\s+"), lambda w: w != ""))
               >= min_line_words)
            & ~lower.contains("javascript")
            & ~lower.contains("cookie")
            & ~lower.contains("lorem ipsum")
            & ~t.contains("{")
        )

    kept_lines = F.filter(lines, keep)
    return df.select(
        F.col(id_col),
        F.array_join(kept_lines, "\n").alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept_lines).cast("long").alias("n_kept"),
        (F.size(kept_lines) >= min_kept_lines).alias("kept"),
    )


def wordlist_gate(
    df: DataFrame,
    words: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_frac: float = 0.0,
) -> DataFrame:
    """Blocklist/wordlist gate — the C4 "bad words" page filter
    (Raffel et al. 2020 drop any page containing a listed word; most
    production recipes soften it to a token-fraction threshold).
    Tokens are lowercased and stripped of leading/trailing
    non-alphanumerics before matching, so punctuation-adjacent
    occurrences still hit. Returns (id_col, n_tokens, n_blocked,
    blocked_frac, keep) for every document — keep = blocked_frac <=
    max_frac (the 0.0 default is the published any-hit drop).

    Scale: the list rides the plan as an array literal (blocklists
    are KBs), matching is pure higher-order-function expressions — one
    JVM map pass, no shuffle, no Python. The DuckDB oracle runs the
    identical normalize-then-member test.

    List entries are normalized exactly like tokens (lowercase, strip
    leading/trailing non-alphanumerics); an entry that cannot match
    any normalized token — empty after normalization, or a multi-word
    phrase (tokens never contain internal separators) — raises rather
    than silently never matching: this is a safety gate. `keep` is
    computed from the UNROUNDED fraction (blocked_frac is rounded for
    display only), so the any-hit rule cannot leak a blocked word in
    a document long enough for round-6 to collapse the fraction to
    zero. The gate is ASCII-word: an entry whose edge-normalization
    strips LETTERS or DIGITS (e.g. 'café' -> 'caf') raises instead of
    silently matching a broader token set than written."""
    import re as _re

    if not words:
        raise ValueError("words must be non-empty")
    norm_words = []
    for w in words:
        lw = w.lower()
        nw = _re.sub(r"^[^a-z0-9]+|[^a-z0-9]+$", "", lw)
        if not nw or _re.search(r"[^a-z0-9]", nw):
            raise ValueError(
                f"blocklist entry {w!r} cannot match any normalized "
                "token (empty after normalization, or multi-word — "
                "tokens never contain internal separators); split "
                "phrases into words or remove the entry"
            )
        # The edge-strip must only remove punctuation/symbols. If it
        # removes LETTERS or DIGITS (any non-ASCII alphanumeric, e.g.
        # 'café' -> 'caf'), the entry would silently match a BROADER
        # set of tokens than written — a safety gate must not widen
        # quietly. The gate is ASCII-word: pass the ASCII core
        # explicitly if that broadening is intended.
        head = lw[: lw.index(nw)]
        tail = lw[lw.index(nw) + len(nw):]
        if any(c.isalnum() for c in head + tail):
            raise ValueError(
                f"blocklist entry {w!r} normalizes to {nw!r}: the gate "
                "tokenizes to ASCII [a-z0-9] cores, so non-ASCII "
                "letters at the edges are stripped and the entry would "
                "match a broader token set than written; use the ASCII "
                f"core {nw!r} explicitly if that is intended"
            )
        norm_words.append(nw)
    wl = F.array(*[F.lit(w) for w in norm_words])
    toks = F.filter(
        F.transform(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                    r"\s+"),
            lambda t: F.regexp_replace(t, r"^[^a-z0-9]+|[^a-z0-9]+$", ""),
        ),
        lambda t: t != "",
    )
    n_tok = F.size(toks)
    n_blk = F.size(F.filter(toks, lambda t: F.array_contains(wl, t)))
    exact_frac = F.when(
        n_tok > 0, n_blk.cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        n_blk.cast("long").alias("n_blocked"),
        F.round(exact_frac, 6).alias("blocked_frac"),
        (exact_frac <= F.lit(max_frac)).alias("keep"),
    )


def quality_percentile_by_source(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    keep_frac: float = 0.7,
    approx: bool = False,
    approx_accuracy: int = 10000,
) -> DataFrame:
    """Per-SOURCE quality calibration: percentile-rank each document's
    composite quality score within its source and keep the top
    `keep_frac` of every source — the standard curation step (used by
    FineWeb/DCLM-style pipelines) that a single global threshold gets
    wrong: sources have different score distributions, so a global cut
    over-prunes low-scoring domains and under-prunes high-scoring ones.

    Two plans, same keep-set up to score-tie boundaries:

    - ``approx=False`` (the oracle-checkable reference semantics):
      cume_dist over ``Window.partitionBy(source)`` ordered by
      (quality DESC, id ASC); keep = pct_rank <= keep_frac. Exact, but
      the window shuffles the WHOLE corpus on the low-cardinality
      source key, so one dominant source is one hot partition — wrong
      shape at 100 TB.
    - ``approx=True`` (the scale path): two passes. Pass 1 computes a
      per-source quality threshold q_thr =
      approx_percentile(quality, 1-keep_frac) — a partial-aggregating
      t-digest-style sketch whose shuffle moves ONE sketch per
      (task, source), not the corpus. Pass 2 broadcast-joins the tiny
      threshold table and keeps quality >= q_thr map-side: no window,
      no corpus shuffle at all. Returns (id, source, quality, q_thr,
      keep). Divergence from the exact form is confined to documents
      whose quality ties the boundary score (the exact form breaks
      ties by id; a threshold cannot) plus sketch error bounded by
      1/approx_accuracy — equivalence pinned by
      tests/test_quality_graph.py::test_t11_approx_matches_exact.
    """
    from muopdb_spark.operators.textstats import quality_features

    feats = quality_features(df, text_col=text_col, id_col=id_col)
    joined = feats.select(id_col, "quality").join(
        df.select(id_col, source_col), id_col
    )
    if approx:
        thresholds = joined.groupBy(source_col).agg(
            F.percentile_approx(
                "quality", F.lit(1.0 - float(keep_frac)), F.lit(approx_accuracy)
            ).alias("q_thr")
        )
        return joined.join(F.broadcast(thresholds), source_col).select(
            id_col,
            source_col,
            "quality",
            F.round("q_thr", 6).alias("q_thr"),
            (F.col("quality") >= F.col("q_thr")).alias("keep"),
        )

    from pyspark.sql.window import Window

    w = Window.partitionBy(source_col).orderBy(
        F.desc("quality"), F.asc(id_col)
    )
    pct = F.cume_dist().over(w)
    return joined.select(
        id_col,
        source_col,
        "quality",
        F.round(pct, 6).alias("pct_rank"),
        (pct <= F.lit(float(keep_frac))).alias("keep"),
    )


def collapse_token_runs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_run: int = 3,
) -> DataFrame:
    """Degenerate-repetition TRIM: cap any run of consecutive identical
    whitespace tokens at `max_run` occurrences ("spam spam spam spam
    spam" -> "spam spam spam"). The removal-side complement of the
    Gopher/t5 repetition FLAGS: those drop or score whole documents,
    this rescues a document whose only sin is an elongated token run
    (degenerate generations, keyboard mashing, markup echoes).

    Pure Catalyst higher-order functions — split, one indexed filter
    whose predicate looks back `max_run` positions, re-join. Zero
    Python, zero shuffle, whole plan stays JVM-side; the oracle is the
    same expression in DuckDB's 1-based lambda dialect.

    Returns (id_col, text_clean, n_tokens, kept_tokens). Whitespace is
    canonicalized to single spaces by the split/join round trip (run
    operators/normalize.clean_text first if that matters — the curate
    ladder does)."""
    if max_run < 1:
        raise ValueError("max_run must be >= 1")
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    toks = F.filter(toks, lambda x: x != "")  # "" split artifact
    t = F.col("_toks")

    def keep(x, i):
        # drop x when the previous max_run tokens are ALL x
        cond = None
        for back in range(1, max_run + 1):
            c = t[i - back] == x
            cond = c if cond is None else (cond & c)
        return (i < max_run) | ~cond

    kept = F.filter(t, keep)
    return (
        df.select(F.col(id_col), toks.alias("_toks"))
        .select(
            id_col,
            F.concat_ws(" ", kept).alias("text_clean"),
            F.size(t).cast("long").alias("n_tokens"),
            F.size(kept).cast("long").alias("kept_tokens"),
        )
    )
