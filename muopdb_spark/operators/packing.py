"""Sequence packing: fill fixed-token-budget training sequences with
documents — the step that turns a curated corpus into model-ready
samples. Two strategies with different determinism/efficiency
trade-offs:

  - `pack_sequences` (default): contiguous token-stream chunking.
    Documents are laid end-to-end in deterministic (group, id) order
    and sequences are fixed windows over that stream; a document is
    assigned to the sequence its first token lands in (it may straddle
    the boundary, as concat-then-chunk pretraining pipelines do). One
    window function — a single shuffle on the group key — and exactly
    SQL-expressible, so it is oracle-checked end to end.
  - `pack_sequences_greedy`: first-fit-in-order bin packing that never
    splits a document across sequences (sample-isolation packing, for
    SFT-style data). Needs per-group sequential state, so it runs as
    grouped applyInPandas (Arrow-batched); invariants are pytest-gated
    (no sequence over budget unless a single document alone exceeds
    it, order preserved, offsets consistent).

Scale notes (100 TB):
  - Both strategies shuffle once, on the group key (e.g. language or
    domain). Groups are coarse; within a group the window/pandas pass
    is linear. For a skewed mega-group, pre-split by a salt column
    that is itself part of the deterministic order.
  - The greedy variant holds one group partition in memory per task —
    bound group size via the salt pre-split, not executor memory.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    *,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    group_col: str | None = None,
    budget: int = 2048,
) -> DataFrame:
    """Contiguous-stream chunk assignment (see module docstring).

    Returns the input id/group/token columns plus:
      - seq_id      which fixed-size sequence the doc starts in
      - seq_offset  token offset of the doc within that sequence
    """
    keys = [group_col] if group_col else []
    w = Window.partitionBy(*[F.col(k) for k in keys] or [F.lit(0)]).orderBy(id_col)
    start = (F.sum(token_col).over(w) - F.col(token_col)).cast("long")
    cols = [id_col, *keys, token_col]
    return df.select(
        *cols,
        F.floor(start / budget).alias("seq_id"),
        (start % budget).alias("seq_offset"),
    )


def pack_sequences_greedy(
    df: DataFrame,
    *,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    group_col: str | None = None,
    budget: int = 2048,
) -> DataFrame:
    """First-fit-in-order packing that never splits a document.

    Within each group (docs ordered by id), a document opens a new
    sequence when appending it would exceed `budget` — unless the
    sequence is empty, in which case an oversized document occupies a
    sequence alone. seq_id restarts at 0 per group.
    """
    keys = [group_col] if group_col else []
    slim = df.select(id_col, *keys, token_col)
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in slim.schema.fields
    ) + ", seq_id long, seq_offset long"

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        seq_ids, offsets = [], []
        seq, used = 0, 0
        for t in pdf[token_col]:
            t = int(t)
            if used > 0 and used + t > budget:
                seq, used = seq + 1, 0
            seq_ids.append(seq)
            offsets.append(used)
            used += t
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        pdf["seq_offset"] = pd.Series(offsets, dtype="int64")
        return pdf

    grouped = slim.groupBy(*keys) if keys else slim.groupBy(F.lit(0).alias("_g"))
    out = grouped.applyInPandas(_pack, schema=schema)
    return out.select(id_col, *keys, token_col, "seq_id", "seq_offset")


def pack_sequences_ffd(
    df: DataFrame,
    *,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    group_col: str | None = None,
    budget: int = 2048,
) -> DataFrame:
    """First-Fit-DECREASING packing that never splits a document — the
    padding-efficiency upgrade over pack_sequences_greedy's first-fit-
    in-order: place docs largest-first into the first open sequence
    with room (classic FFD, guaranteed <= 11/9·OPT + 6/9 bins), so
    small docs backfill the holes large docs leave. Deterministic:
    docs sort by (tokens DESC, id ASC); an oversized doc (> budget)
    occupies a sequence alone.

    Scale: per-GROUP Pandas pass (applyInPandas), like the greedy
    packer — the group (a language, a shard) must fit one task, which
    is how training pipelines shard packing anyway; the contiguous
    pack_sequences is the unbounded-stream scale path when doc order
    may be fixed. FFD's open-bin scan is O(n·bins) worst case; with a
    token budget of thousands the bin list stays ~sum(t)/budget.
    """
    keys = [group_col] if group_col else []
    slim = df.select(id_col, *keys, token_col)
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in slim.schema.fields
    ) + ", seq_id long, seq_offset long"

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [token_col, id_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        bins: list[int] = []
        seq_ids, offsets = [], []
        for t in pdf[token_col]:
            t = int(t)
            for i, used in enumerate(bins):
                if used + t <= budget:
                    seq_ids.append(i)
                    offsets.append(used)
                    bins[i] = used + t
                    break
            else:
                seq_ids.append(len(bins))
                offsets.append(0)
                bins.append(t)
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        pdf["seq_offset"] = pd.Series(offsets, dtype="int64")
        return pdf

    grouped = slim.groupBy(*keys) if keys else slim.groupBy(F.lit(0).alias("_g"))
    out = grouped.applyInPandas(_pack, schema=schema)
    return out.select(id_col, *keys, token_col, "seq_id", "seq_offset")


def sequence_stats(packed: DataFrame, *, group_col: str | None = None,
                   token_col: str = "n_tokens") -> DataFrame:
    """Per-sequence fill report: (group?, seq_id, n_docs, sum_tokens)."""
    keys: Iterable[str] = ([group_col] if group_col else []) + ["seq_id"]
    return packed.groupBy(*keys).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_col).cast("long").alias("sum_tokens"),
    )


def chunk_documents(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Overlapping token-window chunks — the RAG/retrieval-training
    export shape (each chunk is an indexable passage; `overlap` keeps
    boundary context retrievable from both sides).

    (id_col, chunk_idx, chunk_text, n_tokens): windows of `size`
    tokens at stride `size - overlap` over the lowercase-alnum token
    stream; the final window is the remainder (>= 1 token). A doc with
    no tokens emits nothing.

    Map-side only: tokenize -> posexplode over window starts -> slice
    + rejoin, all Catalyst expressions; the token array is STAGED as a
    column first so the generate's synthesized predicate re-evaluates
    only an attribute, not the tokenizer (the shingle_df pushdown
    lesson — a split() is cheap enough that staging suffices here).
    """
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    staged = df.select(
        id_col,
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
        ).alias("_toks"),
    )
    toks = F.col("_toks")
    n = F.size(toks)
    # window starts: 0, stride, 2*stride, ... while start < n (with at
    # least one window for 1 <= n <= size); last window may be short
    n_windows = F.when(
        n <= size, F.lit(1)
    ).otherwise(F.ceil((n - F.lit(size)) / F.lit(stride)) + 1).cast("int")
    starts = F.when(n > 0, F.transform(
        F.sequence(F.lit(0), n_windows - 1), lambda i: i * stride
    )).otherwise(F.array().cast("array<int>"))
    exploded = staged.select(
        id_col, "_toks", F.posexplode(starts).alias("chunk_idx", "_start")
    )
    piece = F.slice(F.col("_toks"), F.col("_start") + 1, size)
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("long").alias("n_tokens"),
    )


# ------------------------------------------------------------------
# r15: FIM (fill-in-the-middle) transformation — Bavarian et al. 2022
# ("Efficient Training of Language Models to Fill in the Middle"):
# rewrite a fraction of documents as prefix/suffix/middle with
# sentinel tokens so an autoregressive model learns infilling. The
# standard pass for code-model data prep.

FIM_PRE = "<|fim_prefix|>"
FIM_SUF = "<|fim_suffix|>"
FIM_MID = "<|fim_middle|>"

# Knuth's multiplicative constants — engine-portable integer hashing
# (the same construction DuckDB replays verbatim, no engine hash
# functions involved)
_FIM_H1 = 2654435761
_FIM_H2 = 40503


def _fim_hash_mod(d, h: int, m):
    """pmod(pmod(d, m) * (h mod m), m) — the bounded form of
    (d * h) % m. Every intermediate stays below m**2 (< 2**62 for any
    string length), so BIGINT never overflows even for ids from
    monotonically_increasing_id (>= 2**33), and pmod keeps the result
    in [0, m) for negative ids where Spark's sign-preserving % would
    escape the documented 1..n-2 split range. Identical to the naive
    form whenever the naive form doesn't overflow."""
    return F.pmod(F.pmod(d, m) * F.pmod(F.lit(h), m), m)


def fim_transform(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    rate: float = 0.5,
    spm: bool = False,
) -> DataFrame:
    """(id, fim, text): deterministically rewrite ``rate`` of the
    corpus into FIM form. Selection and split points derive from pure
    integer arithmetic on the id (Knuth multiplicative hashes mod
    document length), so the pass is reproducible across runs AND
    SQL-expressible for the oracle:

      a = 1 + hash(id, H1) mod (n - 2)         (1 <= a <= n-2)
      b = a + 1 + hash(id, H2) mod (n - a - 1) (a < b <= n-1)

    where hash(id, H) mod m is computed in the overflow-safe bounded
    form pmod(pmod(id, m) * (H mod m), m) — see _fim_hash_mod — so
    ids past 2**33 (monotonically_increasing_id beyond partition 0)
    and negative ids both stay exact under ANSI mode.
      PSM: PRE + text[:a] + SUF + text[b:] + MID + text[a:b]
      SPM (spm=True): PRE + SUF + text[b:] + MID + text[:a] + text[a:b]

    Documents shorter than 3 characters or hashed outside ``rate``
    pass through unchanged with fim=false. Pure Column expressions —
    one map pass, zero Python, zero shuffle. At 100 TB this composes
    map-side with packing (p2) and shard export (p4)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"fim_transform: rate must be in [0,1], got {rate}")
    d = F.col(id_col).cast("long")
    t = F.col(text_col)
    n = F.length(t)
    pick = _fim_hash_mod(d, _FIM_H1, F.lit(1000)) \
        < F.lit(int(round(rate * 1000)))
    eligible = pick & (n >= 3)
    a = (F.lit(1) + _fim_hash_mod(d, _FIM_H1, n - 2)).cast("int")
    b = (a + 1 + _fim_hash_mod(d, _FIM_H2, n - a - 1)).cast("int")
    prefix = t.substr(F.lit(1), a)
    middle = t.substr(a + 1, b - a)
    suffix = t.substr(b + 1, n - b)
    psm = F.concat(
        F.lit(FIM_PRE), prefix, F.lit(FIM_SUF), suffix,
        F.lit(FIM_MID), middle,
    )
    spm_form = F.concat(
        F.lit(FIM_PRE), F.lit(FIM_SUF), suffix, F.lit(FIM_MID),
        prefix, middle,
    )
    out_text = F.when(eligible, spm_form if spm else psm).otherwise(t)
    return df.select(
        id_col,
        eligible.alias("fim"),
        out_text.alias(text_col),
    )
