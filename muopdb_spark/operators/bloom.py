"""Distributed Bloom-filter membership gate — the 100 TB pre-filter
for decontamination and corpus-membership checks.

The exact k-gram decontamination gate (operators/substring +
contamination.py, the c2 path) broadcasts the benchmark's DISTINCT
gram-hash table; that works while the protected set is
broadcast-sized. When the protected side is itself corpus-scale (a
whole prior training run, a licensing blocklist of documents), the
membership structure must stay DISTRIBUTED. A Bloom filter here is
not a driver-side blob: it is a ``(word_idx, bits)`` TABLE — position
p of the m-bit array lives at row p >> 6, bit p & 63 — built with one
distinct + one bit_or aggregate, stored as parquet like every other
durable artifact, and probed with a JOIN on word_idx (broadcast when
the filter is small, shuffle-on-word_idx when it is not; word_idx is
uniform by construction, so the join never skews).

Guarantees: NO FALSE NEGATIVES by construction (every inserted gram
sets all its bits), so `bloom_gate` is sound as a pre-filter — docs
with zero maybe-hits are PROVABLY clean and skip the exact check;
false positives only cost exact-check work on survivors, bounded by
the classic (1 - e^{-kn/m})^k rate. Hashes are the engine-portable
md5-prefix rule the DSIR/minhash oracles already use (seeded
``md5('<i>:' || gram)`` 32-bit prefixes), so DuckDB replays the whole
filter bit-for-bit — the bloom1 oracle checks the PROBE VERDICTS, not
just counts.

Reference parity note: the reference engine (hicder/muopdb) has no
membership-sketch operators; brief-driven (training-data pipeline
requirement) like dedup/contamination.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from muopdb_spark.functions.text import simple_tokens

__all__ = ["bloom_build", "bloom_probe", "bloom_gate"]


def _bit_mask(p: Column) -> Column:
    """1L << (p % 64) with a COLUMN shift count (the py API's
    shiftleft takes only a literal; same Catalyst ShiftLeft)."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
    )


def _positions(gram: Column, n_hashes: int, m_bits: int) -> list[Column]:
    """Seeded engine-portable bit positions of one gram: 32-bit md5
    prefix of '<i>:<gram>' mod m_bits (the DSIR bucket rule, seeded)."""
    return [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}:"), gram)), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % m_bits
        )
        for i in range(n_hashes)
    ]


def _grams(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """(id, gram): one row per k-token sliding window (string form —
    the positions hash seeds the md5 itself, so no pre-hash here)."""
    toks = simple_tokens(text_col)
    staged = df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
    n = F.size("_toks")
    pos_arr = F.when(
        n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))
    ).otherwise(F.array().cast("array<int>"))
    return staged.select(
        "id", F.explode(pos_arr).alias("_p"), "_toks"
    ).select(
        "id",
        F.concat_ws(
            " ", F.slice(F.col("_toks"), F.col("_p"), k)
        ).alias("gram"),
    )


def bloom_build(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """Build the filter table over every k-token gram of `df`:
    (word_idx long, bits long) with only NON-ZERO words materialized.
    One explode -> distinct positions -> bit_or aggregate; the result
    is a durable artifact (write it to parquet next to the corpus
    signatures). Sizing rule of thumb: m_bits ~ 10x the distinct gram
    count keeps the false-positive rate ~1% at n_hashes=4."""
    if k < 1 or n_hashes < 1 or m_bits < 64:
        raise ValueError(
            f"bloom_build: bad k={k} / n_hashes={n_hashes} /"
            f" m_bits={m_bits}"
        )
    grams = _grams(df, text_col, id_col, k).select("gram").distinct()
    pos = grams.select(
        F.explode(
            F.array(*_positions(F.col("gram"), n_hashes, m_bits))
        ).alias("p")
    ).distinct()
    return (
        pos.select(
            (F.col("p") / 64).cast("long").alias("word_idx"),
            _bit_mask(F.col("p")).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
    broadcast_filter: bool = True,
) -> DataFrame:
    """(doc_id, n_grams, n_maybe): per document, the DISTINCT k-gram
    count and how many of those grams have ALL their bits set in the
    filter (membership 'maybe'; zero maybe-hits is a PROVABLY clean
    doc).
    Plan: gram explode -> per-hash (word_idx, mask) -> join the filter
    table -> a gram is a maybe iff all n_hashes probes found their
    bit -> per-doc rollup. The filter side broadcasts by default; set
    broadcast_filter=False for corpus-scale filters (equi-join on the
    uniform word_idx — no skew)."""
    if k < 1 or n_hashes < 1 or m_bits < 64:
        raise ValueError(
            f"bloom_probe: bad k={k} / n_hashes={n_hashes} /"
            f" m_bits={m_bits}"
        )
    grams = _grams(df, text_col, id_col, k)
    probes = grams.select(
        "id",
        "gram",
        F.posexplode(
            F.array(*_positions(F.col("gram"), n_hashes, m_bits))
        ).alias("hash_i", "p"),
    ).select(
        "id",
        "gram",
        "hash_i",
        (F.col("p") / 64).cast("long").alias("word_idx"),
        _bit_mask(F.col("p")).alias("mask"),
    )
    side = bloom.select("word_idx", "bits")
    if broadcast_filter:
        side = F.broadcast(side)
    hit = probes.join(side, "word_idx", "left").withColumn(
        "_set",
        F.when(
            F.col("bits").isNotNull()
            & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    # the filter join is 1:1 (word_idx unique in the table), so each
    # (id, gram occurrence, hash_i) stays one row, and every
    # occurrence of the same gram yields IDENTICAL set-flags — a gram
    # is a maybe iff every one of its rows found its bit
    per_gram = hit.groupBy("id", "gram").agg(
        (F.sum("_set") == F.count("*")).cast("int").alias("maybe")
    )
    return per_gram.groupBy("id").agg(
        F.count("*").cast("long").alias("n_grams"),
        F.sum("maybe").cast("long").alias("n_maybe"),
    ).select(F.col("id").alias(id_col), "n_grams", "n_maybe")


def bloom_gate(
    df: DataFrame,
    bloom: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
    broadcast_filter: bool = True,
) -> DataFrame:
    """`df` plus a `provably_clean` boolean: True when NO k-gram of
    the doc is a filter maybe — those docs can skip the exact
    decontamination check entirely (no false negatives). Docs shorter
    than k tokens carry no grams and are clean by definition."""
    verdict = bloom_probe(
        df, bloom, text_col=text_col, id_col=id_col, k=k,
        m_bits=m_bits, n_hashes=n_hashes,
        broadcast_filter=broadcast_filter,
    ).select(id_col, (F.col("n_maybe") == 0).alias("provably_clean"))
    return df.join(verdict, id_col, "left").fillna(
        {"provably_clean": True}
    )
