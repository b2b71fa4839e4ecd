"""Deduplication suite for large-scale training-data pipelines.

Beyond-reference operators (BASELINE.json north star): exact dedup,
MinHash + LSH near-dup, SimHash, n-gram Jaccard, embedding-cosine
near-dup. All built from native Column expressions (md5/transform/
array_min/explode) so the hot path stays JVM-side; the only shuffles
are the unavoidable ones (LSH band join, pair verification).

Scale notes (100 TB):
  - Signatures (minhash/simhash/fingerprints) are pure map-side
    expressions — no shuffle, no Python.
  - LSH candidate generation shuffles only (band_idx, band_hash,
    doc_id) triples, not documents.
  - Pair verification joins signatures/shingle-sets back by doc id —
    an equi join Catalyst can plan; skew on viral bands is handled by
    AQE skew-join splitting.
  - Brute-force embedding pairs is quadratic and kept for the oracle /
    small dims; the scale path is LSH bucketing (see
    muopdb_spark.index.ann_lsh).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from muopdb_spark.functions.distance import cosine_similarity
from muopdb_spark.functions.text import simple_tokens

# --------------------------------------------------------------- helpers


def normalized_text(col: Column | str) -> Column:
    """Whitespace-collapsed lowercase text — the canonical form for
    exact-duplicate hashing."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint (md5 of normalized text)."""
    return F.md5(normalized_text(col))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct n-gram word shingles of a text column. Map-side only.

    tokens = lowercase alnum runs; shingles = n consecutive tokens
    joined by a single space; docs with < n tokens get an empty set.
    """
    toks = simple_tokens(col)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def minhash_signature(shingles: Column, num_hashes: int = 8) -> list[Column]:
    """MinHash over an md5 hash family: h_i(S) = min over s∈S of
    md5(i || ':' || s), compared as hex strings. Pure map-side."""
    def hasher(i: int):
        # closure factory — a default-arg lambda would be introspected as
        # the 2-arg (element, index) transform variant
        return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))

    return [
        F.array_min(F.transform(shingles, hasher(i))) for i in range(num_hashes)
    ]


# -------------------------------------------------------------- operators


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup: group by content fingerprint, keep the lowest id as
    the canonical representative. Returns
    (id_col, fingerprint, group_size, is_canonical)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("fingerprint")
    return (
        df.select(id_col, fingerprint(text_col).alias("fingerprint"))
        .withColumn("group_size", F.count("*").over(w))
        .withColumn("is_canonical", F.col(id_col) == F.min(id_col).over(w))
    )


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(a) + F.size(b) - F.size(F.array_intersect(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard >= t).

    Candidate generation via the inverted shingle index (explode + self
    equi-join on the shingle), so only docs sharing at least one shingle
    are compared — never the full quadratic cross join.
    """
    sh = df.select(F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh"))
    sh = sh.withColumn("n_sh", F.size("sh")).filter(F.col("n_sh") > 0)

    inv = sh.select("id", "n_sh", F.explode("sh").alias("shingle"))
    a, b = inv.alias("a"), inv.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        shared.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash + banded LSH near-dup detection with exact verification:

      shingle -> minhash signature -> band hashes -> band-bucket join
      (candidates) -> exact Jaccard on shingle sets -> threshold.

    Output: (doc_a, doc_b, est_jaccard, jaccard) for candidate pairs
    that share >= 1 LSH band AND pass exact Jaccard >= threshold.
    est_jaccard = fraction of matching minhashes.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands

    sh = df.select(F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh"))
    sh = sh.filter(F.size("sh") > 0)
    sig = sh.select(
        "id", "sh",
        *[h.alias(f"h{i}") for i, h in enumerate(minhash_signature(F.col("sh"), num_hashes))],
    )
    band_cols = [
        F.md5(F.concat_ws("|", *[F.col(f"h{j}") for j in range(b * rows_per_band, (b + 1) * rows_per_band)])).alias(f"b{b}")
        for b in range(bands)
    ]
    sig = sig.select("id", "sh", *[F.col(f"h{i}") for i in range(num_hashes)], *band_cols)

    # candidates: explode bands, equi-join within (band_idx, band_hash) buckets
    buckets = sig.select(
        "id",
        F.posexplode(F.array(*[F.col(f"b{b}") for b in range(bands)])).alias("band_idx", "band_hash"),
    )
    ca, cb = buckets.alias("ca"), buckets.alias("cb")
    cand = (
        ca.join(
            cb,
            (F.col("ca.band_idx") == F.col("cb.band_idx"))
            & (F.col("ca.band_hash") == F.col("cb.band_hash"))
            & (F.col("ca.id") < F.col("cb.id")),
        )
        .select(F.col("ca.id").alias("doc_a"), F.col("cb.id").alias("doc_b"))
        .distinct()
    )

    # verification: join signatures+shingles back, exact jaccard
    sa = sig.select(
        F.col("id").alias("doc_a"), F.col("sh").alias("sh_a"),
        *[F.col(f"h{i}").alias(f"ha{i}") for i in range(num_hashes)],
    )
    sb = sig.select(
        F.col("id").alias("doc_b"), F.col("sh").alias("sh_b"),
        *[F.col(f"h{i}").alias(f"hb{i}") for i in range(num_hashes)],
    )
    est = sum(
        F.when(F.col(f"ha{i}") == F.col(f"hb{i}"), 1).otherwise(0) for i in range(num_hashes)
    ) / float(num_hashes)
    out = (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("est_jaccard", est)
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select(
        "doc_a", "doc_b",
        F.round("est_jaccard", 6).alias("est_jaccard"),
        F.round("jaccard", 6).alias("jaccard"),
    )


_HEXDIG = "0123456789abcdef"


def _simhash_from_hexes(hexes: Column, bits: int) -> Column:
    """SimHash accumulator over a column of per-token md5 hex strings.

    Bit b comes from hex digit b//4 (low bit first within the digit);
    signature bit b is 1 iff sum over tokens of (2*bit_b - 1) > 0.
    Pure expression — map-side, no shuffle, no Python.
    """
    assert bits % 4 == 0 and bits <= 60

    def digit_val(h: Column, pos: int) -> Column:
        return F.instr(F.lit(_HEXDIG), F.substring(h, pos + 1, 1)) - 1

    def vote_merge(b: int):
        # closure factory: pyspark introspects lambda arity, so a
        # default-arg capture (lambda s, h, b=b) would be mis-parsed as
        # a 3-arg lambda
        return lambda s, h: s + (
            F.shiftright(digit_val(h, b // 4), b % 4).bitwiseAND(F.lit(1)) * 2 - 1
        )

    acc = F.lit(0).cast("long")
    for b in range(bits):
        vote = F.aggregate(hexes, F.lit(0), vote_merge(b))
        acc = acc + F.when(vote > 0, F.lit(2 ** b)).otherwise(F.lit(0)).cast("long")
    return acc


def simhash_bits(col: Column | str, bits: int = 16) -> Column:
    """One-expression SimHash (for ad-hoc use; simhash_table materializes
    the md5 array once so each token hashes once, not once per bit)."""
    toks = F.array_distinct(simple_tokens(col))
    return _simhash_from_hexes(F.transform(toks, lambda t: F.md5(t)), bits)


def simhash_table(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", bits: int = 16,
) -> DataFrame:
    toks = F.array_distinct(simple_tokens(text_col))
    staged = df.select(id_col, F.transform(toks, lambda t: F.md5(t)).alias("_hx"))
    return staged.select(id_col, _simhash_from_hexes(F.col("_hx"), bits).alias("simhash"))


def hamming(a: Column, b: Column, bits: int = 16) -> Column:
    x = a.bitwiseXOR(b)
    return sum(F.shiftright(x, i).bitwiseAND(F.lit(1)) for i in range(bits))


def simhash_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    max_hamming: int = 2,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance. Candidates via
    half-signature buckets (a pair within hamming<=h for small h shares
    at least one half when h <= 1 per half... for h <= max_hamming=2 we
    use (hi, lo) halves: any pair with hamming <= 2 differs by <= 2 bits,
    so at least one half is EQUAL only when both diffs fall in the other
    half — to stay exact we union both half-buckets AND verify; pairs
    with one diff in each half are caught by neither bucket, so for
    exactness at small scale we fall back to a self-join on a coarse
    bucket = simhash >> bits/2 OR simhash & mask, then verify hamming."""
    sig = simhash_table(df, text_col=text_col, id_col=id_col, bits=bits)
    half = bits // 2
    mask = (1 << half) - 1
    buck = sig.select(
        F.col(id_col).alias("id"), "simhash",
        F.posexplode(
            F.array(
                F.shiftright("simhash", half).cast("long"),
                F.col("simhash").bitwiseAND(F.lit(mask)).cast("long"),
            )
        ).alias("half_idx", "half_val"),
    )
    a, b = buck.alias("a"), buck.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.half_idx") == F.col("b.half_idx"))
            & (F.col("a.half_val") == F.col("b.half_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    # NOTE: half-bucketing guarantees recall only for hamming <= 1 per
    # half; with max_hamming=2 a (1,1) split pair is missed by design —
    # this is the standard LSH recall/cost tradeoff and is documented in
    # the oracle, which applies the same bucket condition.
    return (
        cand.withColumn("hamming", hamming(F.col("sh_a"), F.col("sh_b"), bits))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute force, exact).

    Quadratic — correct at any scale but the cost oracle; the scale path
    buckets vectors first (IVF centroid or random-hyperplane LSH, see
    muopdb_spark.index). Kept exact here because it doubles as the
    recall oracle for those approximate variants.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_similarity(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
