"""Deterministic sampling operators for training-data pipelines.

A 100 TB training-corpus pipeline needs samples that are (a) reproducible
across runs and engines (no RNG state), (b) stable under re-partitioning,
and (c) cheap — map-side, no extra shuffle for Bernoulli sampling. The
standard trick is CONTENT-ADDRESSED sampling: hash a stable key, keep
rows whose hash falls under the fraction threshold. Spark's built-in
`df.sample()` is none of those (partition-RNG based, reshuffles change
membership).

All operators use md5 (identical bytes in every engine) and compare the
first 8 hex chars LEXICOGRAPHICALLY — for fixed-length lowercase hex
that equals numeric comparison, and it makes the DuckDB oracle a literal
transcription (no hex->int conversion portability trap).

Semantics notes:
  - `hash_sample` keeps an expected `fraction` of DISTINCT KEYS (for a
    unique key, of rows). Correlated keys sample together — which is the
    desired behavior for e.g. "keep all chunks of a sampled document".
  - `stratified_hash_sample` applies a per-stratum fraction map — the
    up/down-sampling mix step of corpus curation (e.g. language
    rebalancing).
  - `deterministic_reservoir` takes exactly-n-per-stratum by ranking on
    the key hash: one shuffle on the stratum key, window state O(1),
    ties impossible for distinct keys (md5 collisions aside).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash_bucket(key: Column, salt: str) -> Column:
    """First 8 lowercase-hex chars of md5(salt || key) — a uniform
    32-bit bucket, compared as a string."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8)


def _threshold_hex(fraction: float) -> str:
    """fraction in [0,1] -> 8-hex-digit threshold such that a uniform
    32-bit hex string is < threshold with probability ~= fraction."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    return format(min(int(fraction * 2**32), 2**32 - 1), "08x")


def hash_sample(
    df: DataFrame,
    *,
    key_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose key hashes under
    the fraction threshold. Pure map-side filter — no shuffle, no RNG,
    stable across runs/partitionings/engines; `salt` decorrelates
    independent samples drawn from the same keys."""
    return df.filter(
        _hash_bucket(F.col(key_col), salt) < F.lit(_threshold_hex(fraction))
    )


def stratified_hash_sample(
    df: DataFrame,
    *,
    strata_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the rebalancing mix step of
    corpus curation (keep 100% of rare strata, x% of dominant ones).
    Still map-side: the per-stratum threshold is a CASE expression."""
    thr: Column = F.lit(_threshold_hex(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(_threshold_hex(frac))
        ).otherwise(thr)
    return df.filter(_hash_bucket(F.col(key_col), salt) < thr)


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    *,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    train_fraction: float = 0.9,
    salt: str = "",
) -> DataFrame:
    """Train/heldout split that can't leak near-duplicates: the split
    key is the doc's near-dup CLUSTER id (operators/graph.dup_clusters),
    so every member of a cluster lands on the same side — a doc-keyed
    split would put one copy of a duplicated document in train and its
    near-copy in the eval set, the classic contamination-by-split bug
    (the reason Lee et al. 2107.06499 / benchmark-decontamination
    pipelines split AFTER clustering). Docs absent from `clusters`
    (never paired) are their own singleton cluster (cluster_id = own
    id — dup_clusters emits them, but a pre-filtered cluster table
    works too via the coalesce).

    Same content-addressed hash rule as hash_sample: md5-prefix
    compare, map-side after one broadcast-or-shuffle join on the
    cluster table; deterministic across runs/partitionings/engines.
    Returns df's columns + (cluster_col, split)."""
    assign = clusters.select(
        F.col(id_col).alias("_lsid"), F.col(cluster_col).alias("_lscl")
    )
    joined = df.join(
        assign, df[id_col] == F.col("_lsid"), "left"
    ).withColumn(
        cluster_col, F.coalesce(F.col("_lscl"), F.col(id_col))
    ).drop("_lsid", "_lscl")
    split = F.when(
        _hash_bucket(F.col(cluster_col), salt)
        < F.lit(_threshold_hex(train_fraction)),
        F.lit("train"),
    ).otherwise(F.lit("heldout"))
    return joined.withColumn("split", split)


def token_budget_mixture(
    df: DataFrame,
    *,
    strata_col: str,
    key_col: str,
    token_col: str,
    weights: dict[str, float],
    budget_tokens: int,
    salt: str = "",
) -> DataFrame:
    """Domain-mixture sampling under a token budget — the mixture-
    weighting step of pretraining-data assembly: allocate
    `budget_tokens` across strata proportionally to `weights`
    (normalized over the strata present in `weights`; others get 0),
    convert each stratum's allocation into a deterministic
    content-addressed sampling fraction, and sample.

    fraction_s = round(min(1, (budget * w_s / sum_w) / tokens_s), 6)

    The cap at 1 means an undersized stratum contributes everything it
    has and its surplus allocation is left UNSPENT (single-round
    semantics — no redistribution; callers wanting water-filling loop
    with the surplus, which keeps every round reproducible). The round
    to 6 decimals pins the threshold across engines, so the DuckDB
    oracle can transcribe the same arithmetic.

    Two passes: one per-stratum token-sum aggregate (collected — one
    row per stratum, bounded by the domain vocabulary, ~100s at any
    corpus size), then a pure map-side filter; sampled rows carry the
    applied `fraction` for audit.

    Expected kept tokens per stratum ≈ fraction_s × tokens_s (hash
    membership is independent of document length); exact-budget
    packing is deterministic_reservoir + pack_sequences downstream.
    """
    sum_w = float(sum(weights.values()))
    if sum_w <= 0:
        raise ValueError("weights must sum to a positive value")
    totals = {
        r["s"]: float(r["toks"])
        for r in df.groupBy(F.col(strata_col).alias("s"))
        .agg(F.sum(F.col(token_col)).alias("toks"))
        .collect()
    }
    fractions = {
        s: round(min(1.0, (budget_tokens * w / sum_w) / totals[s]), 6)
        for s, w in weights.items()
        if totals.get(s)
    }
    frac_col: Column = F.lit(None).cast("double")
    thr_col: Column = F.lit(None).cast("string")
    for value, frac in sorted(fractions.items()):
        is_s = F.col(strata_col) == F.lit(value)
        frac_col = F.when(is_s, F.lit(frac)).otherwise(frac_col)
        thr_col = F.when(is_s, F.lit(_threshold_hex(frac))).otherwise(thr_col)
    return (
        df.withColumn("fraction", frac_col)
        .filter(F.col("fraction").isNotNull())
        .filter(_hash_bucket(F.col(key_col), salt) < thr_col)
    )


def weighted_token_budget_sample(
    df: DataFrame,
    *,
    key_col: str,
    token_col: str,
    weight_col: str,
    budget_tokens: int,
    salt: str = "",
) -> DataFrame:
    """WEIGHT-AWARE token-budget selection — the consumer of soft-dedup
    reweighting (operators/dedup.soft_dedup_weights; cf. SoftDedup /
    DataComp-LM: duplicated content is downweighted in the sampling
    distribution, then the corpus is SAMPLED under a token budget).
    Each row is kept with probability proportional to its weight,
    scaled so the EXPECTED kept tokens hit `budget_tokens`:

        p_i = round(min(1, lambda * w_i), 6)
        lambda = budget_tokens / sum_j(w_j * t_j)

    so unit-weight (unique) content is favored and a doc weighing 1/c
    (c near-copies) is kept with 1/c the probability — expected UNIQUE
    information is preserved while duplicated mass shrinks. Rows whose
    p_i caps at 1 contribute all their tokens and leave their surplus
    allocation UNSPENT (single-round semantics, exactly like
    token_budget_mixture; water-filling callers loop with the surplus).

    Determinism/oracle-ability: the weighted-token mass is accumulated
    in integer MICRO-TOKENS (round(w*t*1e6), summed as DECIMAL(38,0) —
    an exact sum with headroom to 1e38 micro-tokens ≈ 1e32 tokens,
    immune to both float summation order AND int64 wraparound; a plain
    BIGINT sum would silently overflow at ~9.2e12 weighted tokens,
    i.e. a few tens of TB of text), lambda is one IEEE double division
    both engines reproduce bit-identically, p is pinned at 6 decimals,
    and membership is the content-addressed hash rule (32-bit md5
    prefix < p * 2^32) compared numerically in-plan.

    Null/negative inputs fail fast IN-PLAN (raise_error, no extra
    validation action): a null weight/token would silently vanish from
    the mass sum and the output (null fraction fails the filter), and
    a negative weight would skew lambda for every other row — both are
    upstream bugs this operator must not paper over.

    Cost/scale (100 TB): ONE partial-agg reduction to a single scalar
    row (map-side combine; the exchange carries one row per partition),
    broadcast back via crossJoin, then a pure map-side filter — the
    corpus itself is never shuffled. Returns kept rows + `fraction`
    (the applied p_i) for audit.
    """
    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    bad = (
        F.col(weight_col).isNull() | (F.col(weight_col) < 0)
        | F.col(token_col).isNull() | (F.col(token_col) < 0)
    )
    w_checked = F.when(
        bad,
        F.raise_error(
            F.concat(
                F.lit("weighted_token_budget_sample: null or negative "
                      f"{weight_col}/{token_col} for key "),
                F.col(key_col).cast("string"),
                F.lit("; weights and token counts must be non-null and >= 0"),
            )
        ).cast("double"),
    ).otherwise(F.col(weight_col))
    wt = F.round(
        w_checked * F.col(token_col) * F.lit(1e6)
    ).cast("decimal(38,0)")
    denom = df.select(wt.alias("_wt")).agg(F.sum("_wt").alias("_wt_sum"))
    lam = F.when(
        F.col("_wt_sum") > 0,
        F.lit(float(budget_tokens) * 1e6) / F.col("_wt_sum").cast("double"),
    ).otherwise(F.lit(0.0))
    hash_long = F.conv(_hash_bucket(F.col(key_col), salt), 16, 10).cast("long")
    return (
        df.crossJoin(F.broadcast(denom))
        .withColumn(
            "fraction",
            F.round(F.least(F.lit(1.0), lam * F.col(weight_col)), 6),
        )
        .filter(hash_long < F.col("fraction") * F.lit(float(2**32)))
        .drop("_wt_sum")
    )


def weighted_token_budget_fill(
    df: DataFrame,
    *,
    key_col: str,
    token_col: str,
    weight_col: str,
    budget_tokens: int,
    rounds: int = 3,
    salt: str = "",
) -> DataFrame:
    """WATER-FILLING weighted token-budget selection — the multi-round
    extension weighted_token_budget_sample's docstring defers to: in
    the single-round operator, rows whose keep probability caps at 1
    leave their surplus allocation UNSPENT, so the expected kept tokens
    undershoot the budget whenever the budget is large relative to the
    weighted mass. This operator re-levels: solve for the water level
    lambda with sum_i min(1, lambda*w_i)*t_i = budget by monotone
    iteration from below,

        lambda_1 = budget / sum_i(w_i*t_i)
        lambda_r = max(lambda_{r-1},
                       (budget - T_cap) / sum_uncapped(w_i*t_i))

    where T_cap = tokens of rows capped under lambda_{r-1}. Each round
    lambda only grows and the capped set only grows, so `rounds`
    iterations (default 3) reach the exact level when there are at most
    `rounds` weight "tiers" and otherwise spend strictly more of the
    surplus than single-round; the final membership rule is identical
    to weighted_token_budget_sample (p = round(min(1, lambda*w), 6),
    32-bit md5-prefix hash).

    Determinism/oracle-ability: every per-round mass is an exact
    integer sum (micro-tokens as decimal(38,0) for the weighted mass,
    whole tokens for the capped mass), each lambda update is a fixed
    chain of IEEE double ops both engines reproduce bit-identically,
    and early convergence (no uncapped mass, or budget already covered
    by capped rows) leaves lambda unchanged — exactly how the unrolled
    SQL oracle behaves, so a Python-side break is value-equivalent.

    Null/negative weights or token counts fail fast in-plan (the same
    raise_error contract as weighted_token_budget_sample; the guard
    rides in the first round's aggregate).

    Cost/scale (100 TB): `rounds` partial-agg reductions, each
    collapsing to ONE row driver-side (the same bounded-collect class
    as token_budget_mixture's per-stratum sums), then one map-side
    filter with lambda as a literal. The corpus is scanned `rounds`+1
    times and never shuffled.
    """
    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    bad = (
        F.col(weight_col).isNull() | (F.col(weight_col) < 0)
        | F.col(token_col).isNull() | (F.col(token_col) < 0)
    )
    w_checked = F.when(
        bad,
        F.raise_error(
            F.concat(
                F.lit("weighted_token_budget_fill: null or negative "
                      f"{weight_col}/{token_col} for key "),
                F.col(key_col).cast("string"),
                F.lit("; weights and token counts must be non-null and >= 0"),
            )
        ).cast("double"),
    ).otherwise(F.col(weight_col))
    wt = F.round(
        w_checked * F.col(token_col) * F.lit(1e6)
    ).cast("decimal(38,0)")
    s0 = df.select(wt.alias("_wt")).agg(F.sum("_wt")).collect()[0][0]
    lam = (
        float(budget_tokens) * 1e6 / float(s0)
        if s0 is not None and s0 > 0 else 0.0
    )
    for _ in range(rounds - 1):
        capped = F.lit(lam) * F.col(weight_col) >= F.lit(1.0)
        row = df.select(
            F.when(~capped, wt).alias("_wt_unc"),
            F.when(capped, F.col(token_col).cast("decimal(38,0)"))
            .alias("_t_cap"),
        ).agg(
            F.sum("_wt_unc").alias("s"), F.sum("_t_cap").alias("tc")
        ).collect()[0]
        s, tc = row["s"], row["tc"] or 0
        rem = float(budget_tokens) - float(tc)
        if s is None or not s > 0 or not rem > 0:
            break  # converged: lambda would not change this round
        lam = max(lam, rem * 1e6 / float(s))
    hash_long = F.conv(_hash_bucket(F.col(key_col), salt), 16, 10).cast("long")
    return (
        df.withColumn(
            "fraction",
            F.round(
                F.least(F.lit(1.0), F.lit(lam) * F.col(weight_col)), 6
            ),
        )
        .filter(hash_long < F.col("fraction") * F.lit(float(2**32)))
    )


def phase_budget_schedule(
    df: DataFrame,
    *,
    key_col: str,
    token_col: str,
    phases: list[tuple[str, str, int]],
    salt: str = "",
) -> DataFrame:
    """MULTI-PHASE token-budget schedule — the annealing recipe of
    Llama-3-class training runs expressed as data selection: the bulk
    phase samples under a large budget with one weighting (typically
    uniform or soft-dedup weights), then an ANNEALING phase samples a
    smaller budget from the REMAINING corpus under a quality-upweighted
    distribution, so the tail of training sees the best data without
    re-serving anything already selected.

    ``phases``: ordered [(phase_name, weight_col, budget_tokens), ...].
    Phase i runs weighted_token_budget_sample (salt =
    f"{salt}|{phase_name}" — content-addressed membership independent
    across phases) over the rows no earlier phase selected. Output:
    one row per selected doc — (key_col, phase, fraction), a doc
    appears in at most one phase.

    Determinism/oracle-ability: each phase inherits smp8's exact
    contract (decimal micro-token mass, one IEEE division, 6-decimal
    p, md5-prefix rule), and phase membership is pure set algebra on
    those deterministic picks — the DuckDB oracle unrolls the phase
    chain as CTEs.

    Cost/scale (100 TB): the FEATURE BASE — (key, token count, every
    phase's weight column) — is computed ONCE and materialized, so the
    per-phase mass aggregates and membership filters scan ~3 numeric
    columns per row instead of re-deriving token/quality features from
    text each phase (the r10 sf1.0 witness measured 3.9x/decade with
    per-phase re-derivation; sharing the base removes the repeated
    feature scans). Since r12 the base rides a MEMORY_AND_DISK persist
    (unpersisted after the phase loop — every phase pick is an eager
    localCheckpoint, so nothing returned depends on the cache) instead
    of a localCheckpoint: a checkpoint WRITES the corpus-sized base to
    block storage before the first phase can read it, which doubled
    the one-time materialization cost for callers that already hold a
    materialized base (r11 witness: 3.0x/decade; the write was the
    visible residual). Per phase on top of that: smp8's one
    partial-agg scalar + map-side filter, plus ONE anti-join of the
    previous picks (picks are budget-sized — orders of magnitude below
    the corpus; AQE broadcasts them when they fit). Phase picks are
    materialized (localCheckpoint) so the chain's lineage stays flat.
    """
    if not phases:
        raise ValueError("phases must be non-empty")
    names = [p[0] for p in phases]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate phase names: {names}")
    feat_cols = [key_col, token_col] + [
        w for _, w, _ in phases if w not in (key_col, token_col)
    ]
    seen: set[str] = set()
    feat_cols = [c for c in feat_cols if not (c in seen or seen.add(c))]
    from pyspark import StorageLevel

    base = df.select(*feat_cols).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        base.count()  # materialize the narrow base exactly once
        remaining = base
        out = None
        for name, weight_col, budget in phases:
            sel = weighted_token_budget_sample(
                remaining, key_col=key_col, token_col=token_col,
                weight_col=weight_col, budget_tokens=budget,
                salt=f"{salt}|{name}",
            ).select(
                key_col, F.lit(name).alias("phase"), "fraction",
            ).localCheckpoint(eager=True)
            out = sel if out is None else out.unionByName(sel)
            remaining = remaining.join(
                sel.select(key_col), key_col, "left_anti",
            )
        return out
    finally:
        base.unpersist()


def deterministic_reservoir(
    df: DataFrame,
    *,
    strata_col: str,
    key_col: str,
    n: int,
    salt: str = "",
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Exactly-n-per-stratum sample: rank keys within each stratum by
    their hash and keep the first n. One shuffle (on the stratum), O(1)
    window state per row; the result is a uniform-without-replacement
    sample that is identical on every run and engine."""
    w = Window.partitionBy(strata_col).orderBy(
        _hash_bucket(F.col(key_col), salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= n)
    )


def temperature_mixture(
    df: DataFrame,
    *,
    strata_col: str,
    key_col: str,
    alpha: float = 0.5,
    total_rows: int = 1000,
    salt: str = "",
    membership: str = "rank",
) -> DataFrame:
    """Temperature-based mixture sampling (the mT5 / XLM-R multilingual
    recipe, Xue et al. 2021 §3.1): target composition p_s ~ n_s^alpha
    over the strata, which UP-samples small strata relative to their
    natural share (alpha < 1 flattens the distribution; alpha = 1 is
    natural sampling; alpha = 0 is uniform across strata).

    Materializes a corpus of ~`total_rows` rows at the target
    composition deterministically: quota_s = min(n_s,
    round(p_s * total_rows)).

    Two membership forms, selected by `membership`:

    - ``"rank"`` (exact, the oracle-checkable reference semantics):
      each stratum contributes its FIRST quota_s keys in
      content-addressed md5-hash order — exactly quota_s rows per
      stratum, via a row_number window per stratum. At 100 TB with a
      dominant stratum that rank window is one hot partition.
    - ``"hash"`` (the scale path): convert each stratum's quota to the
      fraction quota_s/n_s and keep rows whose 32-bit key hash falls
      under fraction * 2^32 — the hash_sample rule, evaluated entirely
      map-side after a broadcast join of the tiny quota table. NO
      stratum-keyed shuffle of the corpus at all. Kept count per
      stratum is Binomial(n_s, quota_s/n_s) — expectation exactly
      quota_s, exact (all rows) whenever quota_s = n_s; membership is
      still deterministic/partition-invariant. Equivalence to the rank
      form pinned by tests/test_sampling.py::
      test_temperature_mixture_hash_membership.

    Cost: one per-stratum count aggregate (the quota arithmetic stays
    IN-PLAN as a window over the counts — no driver collect, so the
    operator composes into ONE job) + the membership step above.

    Returns the kept rows + (quota, sample_rank) for audit in rank
    mode, (quota, fraction) in hash mode.
    """
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    if membership not in ("rank", "hash"):
        raise ValueError(f"membership must be 'rank' or 'hash', got {membership!r}")
    counts = df.groupBy(F.col(strata_col)).agg(F.count("*").alias("_n"))
    wsum = Window.partitionBy()
    quotas = counts.select(
        strata_col,
        "_n",
        F.least(
            F.col("_n"),
            F.round(
                F.pow("_n", F.lit(float(alpha)))
                / F.sum(F.pow("_n", F.lit(float(alpha)))).over(wsum)
                * F.lit(int(total_rows))
            ).cast("long"),
        ).alias("quota"),
    )
    if membership == "hash":
        # quota -> keep fraction; compare the hash NUMERICALLY in-plan
        # (conv hex -> long) so no driver collect is needed to build a
        # hex-literal threshold. The threshold uses the UNROUNDED
        # quota/n — one IEEE double division both engines reproduce
        # bit-identically, which makes the keep-set exactly
        # SQL-transcribable (the reported `fraction` column is rounded
        # for audit only). For quota = n the threshold is 2^32,
        # strictly above every 32-bit hash -> keep-all, matching the
        # rank form exactly.
        hash_long = F.conv(
            _hash_bucket(F.col(key_col), salt), 16, 10
        ).cast("long")
        return (
            df.join(
                F.broadcast(quotas.select(strata_col, "_n", "quota")), strata_col
            )
            .filter(
                hash_long
                < (F.col("quota") / F.col("_n")) * F.lit(float(2**32))
            )
            .withColumn(
                "fraction",
                F.round(F.col("quota") / F.col("_n"), 6),
            )
            .drop("_n")
        )
    w = Window.partitionBy(strata_col).orderBy(
        _hash_bucket(F.col(key_col), salt).asc(), F.col(key_col).asc()
    )
    return (
        df.join(F.broadcast(quotas.select(strata_col, "quota")), strata_col)
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= F.col("quota"))
    )
