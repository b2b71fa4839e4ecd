"""Deterministic sampling operators: reproducibility, partitioning
independence, stratified exactness, reservoir cardinality."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from muopdb_spark.operators.sampling import (
    deterministic_reservoir,
    hash_sample,
    stratified_hash_sample,
)


def _expected_keys(keys, fraction, salt=""):
    thr = format(min(int(fraction * 2**32), 2**32 - 1), "08x")
    return {
        k for k in keys
        if hashlib.md5(f"{salt}{k}".encode()).hexdigest()[:8] < thr
    }


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_hash_sample_matches_reference_md5(docs):
    keys = [r["doc_id"] for r in docs.select("doc_id").collect()]
    got = {r["doc_id"] for r in hash_sample(docs, key_col="doc_id", fraction=0.3).collect()}
    assert got == _expected_keys(keys, 0.3)


def test_hash_sample_partitioning_invariant(docs):
    a = {r["doc_id"] for r in hash_sample(docs, key_col="doc_id", fraction=0.5).collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(
            docs.repartition(13, "lang"), key_col="doc_id", fraction=0.5
        ).collect()
    }
    assert a == b  # df.sample() would fail this


def test_hash_sample_salt_decorrelates(docs):
    a = {r["doc_id"] for r in hash_sample(docs, key_col="doc_id", fraction=0.5, salt="a").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, key_col="doc_id", fraction=0.5, salt="b").collect()}
    assert a != b
    # both still ~half (very loose bound; n=500 at sf0.001... use 3-sigma-ish)
    n = docs.count()
    for s in (a, b):
        assert 0.3 * n < len(s) < 0.7 * n


def test_fraction_bounds():
    with pytest.raises(ValueError):
        from muopdb_spark.operators.sampling import _threshold_hex

        _threshold_hex(1.5)


def test_stratified_fractions(docs):
    out = stratified_hash_sample(
        docs, strata_col="lang", key_col="doc_id",
        fractions={"fr": 1.0, "zh": 0.0},
        default_fraction=0.25,
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang.get("fr") == totals["fr"]  # keep-all stratum
    assert "zh" not in by_lang  # dropped stratum
    for lang in set(totals) - {"fr", "zh"}:  # default strata: ~25%
        assert by_lang.get(lang, 0) < 0.6 * totals[lang]


def test_reservoir_exact_n_and_deterministic(docs):
    out = deterministic_reservoir(docs, strata_col="lang", key_col="doc_id", n=7)
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, total in totals.items():
        assert counts[lang] == min(7, total)
    # deterministic: second run identical
    again = deterministic_reservoir(docs, strata_col="lang", key_col="doc_id", n=7)
    assert sorted(map(tuple, out.select("lang", "doc_id").collect())) == sorted(
        map(tuple, again.select("lang", "doc_id").collect())
    )


def test_token_budget_mixture(spark):
    """Hand-crafted strata: stratum 'big' has 1000 tokens over 100 docs,
    'tiny' has 40 tokens over 4 docs. Budget 200 split 50/50 ->
    'big' gets fraction 0.1, 'tiny' is oversubscribed (100 wanted, 40
    exist) and capped at 1.0; a stratum with no weight is dropped."""
    from muopdb_spark.operators.sampling import token_budget_mixture

    rows = (
        [(i, "big", 10) for i in range(100)]
        + [(1000 + i, "tiny", 10) for i in range(4)]
        + [(2000 + i, "unweighted", 10) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = token_budget_mixture(
        df, strata_col="lang", key_col="doc_id", token_col="n_tokens",
        weights={"big": 0.5, "tiny": 0.5}, budget_tokens=200,
    ).collect()
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) <= {"big", "tiny"}
    # capped stratum keeps EVERYTHING at fraction 1.0
    assert len(by_lang["tiny"]) == 4
    assert all(r["fraction"] == 1.0 for r in by_lang["tiny"])
    # fraction 0.1 over 100 uniform hash buckets: exact membership is
    # the content-addressed rule, so pin it against the reference md5
    assert all(r["fraction"] == 0.1 for r in by_lang["big"])
    expect_big = _expected_keys(range(100), 0.1)
    assert {r["doc_id"] for r in by_lang["big"]} == expect_big


def test_token_budget_mixture_partitioning_invariant(spark):
    from muopdb_spark.operators.sampling import token_budget_mixture

    rows = [(i, "a" if i % 2 else "b", 5 + i % 7) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    kw = dict(
        strata_col="lang", key_col="doc_id", token_col="n_tokens",
        weights={"a": 0.7, "b": 0.3}, budget_tokens=300,
    )
    a = {r["doc_id"] for r in token_budget_mixture(df, **kw).collect()}
    b = {r["doc_id"] for r in
         token_budget_mixture(df.repartition(13), **kw).collect()}
    assert a == b and a


def test_temperature_mixture_composition(spark):
    # 3 strata with very different sizes; alpha=0.5 quotas must follow
    # n^0.5 proportions, sum to ~total, and the sample must be
    # deterministic and respect hash order within each stratum
    import hashlib
    import math

    from muopdb_spark.operators.sampling import temperature_mixture

    sizes = {"a": 400, "b": 100, "c": 25}
    rows, i = [], 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((i, s))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_mixture(
        df, strata_col="lang", key_col="doc_id", alpha=0.5, total_rows=200
    ).collect()

    w = {s: math.sqrt(n) for s, n in sizes.items()}
    sw = sum(w.values())
    expect_quota = {s: min(sizes[s], round(w[s] / sw * 200)) for s in sizes}
    got_quota = {}
    by_stratum = {}
    for r in out:
        got_quota[r.lang] = r.quota
        by_stratum.setdefault(r.lang, []).append(r)
    assert got_quota == expect_quota
    # alpha=0.5 up-samples the smallest stratum relative to natural share
    assert expect_quota["c"] / 200 > sizes["c"] / 525
    for s, members in by_stratum.items():
        assert len(members) == expect_quota[s]
        # kept keys are exactly the first quota in md5-hash order
        ids = {r.doc_id for r in df.filter(f"lang = '{s}'").collect()}
        ordered = sorted(
            ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest()[:8], d)
        )
        assert {r.doc_id for r in members} == set(ordered[: expect_quota[s]])
    # rerun is identical
    again = temperature_mixture(
        df, strata_col="lang", key_col="doc_id", alpha=0.5, total_rows=200
    ).collect()
    assert sorted((r.doc_id, r.sample_rank) for r in again) == sorted(
        (r.doc_id, r.sample_rank) for r in out
    )


def test_temperature_mixture_alpha_extremes(spark):
    from muopdb_spark.operators.sampling import temperature_mixture

    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    # alpha=1: natural proportions
    nat = {
        r.lang: r.quota
        for r in temperature_mixture(
            df, strata_col="lang", key_col="doc_id", alpha=1.0, total_rows=50
        ).select("lang", "quota").distinct().collect()
    }
    assert nat == {"big": 45, "small": 5}
    # alpha=0: uniform across strata
    uni = {
        r.lang: r.quota
        for r in temperature_mixture(
            df, strata_col="lang", key_col="doc_id", alpha=0.0, total_rows=20
        ).select("lang", "quota").distinct().collect()
    }
    assert uni == {"big": 10, "small": 10}


def test_temperature_mixture_hash_membership(spark):
    """The map-side hash-threshold membership form: exact keep-all where
    quota = n_s, expectation-correct composition elsewhere, membership
    identical to the reference md5 rule, deterministic across
    partitionings."""
    from muopdb_spark.operators.sampling import temperature_mixture

    sizes = {"a": 400, "b": 100, "c": 25}
    rows, i = [], 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((i, s))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kw = dict(strata_col="lang", key_col="doc_id", alpha=0.0, total_rows=2000)
    # alpha=0, total 2000 -> each stratum wants 666; all three capped at
    # n_s (fraction 1.0 -> keep-all, exactly matching the rank form)
    out = temperature_mixture(df, membership="hash", **kw).collect()
    rank = temperature_mixture(df, membership="rank", **kw).collect()
    by = {}
    for r in out:
        by.setdefault(r.lang, set()).add(r.doc_id)
    rby = {}
    for r in rank:
        rby.setdefault(r.lang, set()).add(r.doc_id)
    assert by["a"] == rby["a"] and len(by["a"]) == 400  # quota = n -> identical
    assert by["b"] == rby["b"] and len(by["b"]) == 100
    assert by["c"] == rby["c"] and len(by["c"]) == 25

    # fractional quotas: membership follows the md5 threshold rule
    out2 = temperature_mixture(
        df, strata_col="lang", key_col="doc_id", alpha=0.5,
        total_rows=200, membership="hash",
    ).collect()
    fr = {r.lang: r.fraction for r in out2}
    for s, n in sizes.items():
        frac = fr[s]
        ids = [r[0] for r in rows if r[1] == s]
        expect = _expected_keys(ids, frac)
        got = {r.doc_id for r in out2 if r.lang == s}
        # boundary: in-plan double compare vs int truncation can differ
        # by at most the single key sitting on floor(frac * 2^32)
        assert len(got ^ expect) <= 1
        # composition is expectation-correct (loose 3-sigma-ish bound)
        import math
        assert abs(len(got) - frac * n) <= 3 * math.sqrt(n) + 1

    # partition-invariance
    again = {
        r.doc_id
        for r in temperature_mixture(
            df.repartition(13), strata_col="lang", key_col="doc_id",
            alpha=0.5, total_rows=200, membership="hash",
        ).collect()
    }
    assert again == {r.doc_id for r in out2}


def test_temperature_mixture_hash_plan_has_no_rank_window(spark):
    """Plan audit: hash membership must put NO window over the data
    side — the quota arithmetic's window runs over the tiny per-stratum
    count table only, and the corpus side is a broadcast-join + filter.
    The rank form is the one with the corpus-side row_number window."""
    from muopdb_spark.operators.sampling import temperature_mixture

    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(60)],
        "doc_id long, lang string",
    )
    kw = dict(strata_col="lang", key_col="doc_id", alpha=0.5, total_rows=30)
    hash_plan = temperature_mixture(
        df, membership="hash", **kw
    )._jdf.queryExecution().executedPlan().toString()
    rank_plan = temperature_mixture(
        df, membership="rank", **kw
    )._jdf.queryExecution().executedPlan().toString()
    assert "row_number" not in hash_plan
    assert "row_number" in rank_plan
    # the corpus side joins via broadcast in both; the hash form's only
    # windows are over the aggregated count table (sum of pow), never
    # keyed by the stratum column
    assert "BroadcastHashJoin" in hash_plan


def test_temperature_mixture_bad_membership(spark):
    from muopdb_spark.operators.sampling import temperature_mixture

    df = spark.createDataFrame([(1, "a")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        temperature_mixture(
            df, strata_col="lang", key_col="doc_id", membership="nope"
        )


def test_leakage_safe_split_property(spark, sf_dir):
    """No near-dup pair may straddle the train/heldout boundary — the
    property the cluster-keyed hash guarantees by construction."""
    from muopdb_spark.operators.dedup import ngram_jaccard_pairs
    from muopdb_spark.operators.graph import dup_clusters
    from muopdb_spark.operators.sampling import leakage_safe_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.8)
    pairs = pairs.localCheckpoint(eager=True)
    clusters = dup_clusters(docs.select("doc_id"), pairs)
    out = leakage_safe_split(
        docs.select("doc_id"), clusters, train_fraction=0.8
    ).select("doc_id", "split")
    a = out.selectExpr("doc_id AS doc_a", "split AS split_a")
    b = out.selectExpr("doc_id AS doc_b", "split AS split_b")
    straddling = (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .filter("split_a <> split_b").count()
    )
    assert pairs.count() > 0, "fixture must contain near-dup pairs"
    assert straddling == 0
    # both sides populated and deterministic across partitionings
    sides = {r["split"] for r in out.select("split").distinct().collect()}
    assert sides == {"train", "heldout"}
    again = leakage_safe_split(
        docs.select("doc_id").repartition(7), clusters, train_fraction=0.8
    ).select("doc_id", "split")
    assert out.exceptAll(again).count() == 0


# ------------------------------------- weighted token-budget selection


def _wdf(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, n_tokens long, soft_weight double"
    )


def test_weighted_budget_expected_tokens_near_budget(spark):
    from muopdb_spark.operators.sampling import weighted_token_budget_sample

    rows = [(i, 100, 1.0) for i in range(400)]
    df = _wdf(spark, rows)
    out = weighted_token_budget_sample(
        df, key_col="doc_id", token_col="n_tokens", weight_col="soft_weight",
        budget_tokens=20_000,
    )
    got = out.agg(F.sum("n_tokens")).collect()[0][0]
    # uniform weights, lambda = 0.5: expectation 20k, binomial sd ~1k
    assert 15_000 <= got <= 25_000
    assert out.select("fraction").distinct().collect()[0][0] == 0.5


def test_weighted_budget_keep_probability_proportional_to_weight(spark):
    from muopdb_spark.operators.sampling import weighted_token_budget_sample

    # 300 unique-weight docs + 300 downweighted (1/3) near-dup docs,
    # equal lengths: the kept-doc ratio should track the 3:1 weights
    rows = [(i, 50, 1.0) for i in range(300)] + [
        (1000 + i, 50, round(1 / 3, 6)) for i in range(300)
    ]
    out = weighted_token_budget_sample(
        _wdf(spark, rows), key_col="doc_id", token_col="n_tokens",
        weight_col="soft_weight", budget_tokens=10_000,
    ).collect()
    hi = sum(1 for r in out if r.soft_weight == 1.0)
    lo = len(out) - hi
    # lambda = 10000/(300*50 + 300*50/3) = 0.5 -> p_hi=.5, p_lo=.1667
    assert 110 <= hi <= 190 and 20 <= lo <= 80
    fr = {round(r.fraction, 6) for r in out}
    assert fr == {0.5, round(0.5 / 3, 6)}


def test_weighted_budget_cap_leaves_surplus_unspent(spark):
    from muopdb_spark.operators.sampling import weighted_token_budget_sample

    # budget exceeds the weighted mass: unit-weight docs cap at p=1
    # (all kept), downweighted docs stay fractional
    rows = [(i, 100, 1.0) for i in range(50)] + [
        (1000 + i, 100, 0.25) for i in range(200)
    ]
    out = weighted_token_budget_sample(
        _wdf(spark, rows), key_col="doc_id", token_col="n_tokens",
        weight_col="soft_weight", budget_tokens=12_000,
    ).collect()
    # lambda = 12000/(5000 + 5000) = 1.2 -> p=1 for w=1, p=.3 for w=.25
    assert sum(1 for r in out if r.soft_weight == 1.0) == 50
    assert all(r.fraction == 1.0 for r in out if r.soft_weight == 1.0)
    assert all(r.fraction == 0.3 for r in out if r.soft_weight == 0.25)


def test_weighted_budget_zero_weight_never_kept(spark):
    from muopdb_spark.operators.sampling import weighted_token_budget_sample

    rows = [(1, 100, 0.0), (2, 100, 1.0)]
    out = weighted_token_budget_sample(
        _wdf(spark, rows), key_col="doc_id", token_col="n_tokens",
        weight_col="soft_weight", budget_tokens=1_000_000,
    ).collect()
    assert all(r.doc_id != 1 for r in out)


def test_weighted_budget_partition_invariant(spark):
    from muopdb_spark.operators.sampling import weighted_token_budget_sample

    rows = [(i, 10 + i % 37, round(1.0 / (1 + i % 3), 6)) for i in range(200)]
    a = weighted_token_budget_sample(
        _wdf(spark, rows).repartition(1), key_col="doc_id",
        token_col="n_tokens", weight_col="soft_weight", budget_tokens=1500,
    )
    b = weighted_token_budget_sample(
        _wdf(spark, rows).repartition(13), key_col="doc_id",
        token_col="n_tokens", weight_col="soft_weight", budget_tokens=1500,
    )
    ra = sorted((r.doc_id, r.fraction) for r in a.collect())
    rb = sorted((r.doc_id, r.fraction) for r in b.collect())
    assert ra == rb and len(ra) > 0


def test_weighted_budget_empty_and_zero_mass(spark):
    from muopdb_spark.operators.sampling import weighted_token_budget_sample

    out = weighted_token_budget_sample(
        _wdf(spark, [(1, 0, 0.0)]), key_col="doc_id", token_col="n_tokens",
        weight_col="soft_weight", budget_tokens=100,
    ).collect()
    assert out == []


def test_weighted_budget_mass_sum_survives_int64_overflow(spark):
    from muopdb_spark.operators.sampling import weighted_token_budget_sample

    # 40 docs of 2^61 tokens each: the micro-token mass (w*t*1e6) is
    # ~9.2e24, 1e6x past the int64 ceiling where a BIGINT sum would
    # silently wrap negative (non-ANSI Spark) and corrupt every keep
    # probability. The decimal(38,0) accumulator must keep lambda
    # finite, positive, and tiny -> every fraction rounds to ~0 and
    # nothing is kept at a 1000-token budget.
    big = 2**61
    rows = [(i, big, 1.0) for i in range(40)]
    out = weighted_token_budget_sample(
        _wdf(spark, rows), key_col="doc_id", token_col="n_tokens",
        weight_col="soft_weight", budget_tokens=1_000,
    )
    # a wrapped-negative mass would flip lambda's sign: the when()
    # branch would emit 0.0 lambda only on the EXACT-zero case, while
    # a negative sum yields negative fractions -> filter keeps nothing
    # either way, so assert on the fraction VALUES, not just emptiness
    fr = (
        _wdf(spark, rows)
        .crossJoin(
            F.broadcast(
                _wdf(spark, rows)
                .select(
                    F.round(F.col("soft_weight") * F.col("n_tokens") * 1e6)
                    .cast("decimal(38,0)").alias("_wt")
                )
                .agg(F.sum("_wt").alias("_wt_sum"))
            )
        )
        .select(F.col("_wt_sum").cast("double"))
        .collect()[0][0]
    )
    assert fr > 0, "decimal mass sum must not wrap negative"
    assert abs(fr - 40 * big * 1e6) / (40 * big * 1e6) < 1e-12
    assert out.collect() == []


def test_weighted_budget_null_and_negative_inputs_fail_fast(spark):
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from muopdb_spark.operators.sampling import weighted_token_budget_sample

    for rows in (
        [(1, 100, None), (2, 100, 1.0)],   # null weight
        [(1, 100, -0.5), (2, 100, 1.0)],   # negative weight
        [(1, None, 1.0), (2, 100, 1.0)],   # null token count
        [(1, -10, 1.0), (2, 100, 1.0)],    # negative token count
    ):
        out = weighted_token_budget_sample(
            _wdf(spark, rows), key_col="doc_id", token_col="n_tokens",
            weight_col="soft_weight", budget_tokens=1_000,
        )
        with pytest.raises(
            (SparkRuntimeException, Exception),
            match="null or negative",
        ):
            out.collect()


# --------------------------------- water-filling weighted budget (smp9)


def test_weighted_budget_fill_respends_cap_surplus(spark):
    from muopdb_spark.operators.sampling import (
        weighted_token_budget_fill,
        weighted_token_budget_sample,
    )

    # 50 unit-weight docs (cap immediately: lambda_1 = 1.2) + 200
    # downweighted docs. Single-round strands the capped surplus
    # (expected kept = 5000*1 + 5000*0.3 = 6500 < 12000 budget);
    # water-filling re-levels it onto the uncapped tier.
    rows = [(i, 100, 1.0) for i in range(50)] + [
        (1000 + i, 100, 0.25) for i in range(200)
    ]
    df = _wdf(spark, rows)
    kw = dict(key_col="doc_id", token_col="n_tokens",
              weight_col="soft_weight", budget_tokens=12_000)
    one = weighted_token_budget_sample(df, **kw)
    fill = weighted_token_budget_fill(df, **kw)
    # round 2: lambda = (12000 - 5000) / (200*100*0.25) = 1.4
    # -> p_low = 0.35 vs single-round 0.3; capped tier still all-kept
    fr_fill = {r.soft_weight: r.fraction for r in fill.collect()}
    fr_one = {r.soft_weight: r.fraction for r in one.collect()}
    assert fr_fill[1.0] == 1.0 and fr_one[1.0] == 1.0
    assert fr_fill[0.25] == 0.35 and fr_one[0.25] == 0.3
    # expected kept tokens: fill = 5000 + 0.35*20000 = 12000 == budget
    exp_fill = 5000 + 0.35 * 20_000
    exp_one = 5000 + 0.3 * 20_000
    assert abs(exp_fill - 12_000) < 1e-9 and exp_one < 12_000


def test_weighted_budget_fill_no_caps_equals_single_round(spark):
    from muopdb_spark.operators.sampling import (
        weighted_token_budget_fill,
        weighted_token_budget_sample,
    )

    rows = [(i, 10 + i % 37, round(1.0 / (1 + i % 3), 6)) for i in range(200)]
    kw = dict(key_col="doc_id", token_col="n_tokens",
              weight_col="soft_weight", budget_tokens=1500)
    a = sorted((r.doc_id, r.fraction) for r in
               weighted_token_budget_fill(_wdf(spark, rows), **kw).collect())
    b = sorted((r.doc_id, r.fraction) for r in
               weighted_token_budget_sample(_wdf(spark, rows), **kw).collect())
    assert a == b and len(a) > 0


def test_weighted_budget_fill_all_cap_regime(spark):
    from muopdb_spark.operators.sampling import weighted_token_budget_fill

    # budget exceeds the raw token mass: every row caps, all kept
    rows = [(i, 100, round(0.5 + (i % 3) * 0.25, 6)) for i in range(40)]
    out = weighted_token_budget_fill(
        _wdf(spark, rows), key_col="doc_id", token_col="n_tokens",
        weight_col="soft_weight", budget_tokens=1_000_000,
    ).collect()
    assert len(out) == 40 and all(r.fraction == 1.0 for r in out)


def test_weighted_budget_fill_partition_invariant(spark):
    from muopdb_spark.operators.sampling import weighted_token_budget_fill

    rows = [(i, 10 + i % 37, round(1.0 / (1 + i % 4), 6)) for i in range(300)]
    kw = dict(key_col="doc_id", token_col="n_tokens",
              weight_col="soft_weight", budget_tokens=4000)
    a = sorted((r.doc_id, r.fraction) for r in weighted_token_budget_fill(
        _wdf(spark, rows).repartition(1), **kw).collect())
    b = sorted((r.doc_id, r.fraction) for r in weighted_token_budget_fill(
        _wdf(spark, rows).repartition(13), **kw).collect())
    assert a == b and len(a) > 0


def test_weighted_budget_fill_rounds_monotone(spark):
    from muopdb_spark.operators.sampling import weighted_token_budget_fill

    # three weight tiers: each extra round can only raise fractions
    # (lambda is monotone), and rounds beyond the tier count change
    # nothing (converged)
    rows = ([(i, 100, 1.0) for i in range(20)]
            + [(100 + i, 100, 0.5) for i in range(40)]
            + [(1000 + i, 100, 0.1) for i in range(100)])
    kw = dict(key_col="doc_id", token_col="n_tokens",
              weight_col="soft_weight", budget_tokens=7000)
    frs = []
    for r_ in (1, 2, 3, 4, 6):
        out = weighted_token_budget_fill(_wdf(spark, rows), rounds=r_, **kw)
        frs.append({row.doc_id: row.fraction for row in out.collect()})
    for prev, nxt in zip(frs, frs[1:]):
        for k in prev:
            assert nxt.get(k, 0) >= prev[k] - 1e-12
    assert frs[2] == frs[3] == frs[4]  # converged by 3 tiers


def test_weighted_budget_fill_empty_and_fail_fast(spark):
    import pytest

    from muopdb_spark.operators.sampling import weighted_token_budget_fill

    out = weighted_token_budget_fill(
        _wdf(spark, [(1, 0, 0.0)]), key_col="doc_id", token_col="n_tokens",
        weight_col="soft_weight", budget_tokens=100,
    ).collect()
    assert out == []
    with pytest.raises(Exception, match="null or negative"):
        weighted_token_budget_fill(
            _wdf(spark, [(1, 100, None), (2, 100, 1.0)]),
            key_col="doc_id", token_col="n_tokens",
            weight_col="soft_weight", budget_tokens=100,
        ).collect()


def test_weighted_budget_kept_set_monotone_in_budget(spark):
    """Raising the budget can only raise lambda, hence every fraction,
    hence the kept set — for BOTH the single-round and water-filling
    samplers. A user tightening a budget must get a subset, never a
    reshuffle (content-addressed membership guarantees it)."""
    from muopdb_spark.operators.sampling import (
        weighted_token_budget_fill,
        weighted_token_budget_sample,
    )

    rows = [(i, 10 + i % 53, round(1.0 / (1 + i % 5), 6))
            for i in range(400)]
    df = _wdf(spark, rows).localCheckpoint(eager=True)
    for op in (weighted_token_budget_sample, weighted_token_budget_fill):
        prev_keys: set = set()
        prev_fr: dict = {}
        for budget in (500, 2000, 8000, 20000):
            out = op(df, key_col="doc_id", token_col="n_tokens",
                     weight_col="soft_weight", budget_tokens=budget)
            got = {r.doc_id: r.fraction for r in out.collect()}
            assert prev_keys <= set(got), f"{op.__name__}@{budget}"
            for k, f in prev_fr.items():
                assert got[k] >= f - 1e-12
            prev_keys, prev_fr = set(got), got


def test_fill_fractions_dominate_single_round(spark):
    """Water-filling never keeps less of anything: its lambda is >= the
    single-round lambda, so per-row fractions dominate pointwise."""
    from muopdb_spark.operators.sampling import (
        weighted_token_budget_fill,
        weighted_token_budget_sample,
    )

    rows = [(i, 10 + i % 53, round(1.0 / (1 + i % 5), 6))
            for i in range(400)]
    df = _wdf(spark, rows).localCheckpoint(eager=True)
    kw = dict(key_col="doc_id", token_col="n_tokens",
              weight_col="soft_weight", budget_tokens=6000)
    one = {r.doc_id: r.fraction
           for r in weighted_token_budget_sample(df, **kw).collect()}
    fill = {r.doc_id: r.fraction
            for r in weighted_token_budget_fill(df, **kw).collect()}
    assert set(one) <= set(fill)
    for k, f in one.items():
        assert fill[k] >= f - 1e-12


# ----------------------------------------- phase schedule (smp10)


def _phase_df(spark, n=60):
    rows = [(i, 10 + (i % 5), round(0.2 + 0.6 * ((i * 7) % 10) / 10.0, 6))
            for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id long, n_tokens long, quality double"
    ).withColumn("uniform", F.lit(1.0))


def test_phase_schedule_phases_disjoint_and_labeled(spark):
    from muopdb_spark.operators.sampling import phase_budget_schedule

    out = phase_budget_schedule(
        _phase_df(spark), key_col="doc_id", token_col="n_tokens",
        phases=[("warmup", "uniform", 300), ("anneal", "quality", 150)],
    ).collect()
    ids = [r.doc_id for r in out]
    assert len(ids) == len(set(ids)), "a doc must appear in ONE phase"
    by_phase = {p: [r for r in out if r.phase == p]
                for p in ("warmup", "anneal")}
    assert by_phase["warmup"] and by_phase["anneal"]
    for r in out:
        assert 0.0 < r.fraction <= 1.0


def test_phase_schedule_expected_budgets(spark):
    from muopdb_spark.operators.sampling import phase_budget_schedule

    df = _phase_df(spark, n=400)
    toks = {r.doc_id: r.n_tokens for r in df.collect()}
    out = phase_budget_schedule(
        df, key_col="doc_id", token_col="n_tokens",
        phases=[("warmup", "uniform", 2000), ("anneal", "quality", 800)],
    ).collect()
    kept = {p: sum(toks[r.doc_id] for r in out if r.phase == p)
            for p in ("warmup", "anneal")}
    # expectation-level check, binomial noise bounds
    assert 0.5 * 2000 <= kept["warmup"] <= 1.6 * 2000
    assert 0.4 * 800 <= kept["anneal"] <= 2.0 * 800


def test_phase_schedule_deterministic_and_partition_invariant(spark):
    from muopdb_spark.operators.sampling import phase_budget_schedule

    kw = dict(key_col="doc_id", token_col="n_tokens",
              phases=[("a", "uniform", 250), ("b", "quality", 100)])
    a = sorted(map(tuple, phase_budget_schedule(
        _phase_df(spark), **kw).collect()))
    b = sorted(map(tuple, phase_budget_schedule(
        _phase_df(spark).repartition(13), **kw).collect()))
    assert a == b and len(a) > 0


def test_phase_schedule_validation(spark):
    from muopdb_spark.operators.sampling import phase_budget_schedule

    df = _phase_df(spark)
    with pytest.raises(ValueError, match="non-empty"):
        phase_budget_schedule(df, key_col="doc_id",
                              token_col="n_tokens", phases=[])
    with pytest.raises(ValueError, match="duplicate"):
        phase_budget_schedule(
            df, key_col="doc_id", token_col="n_tokens",
            phases=[("p", "uniform", 10), ("p", "quality", 10)],
        )
