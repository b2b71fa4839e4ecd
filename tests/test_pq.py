"""PQ: codebook training, encode, ADC scoring — numeric sanity on
clustered vectors (quantization error bounded; PQ top-k recall high on
well-separated clusters; code range valid)."""

import numpy as np
import pytest

from muopdb_spark.index.pq import pq_encode, pq_search, train_pq
from muopdb_spark.operators.knn import knn

N_CLUSTERS, PER_CLUSTER, DIM = 4, 60, 8


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(3)
    rows = []
    for c in range(N_CLUSTERS):
        center = np.full(DIM, c * 50.0)
        for j, p in enumerate(center + rng.normal(0, 2.0, size=(PER_CLUSTER, DIM))):
            rows.append((c * PER_CLUSTER + j, [float(x) for x in p]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


@pytest.fixture(scope="module")
def codebook(clustered):
    return train_pq(clustered, num_subvectors=4, num_centers=8, seed=5)


def test_codebook_shape(codebook):
    assert codebook.num_subvectors == 4
    assert codebook.sub_dim == 2
    for cb in codebook.codebooks:
        assert cb.shape == (8, 2)


def test_encode_codes_valid(clustered, codebook):
    enc = pq_encode(clustered, codebook)
    rows = enc.select("pq_code").collect()
    for r in rows:
        assert len(r["pq_code"]) == 4
        assert all(0 <= c < 8 for c in r["pq_code"])
    # clusters are far apart: their code sets must be disjoint
    enc_rows = enc.collect()
    c0 = {tuple(r["pq_code"]) for r in enc_rows if r["vec_id"] < PER_CLUSTER}
    c2 = {tuple(r["pq_code"]) for r in enc_rows
          if 2 * PER_CLUSTER <= r["vec_id"] < 3 * PER_CLUSTER}
    assert not (c0 & c2)


def test_adc_approximates_l2(clustered, codebook):
    import pyspark.sql.functions as F
    from muopdb_spark.functions.distance import l2_distance
    from muopdb_spark.index.pq import pq_adc_score

    q = [25.0] * DIM  # between clusters 0 and 1
    enc = pq_encode(clustered, codebook)
    both = enc.select(
        "vec_id",
        l2_distance("embedding", F.lit(q).cast("array<double>")).alias("true_d"),
        pq_adc_score(q, codebook).alias("adc_d"),
    ).collect()
    # relative error small on average (clusters tight, codebook resolves them)
    errs = [abs(r["adc_d"] - r["true_d"]) / r["true_d"] for r in both]
    assert np.mean(errs) < 0.05


def test_pq_search_recall(clustered, codebook):
    rng = np.random.default_rng(9)
    enc = pq_encode(clustered, codebook).cache()
    for c in (0, 2):
        q = (np.full(DIM, c * 50.0) + rng.normal(0, 2.0, DIM)).tolist()
        approx = {r["vec_id"] for r in pq_search(enc, q, codebook, 10).collect()}
        # PQ collapses same-code points into score ties, so exact id
        # overlap is arbitrary — the meaningful property is that every
        # PQ hit lands in the true cluster
        assert len(approx) == 10
        assert approx <= {i for i in range(c * PER_CLUSTER, (c + 1) * PER_CLUSTER)}
