"""Property-based gates (hypothesis) for the deterministic-export
operators: chunk_documents vs a straightforward Python slicer, and
shard_assignment vs a direct md5 reference — random shapes beyond the
hand-picked unit cases."""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from muopdb_spark.operators.export import shard_assignment
from muopdb_spark.operators.packing import chunk_documents


def py_chunks(tokens: list[str], size: int, overlap: int) -> list[tuple[int, str, int]]:
    if not tokens:
        return []
    stride = size - overlap
    n = len(tokens)
    n_windows = 1 if n <= size else -(-(n - size) // stride) + 1
    out = []
    for i in range(n_windows):
        piece = tokens[i * stride : i * stride + size]
        out.append((i, " ".join(piece), len(piece)))
    return out


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n_tokens=st.integers(0, 120),
    size=st.sampled_from([2, 3, 8, 32]),
    overlap=st.integers(0, 7),
)
@pytest.mark.slow
def test_chunker_matches_python(spark, n_tokens, size, overlap):
    if overlap >= size:
        overlap = size - 1
    tokens = [f"w{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(tokens))], "doc_id long, text string")
    got = sorted(
        (r.chunk_idx, r.chunk_text, r.n_tokens)
        for r in chunk_documents(df, size=size, overlap=overlap).collect()
    )
    assert got == py_chunks(tokens, size, overlap)
    # coverage invariant: every token index appears in some chunk
    covered = set()
    for _, text, _ in got:
        covered.update(text.split(" ") if text else [])
    assert covered == set(tokens)


def py_shard(doc_id: int, n_shards: int) -> tuple[int, str]:
    h = hashlib.md5(f"shard-v1:{doc_id}".encode()).hexdigest()
    return int(h[:8], 16) % n_shards, h


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    ids=st.sets(st.integers(0, 10_000), min_size=1, max_size=40),
    n_shards=st.sampled_from([1, 4, 16]),
)
@pytest.mark.slow
def test_shards_match_md5_reference(spark, ids, n_shards):
    df = spark.createDataFrame([(i,) for i in sorted(ids)], "doc_id long")
    got = {
        r.doc_id: (r.shard_id, r.position)
        for r in shard_assignment(df, n_shards=n_shards).collect()
    }
    # reference: shard via md5 hex prefix, position via rank of
    # (full hash, id) within the shard
    ref = {i: py_shard(i, n_shards) for i in ids}
    by_shard: dict[int, list] = {}
    for i, (s, h) in ref.items():
        by_shard.setdefault(s, []).append((h, i))
    expect = {}
    for s, members in by_shard.items():
        for pos, (_, i) in enumerate(sorted(members), start=1):
            expect[i] = (s, pos)
    assert got == expect
