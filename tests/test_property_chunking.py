"""Property-based checks (hypothesis) for the chunking/boundary math —
the reference's invariants must hold for arbitrary offset streams, not just
the golden fixtures.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from kafka_connect_hdfs_spark.operators.schema_evolution import (
    simulate_file_boundaries,
)


def _python_reference_chunks(offsets: list[int], flush: int) -> list[tuple[int, int]]:
    """Plain-Python model of F1: sort, take full groups of `flush`."""
    s = sorted(offsets)
    out = []
    for i in range(0, len(s) - flush + 1, flush):
        out.append((s[i], s[i + flush - 1]))
    return out


@given(
    offsets=st.lists(st.integers(0, 10_000), min_size=1, max_size=60, unique=True),
    flush=st.integers(1, 7),
)
@settings(max_examples=30, deadline=None)
def test_size_chunks_match_python_model(spark_global, offsets, flush):
    import pyspark.sql.functions as F

    from kafka_connect_hdfs_spark.operators.rotation import (
        chunk_file_manifest, size_based_chunks,
    )

    spark = spark_global
    df = spark.createDataFrame([(0, o) for o in offsets], "partition int, offset long")
    chunked = size_based_chunks(df, F.lit("partition=0"), flush)
    manifest = (
        chunk_file_manifest(chunked, "t", ".p")
        .orderBy("chunk")
        .select("start_offset", "end_offset", "record_count")
        .collect()
    )
    expected = _python_reference_chunks(offsets, flush)
    assert [(r.start_offset, r.end_offset) for r in manifest] == expected
    assert all(r.record_count == flush for r in manifest)


@given(
    versions=st.lists(st.sampled_from([1, 2, 3]), min_size=1, max_size=40),
    flush=st.integers(1, 5),
    compat=st.sampled_from(["BACKWARD", "FORWARD", "NONE", "FULL"]),
)
@settings(max_examples=200, deadline=None)
def test_file_boundaries_invariants(versions, flush, compat):
    vs = list(enumerate(versions))
    bounds = simulate_file_boundaries(vs, flush, compat)
    # strictly increasing, within range, no file exceeds flush_size
    assert bounds == sorted(set(bounds))
    assert all(0 <= b <= len(versions) for b in bounds)
    for a, b in zip(bounds, bounds[1:]):
        assert b - a <= flush


def _python_reference_windows(n_toks: int, window: int, stride: int):
    """Plain-Python model of chunk_with_overlap's start offsets."""
    if n_toks <= 0:
        return []
    if n_toks <= window:
        return [0]
    import math

    last = math.ceil((n_toks - window) / stride) * stride
    return list(range(0, last + 1, stride))


@given(
    n_toks=st.integers(0, 120),
    window=st.integers(1, 16),
    stride_frac=st.integers(1, 16),
)
@settings(max_examples=30, deadline=None)
def test_chunk_with_overlap_matches_python_model(
    spark_global, n_toks, window, stride_frac
):
    """For arbitrary (doc length, window, stride<=window): chunk starts
    match the Python model, every token index is covered by >=1 chunk,
    and at stride == window the chunks concatenate back to the doc."""
    from kafka_connect_hdfs_spark.operators.packing import chunk_with_overlap

    stride = min(stride_frac, window)
    spark = spark_global
    text = " ".join(f"w{i}" for i in range(n_toks))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_with_overlap(df, window=window, stride=stride).collect(),
        key=lambda r: r["chunk_idx"],
    )
    starts = [r["start_token"] for r in rows]
    assert starts == _python_reference_windows(n_toks, window, stride)
    covered = set()
    for r in rows:
        assert 1 <= r["n_chunk_tokens"] <= window
        assert r["n_chunk_tokens"] == len(r["chunk_text"].split())
        covered.update(
            range(r["start_token"], r["start_token"] + r["n_chunk_tokens"])
        )
    assert covered == set(range(n_toks))
    if stride == window and n_toks > 0:
        assert " ".join(r["chunk_text"] for r in rows) == text
