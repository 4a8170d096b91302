"""Tests for the as-of join, schema-change rotation, and offset recovery."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_connect_hdfs_spark.operators.asof import asof_join
from kafka_connect_hdfs_spark.operators.rotation import (
    next_offset_per_partition,
    schema_rotation_chunks,
)


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts(5)), (1, _ts(10)), (2, _ts(3))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(4), "a"), (1, _ts(9), "b"), (2, _ts(7), "c")],
        "k long, ts timestamp, v string",
    )
    out = {
        (r.k, r.ts.minute): r.v_asof
        for r in asof_join(left, right, on="k").collect()
    }
    assert out[(1, 5)] == "a"      # latest right <= 00:05 is 00:04
    assert out[(1, 10)] == "b"     # latest right <= 00:10 is 00:09
    assert out[(2, 3)] is None     # no right row at-or-before 00:03


def test_asof_equal_timestamp_matches(spark):
    left = spark.createDataFrame([(1, _ts(5))], "k long, ts timestamp")
    right = spark.createDataFrame([(1, _ts(5), "x")], "k long, ts timestamp, v string")
    r = asof_join(left, right, on="k").first()
    assert r.v_asof == "x"


def test_schema_rotation_runs_backward(spark):
    # versions 1,1,2,1,2 BACKWARD: current = running max -> runs [1,1],[2,1,2]
    rows = [(0, i, v) for i, v in enumerate([1, 1, 2, 1, 2])]
    df = spark.createDataFrame(rows, "partition int, offset long, v int")
    out = schema_rotation_chunks(df, "v", flush_size=10, compatibility="BACKWARD")
    got = [(r.offset, r.current_version, r.run_id) for r in out.orderBy("offset").collect()]
    assert got == [(0, 1, 1), (1, 1, 1), (2, 2, 2), (3, 2, 2), (4, 2, 2)]


def test_schema_rotation_runs_none(spark):
    # NONE: every version flip starts a run
    rows = [(0, i, v) for i, v in enumerate([1, 2, 1, 1, 2])]
    df = spark.createDataFrame(rows, "partition int, offset long, v int")
    out = schema_rotation_chunks(df, "v", flush_size=10, compatibility="NONE")
    got = [r.run_id for r in out.orderBy("offset").collect()]
    assert got == [1, 2, 3, 3, 4]


def test_schema_rotation_forward_runs(spark):
    # FORWARD: current = running min (older wins)
    rows = [(0, i, v) for i, v in enumerate([2, 2, 1, 2, 1])]
    df = spark.createDataFrame(rows, "partition int, offset long, v int")
    out = schema_rotation_chunks(df, "v", flush_size=10, compatibility="FORWARD")
    got = [(r.current_version, r.run_id) for r in out.orderBy("offset").collect()]
    assert got == [(2, 1), (2, 1), (1, 2), (1, 2), (1, 2)]


def test_schema_rotation_size_interaction(spark):
    # flush=2 within a single run chunks records pairwise
    rows = [(0, i, 1) for i in range(5)]
    df = spark.createDataFrame(rows, "partition int, offset long, v int")
    out = schema_rotation_chunks(df, "v", flush_size=2, compatibility="BACKWARD")
    got = [(r.offset, r.chunk) for r in out.orderBy("offset").collect()]
    assert got == [(0, 0), (1, 0), (2, 1), (3, 1), (4, 2)]


def test_next_offset_per_partition(spark):
    manifest = spark.createDataFrame(
        [(0, 0, 99), (0, 100, 199), (1, 0, 49)],
        "partition int, start_offset long, end_offset long",
    )
    got = {r.partition: r.next_offset for r in next_offset_per_partition(manifest).collect()}
    assert got == {0: 200, 1: 50}


def test_bucketed_range_join_semantics(spark):
    """Half-open [start, end) membership; intervals spanning multiple
    buckets still match points in every covered bucket; no cross product
    (equi-join on bucket, interval side broadcast)."""
    from kafka_connect_hdfs_spark.operators.asof import bucketed_range_join

    intervals = spark.createDataFrame(
        [(1, 10, 20), (2, 15, 45), (3, 100, 101)],
        "iv_id long, s long, e long",
    )
    points = spark.createDataFrame(
        [(10,), (19,), (20,), (44,), (45,), (100,), (99,)], "p long"
    )
    out = bucketed_range_join(points, intervals, "p", "s", "e", bucket_width=10)
    got = sorted((r.iv_id, r.p) for r in out.collect())
    # 10→iv1 (start inclusive), 19→iv1+iv2, 20→iv2 only (iv1 end exclusive),
    # 44→iv2, 45 excluded, 100→iv3, 99 unmatched
    assert got == [(1, 10), (1, 19), (2, 19), (2, 20), (2, 44), (3, 100)]
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in plan and "NestedLoop" not in plan
