"""Round-3 batch C operators: corpus graph construction + PageRank, BPE
pair counting, margin-based bitext mining, curriculum ordering, event
transition matrices, embedding covariance/PCA."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# pagerank


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "src_a string, src_b string, n_shared long"
    )


def test_pagerank_uniform_on_symmetric_complete_graph(spark):
    from kafka_connect_hdfs_spark.operators.graph import pagerank

    e = _edges(
        spark, [("a", "b", 1), ("a", "c", 1), ("b", "c", 1)]
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(e).collect()}
    assert ranks == pytest.approx({"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}, abs=1e-6)


def test_pagerank_sums_to_one_and_favors_hub(spark):
    from kafka_connect_hdfs_spark.operators.graph import pagerank

    # star: hub h connected to 4 spokes — hub must out-rank every spoke
    e = _edges(spark, [("h", f"s{i}", 1) for i in range(4)])
    rows = pagerank(e, iterations=5).collect()
    ranks = {r["node"]: r["rank"] for r in rows}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-5)
    assert all(ranks["h"] > ranks[f"s{i}"] for i in range(4))
    # spokes are symmetric
    assert len({ranks[f"s{i}"] for i in range(4)}) == 1


def test_pagerank_weights_shift_rank(spark):
    from kafka_connect_hdfs_spark.operators.graph import pagerank

    # path a-b-c with a heavy a-b edge: b routes 90% of its mass to a, so
    # the heavy-edge neighbor a must out-rank the light-edge neighbor c
    e = _edges(spark, [("a", "b", 9), ("b", "c", 1)])
    ranks = {r["node"]: r["rank"] for r in pagerank(e, iterations=4).collect()}
    assert ranks["a"] > ranks["c"]
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-5)


def test_pagerank_directed_respects_orientation(spark):
    from kafka_connect_hdfs_spark.operators.graph import pagerank

    # directed 3-cycle: perfectly symmetric under rotation → uniform ranks
    e = _edges(spark, [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)])
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(e, iterations=7, directed=True).collect()
    }
    assert ranks == pytest.approx({"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}, abs=1e-6)


# ---------------------------------------------------------------------------
# shingle_share_edges


def test_shingle_share_edges_counts_distinct_shared_shingles(spark):
    from kafka_connect_hdfs_spark.operators.graph import shingle_share_edges

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox", "s1"),
            (1, "the quick brown cat", "s2"),
            (2, "entirely different words here", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    edges = {
        (r["src_a"], r["src_b"]): r["n_shared"]
        for r in shingle_share_edges(docs, n=3).collect()
    }
    # s1/s2 share exactly the shingle "the quick brown"; s3 shares nothing
    assert edges == {("s1", "s2"): 1}


def test_shingle_share_edges_stop_shingle_cap(spark):
    from kafka_connect_hdfs_spark.operators.graph import shingle_share_edges

    # one shingle present in ALL 3 sources + one shared by only two:
    # cap=2 drops the ubiquitous shingle, keeping only the rare edge
    docs = spark.createDataFrame(
        [
            (0, "common shingle here rare pair one", "s1"),
            (1, "common shingle here rare pair one", "s2"),
            (2, "common shingle here", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    edges = {
        (r["src_a"], r["src_b"]): r["n_shared"]
        for r in shingle_share_edges(docs, n=3, max_groups_per_shingle=2).collect()
    }
    assert ("s1", "s3") not in edges and ("s2", "s3") not in edges
    assert edges[("s1", "s2")] >= 1


def test_covisit_edges_same_bucket_only_and_cap(spark):
    from kafka_connect_hdfs_spark.operators.graph import covisit_edges

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:05:00", 1, "click"),
            (2, "2024-01-01 10:55:00", 2, "click"),   # same hour as user 1
            (3, "2024-01-01 11:05:00", 3, "click"),   # next hour — no pair
            (4, "2024-01-01 10:10:00", 1, "view"),    # different item
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    edges = {
        (r["user_a"], r["user_b"]): r["n_covisits"]
        for r in covisit_edges(ev).collect()
    }
    assert edges == {(1, 2): 1}
    # cap=1: every cell with 2+ users dropped → no edges at all
    assert covisit_edges(ev, max_users_per_bucket=1).count() == 0
