"""Hand-computed pins for the r08 operators: KS drift, Benford census,
mutual information, column completeness, char entropy, multi-source
BFS, link prediction, zero-copy clone, partition relayout."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# quality.ks_drift


def test_ks_identical_samples_zero(spark):
    from kafka_connect_hdfs_spark.operators.quality import ks_drift

    df = spark.createDataFrame([(float(i),) for i in range(10)], "value double")
    r = ks_drift(df, df).collect()[0]
    assert r["d_num"] == 0 and r["ks_stat"] == 0.0


def test_ks_disjoint_samples_one(spark):
    from kafka_connect_hdfs_spark.operators.quality import ks_drift

    ref = spark.createDataFrame([(1.0,), (2.0,)], "value double")
    cur = spark.createDataFrame([(10.0,), (11.0,)], "value double")
    r = ks_drift(ref, cur).collect()[0]
    # fully separated ECDFs: D = 1, numerator = n_ref * n_cur
    assert (r["n_ref"], r["n_cur"], r["d_num"], r["ks_stat"]) == (2, 2, 4, 1.0)


def test_ks_hand_computed_gap(spark):
    from kafka_connect_hdfs_spark.operators.quality import ks_drift

    # ref {1,2,3}, cur {2,3,4}: ECDF gaps at grid 1,2,3,4 are
    # |1*3-0*3|=3, |2*3-1*3|=3, |3*3-2*3|=3, |3*3-3*3|=0 -> D=3/9
    ref = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "value double")
    cur = spark.createDataFrame([(2.0,), (3.0,), (4.0,)], "value double")
    r = ks_drift(ref, cur).collect()[0]
    assert r["d_num"] == 3
    assert r["ks_stat"] == round(3 / 9, 6)


# ---------------------------------------------------------------------------
# quality.benford_profile


def test_benford_digit_extraction_and_expected(spark):
    from kafka_connect_hdfs_spark.operators.quality import benford_profile

    # cents: 123.45->12345 (d1), 0.02->2 (d2), 9.5->950 (d9), -345.0 (d3),
    # 0.0 excluded
    df = spark.createDataFrame(
        [(123.45,), (0.02,), (9.5,), (-345.0,), (0.0,)], "value double"
    )
    rows = {r["digit"]: r for r in benford_profile(df).collect()}
    assert len(rows) == 9
    assert rows[1]["n"] == 1 and rows[2]["n"] == 1
    assert rows[3]["n"] == 1 and rows[9]["n"] == 1
    assert rows[4]["n"] == 0 and rows[4]["observed_pct"] == 0.0
    for d in range(1, 10):
        exp = math.log10(1 + 1 / d)
        assert rows[d]["benford_pct"] == pytest.approx(exp, abs=1e-6)


# ---------------------------------------------------------------------------
# quality.mutual_information


def test_mutual_info_independent_is_zero(spark):
    from kafka_connect_hdfs_spark.operators.quality import mutual_information

    # perfectly independent 2x2: every contribution ln(1) = 0
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(5)]
    df = spark.createDataFrame(rows, "a string, b string")
    out = mutual_information(df, "a", "b").collect()
    assert len(out) == 4
    assert all(r["mi_contrib"] == 0.0 for r in out)


def test_mutual_info_perfect_dependence(spark):
    from kafka_connect_hdfs_spark.operators.quality import mutual_information

    # a == b always, 2 symbols: I = ln(2), each cell contributes ln(2)/2
    rows = [("x", "x")] * 4 + [("y", "y")] * 4
    df = spark.createDataFrame(rows, "a string, b string")
    out = mutual_information(df, "a", "b").collect()
    assert len(out) == 2
    for r in out:
        assert r["mi_contrib"] == pytest.approx(math.log(2) / 2, abs=1e-6)
        assert (r["n_ab"], r["n_a"], r["n_b"]) == (4, 4, 4)


# ---------------------------------------------------------------------------
# quality.column_completeness


def test_completeness_counts_null_and_blank(spark):
    from kafka_connect_hdfs_spark.operators.quality import column_completeness

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "  "), (4, "b")], "k long, s string"
    )
    out = {
        (r["table"], r["column"]): r
        for r in column_completeness({"t": df}).collect()
    }
    s = out[("t", "s")]
    assert (s["n_rows"], s["n_null"], s["n_blank"]) == (4, 1, 1)
    assert s["complete_pct"] == 0.5
    k = out[("t", "k")]
    assert (k["n_null"], k["n_blank"], k["complete_pct"]) == (0, 0, 1.0)


# ---------------------------------------------------------------------------
# text.char_entropy


def test_char_entropy_uniform_and_constant(spark):
    from kafka_connect_hdfs_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abcd")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert out[1]["entropy"] == 0.0
    assert out[1]["n_distinct_chars"] == 1
    # uniform over 4 symbols: ln(4); each term ln(4)/4 half-up micro'd
    per_term = math.floor(0.25 * math.log(4) * 1e6 + 0.5)
    assert out[2]["entropy"] == pytest.approx(4 * per_term / 1e6, abs=1e-9)
    assert out[2]["n_chars_counted"] == 4


def test_char_entropy_normalizes_whitespace_and_case(spark):
    from kafka_connect_hdfs_spark.operators.text import char_entropy

    a = spark.createDataFrame([(1, "A  b")], "doc_id long, text string")
    b = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    ra = char_entropy(a).collect()[0]
    rb = char_entropy(b).collect()[0]
    assert ra["entropy"] == rb["entropy"]
    assert ra["n_chars_counted"] == 3  # 'a', ' ', 'b'


# ---------------------------------------------------------------------------
# graph.bfs_distances / link_prediction


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "user_a long, user_b long")


def test_bfs_hand_computed_chain(spark):
    from kafka_connect_hdfs_spark.operators.graph import bfs_distances

    # chain 1-2-3-4-5, source {1}: dists 0,1,2,3; 5 is beyond max_hops=3
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    src = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["dist"] for r in bfs_distances(e, src, max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_multi_source_min_distance(spark):
    from kafka_connect_hdfs_spark.operators.graph import bfs_distances

    # sources {1, 5} on the same chain: node 3 is 2 hops from both
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    src = spark.createDataFrame([(1,), (5,)], "node long")
    out = {r["node"]: r["dist"] for r in bfs_distances(e, src, max_hops=3).collect()}
    assert out == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_bfs_isolated_source_kept_at_zero(spark):
    from kafka_connect_hdfs_spark.operators.graph import bfs_distances

    e = _edges(spark, [(1, 2)])
    src = spark.createDataFrame([(99,)], "node long")
    out = {r["node"]: r["dist"] for r in bfs_distances(e, src).collect()}
    assert out == {99: 0}


def test_link_prediction_triangle_completion(spark):
    from kafka_connect_hdfs_spark.operators.graph import link_prediction

    # path 1-2-3 plus 1-4-3: pair (1,3) shares neighbors {2,4} -> cn=2;
    # jaccard = 2/(deg1+deg3-2) = 2/(2+2-2) = 1.0
    e = _edges(spark, [(1, 2), (2, 3), (1, 4), (4, 3)])
    out = link_prediction(e, k=5).collect()
    top = out[0]
    assert (top["user_a"], top["user_b"], top["cn"]) == (1, 3, 2)
    assert top["jaccard"] == 1.0
    # adjacent pairs never appear
    assert all(not (r["user_a"], r["user_b"]) in {(1, 2), (2, 3), (1, 4), (3, 4)} for r in out)


def test_link_prediction_hub_cap_drops_wedges(spark):
    from kafka_connect_hdfs_spark.operators.graph import link_prediction

    # star through hub 100: all pairs share only the hub; with
    # max_degree below the hub degree no candidates survive
    e = _edges(spark, [(100, i) for i in range(1, 6)])
    assert link_prediction(e, k=10, max_degree=3).count() == 0
    assert link_prediction(e, k=10, max_degree=10).count() > 0


# ---------------------------------------------------------------------------
# snapshots.clone_table


def test_clone_is_zero_copy_and_isolated(spark, tmp_path):
    import glob

    from kafka_connect_hdfs_spark.snapshots import (
        clone_table, commit_snapshot, read_snapshot,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "clone")
    df = spark.createDataFrame([(i, f"r{i}") for i in range(20)], "k long, v string")
    commit_snapshot(spark, df, src)
    clone_table(spark, src, dst)

    # zero-copy: the clone wrote NO data files of its own
    assert glob.glob(f"{dst}/data/**/*.parquet", recursive=True) == []
    assert read_snapshot(spark, dst).count() == 20

    # append to the clone: clone evolves, source does not observe it
    extra = spark.createDataFrame([(100, "x")], "k long, v string")
    commit_snapshot(spark, extra, dst, mode="append")
    assert read_snapshot(spark, dst).count() == 21
    assert read_snapshot(spark, src).count() == 20
    # the appended files live under the CLONE's own data dir
    assert glob.glob(f"{dst}/data/**/*.parquet", recursive=True) != []


def test_clone_refuses_existing_table_and_missing_source(spark, tmp_path):
    from kafka_connect_hdfs_spark.snapshots import clone_table, commit_snapshot

    src = str(tmp_path / "src")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    commit_snapshot(spark, df, src)
    dst = str(tmp_path / "dst")
    commit_snapshot(spark, df, dst)
    with pytest.raises(ValueError, match="already a snapshot table"):
        clone_table(spark, src, dst)
    with pytest.raises(ValueError, match="no snapshots"):
        clone_table(spark, str(tmp_path / "nope"), str(tmp_path / "new"))


def test_clone_pinned_version(spark, tmp_path):
    from kafka_connect_hdfs_spark.snapshots import (
        clone_table, commit_snapshot, read_snapshot,
    )

    src = str(tmp_path / "src")
    d1 = spark.createDataFrame([(1, "a")], "k long, v string")
    d2 = spark.createDataFrame([(2, "b")], "k long, v string")
    commit_snapshot(spark, d1, src)            # v1
    commit_snapshot(spark, d2, src, "append")  # v2
    dst = str(tmp_path / "clone_v1")
    clone_table(spark, src, dst, version=1)
    assert read_snapshot(spark, dst).count() == 1


# ---------------------------------------------------------------------------
# compaction.relayout_partitions


def test_relayout_changes_layout_preserves_rows(spark, tmp_path):
    import glob

    from kafka_connect_hdfs_spark.compaction import relayout_partitions

    df = spark.createDataFrame(
        [(i, "t%d" % (i % 2), "d%d" % (i % 3)) for i in range(60)],
        "k long, typ string, day string",
    )
    path = str(tmp_path / "t")
    df.write.partitionBy("typ").parquet(path)
    assert glob.glob(f"{path}/typ=*")

    layout = relayout_partitions(spark, path, ["day"])
    assert set(layout) and all(k.startswith("day=") for k in layout)
    assert not glob.glob(f"{path}/typ=*")
    back = spark.read.parquet(path)
    assert back.count() == 60
    # every column survives the roundtrip, including the OLD partition col
    assert set(back.columns) == {"k", "typ", "day"}
    assert back.select(F.sum("k")).collect()[0][0] == sum(range(60))


def test_relayout_missing_column_raises(spark, tmp_path):
    import pytest as _pytest

    from kafka_connect_hdfs_spark.compaction import relayout_partitions

    df = spark.createDataFrame([(1, "a")], "k long, v string")
    path = str(tmp_path / "t")
    df.write.parquet(path)
    with _pytest.raises(ValueError, match="not in table columns"):
        relayout_partitions(spark, path, ["nope"])
    # a failed validation must leave the table untouched
    assert spark.read.parquet(path).count() == 1


def test_relayout_multi_column_tree(spark, tmp_path):
    from kafka_connect_hdfs_spark.compaction import relayout_partitions

    df = spark.createDataFrame(
        [(i, "t%d" % (i % 2), "d%d" % (i % 2)) for i in range(20)],
        "k long, typ string, day string",
    )
    path = str(tmp_path / "t")
    df.write.parquet(path)  # unpartitioned to start
    layout = relayout_partitions(spark, path, ["day", "typ"])
    assert all(k.startswith("day=") and "/typ=" in k for k in layout)
    assert spark.read.parquet(path).count() == 20
