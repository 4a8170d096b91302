"""Round-5c operators: HITS hub/authority scores and the Bloom-filter
membership tier of incremental dedup."""

from __future__ import annotations

import hashlib
from decimal import Decimal

from pyspark.sql import functions as F


def _rows(df, *cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


# ---------------------------------------------------------------------------
# HITS


def test_hits_hand_computed(spark):
    # a->x (w=2), b->x (w=1), b->y (w=3); two un-normalized rounds:
    #   a1(x)=3, a1(y)=3
    #   h1(a)=2*3=6, h1(b)=1*3+3*3=12
    #   a2(x)=2*6+1*12=24, a2(y)=3*12=36
    #   h2(a)=2*24=48, h2(b)=1*24+3*36=132
    from kafka_connect_hdfs_spark.operators.graph import hits_scores

    edges = spark.createDataFrame(
        [("a", "x", 2), ("b", "x", 1), ("b", "y", 3)],
        "src string, dst string, w int",
    )
    got = {
        r["node"]: (int(r["hub_score"]), int(r["authority_score"]))
        for r in hits_scores(edges, iterations=2).collect()
    }
    assert got == {
        "a": (48, 0),
        "b": (132, 0),
        "x": (0, 24),
        "y": (0, 36),
    }


def test_hits_scores_are_exact_decimals(spark):
    from kafka_connect_hdfs_spark.operators.graph import hits_scores

    edges = spark.createDataFrame(
        [("a", "x", 10**6), ("b", "x", 10**6)], "src string, dst string, w long"
    )
    out = hits_scores(edges, iterations=2)
    schema = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert schema["hub_score"] == "decimal(38,0)"
    # a1(x)=2e6; h1(a)=h1(b)=1e6*2e6=2e12; a2(x)=2*(1e6*2e12)=4e18;
    # h2(a)=1e6*4e18=4e24 — past bigint range, only exact in decimal
    rows = {r["node"]: r for r in out.collect()}
    assert rows["x"]["authority_score"] == Decimal(4 * 10**18)
    assert rows["a"]["hub_score"] == Decimal(4 * 10**24)


def test_hits_directed_cycle_symmetry(spark):
    # symmetric 2-cycle with equal weights: both nodes get equal hub and
    # equal authority scores
    from kafka_connect_hdfs_spark.operators.graph import hits_scores

    edges = spark.createDataFrame(
        [("a", "b", 5), ("b", "a", 5)], "src string, dst string, w int"
    )
    rows = {r["node"]: r for r in hits_scores(edges, iterations=3).collect()}
    assert rows["a"]["hub_score"] == rows["b"]["hub_score"] > 0
    assert rows["a"]["authority_score"] == rows["b"]["authority_score"] > 0


# ---------------------------------------------------------------------------
# Bloom filter


def _py_positions(key: str, m_bits: int, k: int) -> list[int]:
    # reference replica of dedup._bloom_positions
    return [
        int(hashlib.md5(f"{key}:{i}".encode()).hexdigest()[:8], 16) % m_bits
        for i in range(k)
    ]


def test_bloom_positions_match_python_md5(spark):
    from kafka_connect_hdfs_spark.operators.dedup import _bloom_positions

    df = spark.createDataFrame([("deadbeef",), ("k2",)], "key string")
    got = {
        r["key"]: list(r["pos"])
        for r in df.select(
            "key", _bloom_positions(F.col("key"), 2048, 4).alias("pos")
        ).collect()
    }
    for key, pos in got.items():
        assert pos == _py_positions(key, 2048, 4)


def test_bloom_build_sets_expected_bits(spark):
    from kafka_connect_hdfs_spark.operators.dedup import bloom_build

    df = spark.createDataFrame([(f"key{i}",) for i in range(10)], "fp string")
    flt = {r["word"]: r["bits"] for r in bloom_build(df, "fp", 1024, 3).collect()}
    expect: dict[int, int] = {}
    for i in range(10):
        for p in _py_positions(f"key{i}", 1024, 3):
            expect[p // 62] = expect.get(p // 62, 0) | (1 << (p % 62))
    assert flt == expect


def test_bloom_probe_no_false_negatives_and_flags_new(spark):
    from kafka_connect_hdfs_spark.operators.dedup import (
        bloom_build, bloom_probe,
    )

    members = spark.createDataFrame(
        [(i, f"m{i}") for i in range(50)], "doc_id long, fp string"
    )
    flt = bloom_build(members, "fp", m_bits=1 << 16, k=4)
    probe_df = spark.createDataFrame(
        [(100 + i, f"m{i}") for i in range(50)]
        + [(200 + i, f"new{i}") for i in range(50)],
        "doc_id long, fp string",
    )
    got = _rows(
        bloom_probe(probe_df, flt, "fp", "doc_id", m_bits=1 << 16, k=4),
        "fp",
        "maybe_member",
    )
    # Bloom guarantee: every member is flagged (zero false negatives)
    assert all((f"m{i}", True) in got for i in range(50))
    # 65536 bits / 200 set → FP rate ~1e-9: all new keys pass as new
    assert all((f"new{i}", False) in got for i in range(50))


def test_bloom_undersized_filter_yields_false_positives(spark):
    from kafka_connect_hdfs_spark.operators.dedup import (
        bloom_build, bloom_probe,
    )

    members = spark.createDataFrame(
        [(i, f"m{i}") for i in range(200)], "doc_id long, fp string"
    )
    # 64 bits for 200 keys x 4 hashes: filter saturates, probes of fresh
    # keys must collide (that's the failure mode the m/k sizing prevents)
    flt = bloom_build(members, "fp", m_bits=64, k=4)
    fresh = spark.createDataFrame(
        [(i, f"fresh{i}") for i in range(20)], "doc_id long, fp string"
    )
    out = bloom_probe(fresh, flt, "fp", "doc_id", m_bits=64, k=4)
    n_fp = out.filter(F.col("maybe_member")).count()
    assert n_fp == 20  # fully saturated: every probe is a false positive


# ---------------------------------------------------------------------------
# IVF index delete lifecycle


def test_ivf_delete_tombstone_then_vacuum(spark, sf_dir, tmp_path):
    from kafka_connect_hdfs_spark.operators.similarity import (
        build_ivf_index,
        delete_from_ivf_index,
        query_ivf_index,
        vacuum_ivf_index,
    )
    from kafka_connect_hdfs_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "idx")
    build_ivf_index(emb, path, n_seeds=4)
    base = query_ivf_index(spark, path, [0, 1], k=3, n_probe=1).collect()
    victims = sorted({r["neighbor_id"] for r in base})[:2]
    delete_from_ivf_index(spark, path, victims)

    # tombstoned: invisible to serving, but still physically present
    soft = query_ivf_index(spark, path, [0, 1], k=3, n_probe=1)
    soft_rows = soft.collect()
    assert not {r["neighbor_id"] for r in soft_rows} & set(victims)
    on_disk = spark.read.parquet(path + "/cells")
    assert on_disk.filter(on_disk["vec_id"].isin(victims)).count() == len(
        victims
    )

    # vacuum: physically gone, log cleared, serving unchanged
    stats = vacuum_ivf_index(spark, path)
    assert stats and all(b > a for b, a in stats.values())
    assert (
        spark.read.parquet(path + "/cells")
        .filter(F.col("vec_id").isin(victims))
        .count()
        == 0
    )
    import os

    assert not os.path.exists(path + "/_tombstones")
    hard_rows = query_ivf_index(spark, path, [0, 1], k=3, n_probe=1).collect()
    assert sorted(map(tuple, hard_rows)) == sorted(map(tuple, soft_rows))


def test_ivf_vacuum_rewrites_only_affected_cells(spark, sf_dir, tmp_path):
    import os

    from kafka_connect_hdfs_spark.operators.similarity import (
        build_ivf_index,
        delete_from_ivf_index,
        vacuum_ivf_index,
    )
    from kafka_connect_hdfs_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "idx")
    build_ivf_index(emb, path, n_seeds=4)
    cells = spark.read.parquet(path + "/cells")
    # pick one victim, note its cell; every OTHER cell dir must keep
    # byte-identical files (inode-level untouched)
    victim = cells.filter(cells["vec_id"] >= 10).limit(1).collect()[0]
    before = {
        d: sorted(os.listdir(f"{path}/cells/{d}"))
        for d in os.listdir(path + "/cells")
        if d.startswith("cell=")
    }
    delete_from_ivf_index(spark, path, [victim["vec_id"]])
    stats = vacuum_ivf_index(spark, path)
    assert set(stats) == {int(victim["cell"])}
    for d, files in before.items():
        if d != f"cell={int(victim['cell'])}":
            assert sorted(os.listdir(f"{path}/cells/{d}")) == files


def test_ivf_vacuum_noop_without_tombstones(spark, sf_dir, tmp_path):
    from kafka_connect_hdfs_spark.operators.similarity import (
        build_ivf_index, vacuum_ivf_index,
    )
    from kafka_connect_hdfs_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "idx")
    build_ivf_index(emb, path, n_seeds=4)
    assert vacuum_ivf_index(spark, path) == {}


def test_hits_rejects_zero_iterations(spark):
    from kafka_connect_hdfs_spark.operators.graph import hits_scores

    edges = spark.createDataFrame(
        [("a", "b", 1)], "src string, dst string, w long"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="iterations >= 1"):
        hits_scores(edges, iterations=0)


def test_ppr_rejects_absent_seed_set(spark):
    from kafka_connect_hdfs_spark.operators.graph import (
        personalized_pagerank,
    )

    edges = spark.createDataFrame(
        [("a", "b", 1.0)], "src_a string, src_b string, n_shared double"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="none of the seeds"):
        personalized_pagerank(edges, seeds=["zzz-not-here"], iterations=2)


def test_line_dedup_drops_boilerplate_keeps_order(spark):
    from kafka_connect_hdfs_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "BANNER\nalpha beta\ngamma"),
            (2, "banner\ndelta"),          # normalized match of BANNER
            (3, "  banner \nalpha beta"),  # trim+lower match again
            (4, "unique only line"),
            (5, "BANNER"),                 # becomes empty after dedup
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_lines"], r["n_lines_kept"], r["text_kept"])
        for r in line_dedup(docs, max_occurrences=2).collect()
    }
    # 'banner' occurs 4x > 2 -> dropped everywhere; 'alpha beta' occurs
    # 2x <= 2 -> kept; order inside doc 1 preserved
    assert out[1] == (3, 2, "alpha beta\ngamma")
    assert out[2] == (2, 1, "delta")
    assert out[3] == (2, 1, "alpha beta")
    assert out[4] == (1, 1, "unique only line")
    assert out[5] == (1, 0, "")


def test_line_dedup_keeps_blank_only_docs_visible(spark):
    from kafka_connect_hdfs_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [(1, "real line"), (2, ""), (3, "  \n\n  "), (4, "real line")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_lines"], r["n_lines_kept"], r["text_kept"])
        for r in line_dedup(docs, max_occurrences=1).collect()
    }
    # empty/blank docs report (0, 0, '') instead of vanishing
    assert out[2] == (0, 0, "")
    assert out[3] == (0, 0, "")
    # 'real line' occurs twice > 1 -> dropped from both
    assert out[1] == (1, 0, "")
    assert out[4] == (1, 0, "")


def test_line_dedup_normalizes_crlf_line_endings(spark):
    """CRLF corpora (r06 ADVICE): identical boilerplate terminated with
    \r\n vs \n must hash to the same normalized line and dedup together;
    reassembled text must not carry stray \r."""
    from kafka_connect_hdfs_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "cookie banner\r\nunique alpha\r\nbody one"),
            (2, "cookie banner\nunique beta\nbody two"),
            (3, "cookie banner\r\nunique gamma"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_lines"], r["n_lines_kept"], r["text_kept"])
        for r in line_dedup(docs, max_occurrences=1).collect()
    }
    # the banner occurs 3x across mixed endings -> dropped everywhere
    assert got[1] == (3, 2, "unique alpha\nbody one")
    assert got[2] == (3, 2, "unique beta\nbody two")
    assert got[3] == (2, 1, "unique gamma")
    for _, _, text in got.values():
        assert "\r" not in text
