"""Crash-matrix fault injection for the state-swap protocols (r05 VERDICT
item 5). Mirrors the reference's FailureRecoveryTest pattern
(FailureRecoveryTest.java / TopicPartitionWriterTest — inject a failure
between WAL apply and commit, assert recovery): each test constructs the
EXACT filesystem state a crash between two metadata ops leaves behind,
then runs the operator and asserts the pre-crash data survives.

These tests fail on the pre-r05 code paths:
- cdc._merge_batch without the backup restore silently rebuilds state
  from the current micro-batch alone (drops every previously merged key).
- snapshots.commit_snapshot with mode("error") wedges permanently on an
  orphaned data/v<N> directory.
- vacuum_ivf_index's old delete-then-rename protocol loses the whole cell
  if the crash lands in the gap (there is no backup to restore).
"""

from __future__ import annotations

import pytest


def _hadoop(spark, path):
    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(path).getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, Path


# ---------------------------------------------------------------------------
# CDC state swap


def test_cdc_merge_restores_state_stranded_at_backup(spark, tmp_path):
    """Crash between the swap's two renames: state exists ONLY at the
    backup path. The next merge must restore it, not rebuild from the
    micro-batch alone."""
    from kafka_connect_hdfs_spark.streaming.cdc import _merge_batch

    state = str(tmp_path / "state")
    old_keys = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "user_id int, event_type string, v int"
    )
    # simulate the post-crash layout: backup present, live path absent
    old_keys.write.parquet(str(tmp_path / ".state__cdc_old"))
    batch = spark.createDataFrame(
        [(3, "c", 30)], "user_id int, event_type string, v int"
    )
    _merge_batch(spark, batch, state, ["user_id"], ["v"])
    got = {r["user_id"] for r in spark.read.parquet(state).collect()}
    assert got == {1, 2, 3}  # pre-r05: {3} — old keys dropped


def test_cdc_merge_tolerates_stale_backup_after_publish(spark, tmp_path):
    """Crash after publish but before backup cleanup: both paths exist.
    The merge must use the LIVE state and clear the stale backup."""
    from kafka_connect_hdfs_spark.streaming.cdc import _merge_batch

    state = str(tmp_path / "state")
    live = spark.createDataFrame(
        [(1, "live", 99)], "user_id int, event_type string, v int"
    )
    stale = spark.createDataFrame(
        [(1, "stale", 1), (7, "stale", 1)],
        "user_id int, event_type string, v int",
    )
    live.write.parquet(state)
    stale.write.parquet(str(tmp_path / ".state__cdc_old"))
    batch = spark.createDataFrame(
        [(2, "c", 30)], "user_id int, event_type string, v int"
    )
    _merge_batch(spark, batch, state, ["user_id"], ["v"])
    rows = {
        r["user_id"]: r["event_type"]
        for r in spark.read.parquet(state).collect()
    }
    assert rows == {1: "live", 2: "c"}  # 7 (stale) must NOT resurface
    fs, Path = _hadoop(spark, state)
    assert not fs.exists(Path(str(tmp_path / ".state__cdc_old")))


# ---------------------------------------------------------------------------
# snapshot commit


def test_snapshot_commit_recovers_from_orphaned_data_dir(spark, tmp_path):
    """Crash between the data write and the manifest rename orphans
    data/v<N>; the retry recomputes the SAME N and must clear the orphan
    instead of erroring out (pre-r05: mode('error') wedged the table)."""
    from kafka_connect_hdfs_spark.snapshots import (
        commit_snapshot, read_snapshot,
    )

    path = str(tmp_path / "tbl")
    junk = spark.createDataFrame([(999,)], "x int")
    junk.write.parquet(path + "/data/v1")  # the orphan — no manifest
    df = spark.createDataFrame([(1,), (2,)], "x int")
    commit_snapshot(spark, df, path)
    got = sorted(r["x"] for r in read_snapshot(spark, path).collect())
    assert got == [1, 2]


# ---------------------------------------------------------------------------
# IVF vacuum two-rename swap


@pytest.fixture()
def ivf_index(spark, sf_dir, tmp_path):
    from kafka_connect_hdfs_spark.operators.similarity import (
        build_ivf_index, delete_from_ivf_index,
    )
    from kafka_connect_hdfs_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path)
    victims = [r["vec_id"] for r in emb.limit(60).collect()][::17]
    delete_from_ivf_index(spark, path, victims)
    return path, victims


def test_vacuum_recovers_cell_stranded_at_backup(spark, ivf_index):
    """Crash between vacuum's two renames: the cell exists ONLY at the
    backup name. Vacuum must restore it before rewriting — the pre-r05
    delete-then-rename protocol had no backup and lost the cell."""
    from kafka_connect_hdfs_spark.operators.similarity import (
        vacuum_ivf_index,
    )

    path, victims = ivf_index
    cells = spark.read.parquet(path + "/cells")
    tomb = set(victims)
    # pick a cell that contains a tombstoned vector
    cell = int(
        cells.filter(F_col_in("vec_id", tomb)).select("cell").first()["cell"]
    )
    n_total = cells.filter(f"cell = {cell}").count()
    fs, Path = _hadoop(spark, path)
    # simulate the mid-swap crash: published dir renamed aside
    assert fs.rename(
        Path(f"{path}/cells/cell={cell}"),
        Path(f"{path}/cells/.cell={cell}.__vacuum_old"),
    )
    stats = vacuum_ivf_index(spark, path)
    assert cell in stats
    n_before, n_after = stats[cell]
    assert n_before == n_total  # the stranded rows were recovered
    assert n_after < n_before  # and the tombstoned ones then removed
    survivors = {
        r["vec_id"]
        for r in spark.read.parquet(f"{path}/cells/cell={cell}").collect()
    }
    assert len(survivors) == n_after
    assert survivors and not (survivors & tomb)
    assert not fs.exists(Path(f"{path}/cells/.cell={cell}.__vacuum_old"))


def F_col_in(name, values):
    from pyspark.sql import functions as F

    return F.col(name).isin(*[int(v) for v in values])


def test_vacuum_clears_stale_backup_when_cell_published(spark, ivf_index):
    """Crash after publish, before backup delete: both dirs exist. Vacuum
    must drop the stale backup and proceed on the live cell."""
    from kafka_connect_hdfs_spark.operators.similarity import (
        vacuum_ivf_index,
    )

    path, victims = ivf_index
    cells = spark.read.parquet(path + "/cells")
    cell = int(
        cells.filter(F_col_in("vec_id", set(victims)))
        .select("cell")
        .first()["cell"]
    )
    fs, Path = _hadoop(spark, path)
    # stale backup alongside the live cell
    junk = spark.createDataFrame([(123456789, [0.0])], "vec_id long, embedding array<double>")
    junk.write.parquet(f"{path}/cells/.cell={cell}.__vacuum_old")
    vacuum_ivf_index(spark, path)
    survivors = {
        r["vec_id"]
        for r in spark.read.parquet(f"{path}/cells/cell={cell}").collect()
    }
    assert 123456789 not in survivors  # stale backup did not resurface
    assert not (survivors & set(victims))
    assert not fs.exists(Path(f"{path}/cells/.cell={cell}.__vacuum_old"))


def test_mart_refresh_restores_state_stranded_at_backup(spark, tmp_path):
    """Same two-rename crash matrix as CDC, for the streaming mart: state
    stranded at the backup path must be restored and folded with the new
    batch, not rebuilt from the batch alone."""
    from pyspark.sql import functions as F

    from kafka_connect_hdfs_spark.streaming.mart import _refresh_batch

    mart = str(tmp_path / "mart")
    prior = spark.createDataFrame(
        [("a", 5, 50.0), ("b", 2, 20.0)], "k string, n_rows long, v double"
    ).select(
        "k", "n_rows", F.col("v").cast("decimal(28,2)").alias("total_v")
    )
    prior.write.parquet(str(tmp_path / ".mart__mart_old"))
    batch = spark.createDataFrame(
        [("a", 1.5), ("c", 3.0)], "k string, value double"
    )
    _refresh_batch(
        spark, batch, mart, ["k"], "n_rows", {"value": "total_v"}
    )
    got = {
        r["k"]: (r["n_rows"], float(r["total_v"]))
        for r in spark.read.parquet(mart).collect()
    }
    assert got == {"a": (6, 51.5), "b": (2, 20.0), "c": (1, 3.0)}


def test_mart_refresh_raises_on_foreign_stream_marker(spark, tmp_path):
    """A mart carries the identity of the stream that maintains it (r06
    ADVICE): restarting against an existing mart with a FRESH checkpoint
    (batch ids restart at 0) must RAISE, not silently skip every batch
    whose id is <= the old marker."""
    from pyspark.sql import functions as F

    from kafka_connect_hdfs_spark.streaming.mart import _refresh_batch

    mart = str(tmp_path / "mart")
    batch = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "k string, value double"
    )
    _refresh_batch(
        spark, batch, mart, ["k"], "n_rows", {"value": "total_v"},
        batch_id=3, stream_id="stream-one",
    )
    # same stream, replayed id -> silently skipped (idempotent replay)
    before = sorted(
        (r["k"], r["n_rows"]) for r in spark.read.parquet(mart).collect()
    )
    _refresh_batch(
        spark, batch, mart, ["k"], "n_rows", {"value": "total_v"},
        batch_id=3, stream_id="stream-one",
    )
    after = sorted(
        (r["k"], r["n_rows"]) for r in spark.read.parquet(mart).collect()
    )
    assert before == after == [("a", 1), ("b", 1)]
    # different stream identity (fresh checkpoint) -> hard error
    with pytest.raises(ValueError, match="checkpoint"):
        _refresh_batch(
            spark, batch, mart, ["k"], "n_rows", {"value": "total_v"},
            batch_id=0, stream_id="stream-two",
        )
    # same stream, NEW id -> folds normally
    _refresh_batch(
        spark, batch, mart, ["k"], "n_rows", {"value": "total_v"},
        batch_id=4, stream_id="stream-one",
    )
    got = sorted(
        (r["k"], r["n_rows"]) for r in spark.read.parquet(mart).collect()
    )
    assert got == [("a", 2), ("b", 2)]


def test_tag_move_restores_stranded_bak_before_moving(spark, tmp_path):
    """tag_snapshot's recovery pre-step (r06 ADVICE): when the previous
    move crashed BETWEEN its two renames (final gone, .bak is the only
    surviving ref), a new move must first restore the .bak — deleting it
    up front would leave NOTHING to fall back to if this move's publish
    rename also fails, losing the tag entirely."""
    from pyspark.sql import functions as F

    from kafka_connect_hdfs_spark.snapshots import (
        commit_snapshot, list_tags, tag_snapshot,
    )

    tbl = str(tmp_path / "tbl")
    df = spark.range(5).withColumn("v", F.col("id") * 2)
    commit_snapshot(spark, df, tbl)  # v1
    commit_snapshot(spark, df, tbl)  # v2
    tag_snapshot(spark, tbl, "rel", version=1)
    fs, Path = _hadoop(spark, tbl)
    final = Path(f"{tbl}/_tags/rel.json")
    bak = Path(f"{tbl}/_tags/.rel.json.bak")
    # simulate a crash between the two renames of a previous move:
    # the ref survives only as .bak
    assert fs.rename(final, bak)
    assert list_tags(spark, tbl) == {"rel": 1}  # resolves through .bak
    # a new move must succeed AND not pass through a window where the
    # .bak was deleted while final is absent
    tag_snapshot(spark, tbl, "rel", version=2)
    assert list_tags(spark, tbl) == {"rel": 2}
    assert not fs.exists(bak)
