"""relayout_partitions REBALANCE behavior (r13 VERDICT item 3): the
clustering exchange before the partitionBy write must keep output file
counts O(keys) on multi-split input — and must be SKIPPED when the scan
plans a single split (1 task × keys is already O(keys), so the exchange
would be pure overhead at small scale)."""

from __future__ import annotations


def _day_files(root):
    import os

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        data = [f for f in files if not f.startswith((".", "_"))]
        if data and os.path.basename(dirpath).startswith("day="):
            out[os.path.basename(dirpath)] = len(data)
    return out


def test_maybe_rebalance_skips_single_split(spark, tmp_path):
    from kafka_connect_hdfs_spark.compaction import _maybe_rebalance

    p = str(tmp_path / "one")
    spark.range(100).selectExpr(
        "id", "cast(id % 3 as string) as day"
    ).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    # single split: identity (no hint node added)
    assert _maybe_rebalance(df, ["day"]) is df


def test_relayout_rebalance_bounds_files_on_multisplit_skewed_input(
    spark, tmp_path
):
    from kafka_connect_hdfs_spark.compaction import (
        _maybe_rebalance, relayout_partitions,
    )

    path = str(tmp_path / "t")
    # one dominant key (90 % of rows in day=d0) over many input files:
    # without the clustering exchange every task holding d0 rows emits
    # its own file into day=d0 — tasks × keys output files
    df = spark.createDataFrame(
        [
            (i, "click" if i % 2 else "view", f"d{0 if i < 90 else i % 3}")
            for i in range(100)
        ],
        "event_id long, event_type string, day string",
    )
    df.repartition(8).write.partitionBy("event_type").parquet(path)

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1k")
    try:
        probe = spark.read.parquet(path)
        # the tiny split size makes the scan genuinely multi-split, so
        # the conditional hint FIRES on this input
        assert probe.rdd.getNumPartitions() > 1
        assert _maybe_rebalance(probe, ["day"]) is not probe
        out = relayout_partitions(spark, path, ["day"])
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    assert out and all(k.startswith("day=") for k in out)
    per_day = _day_files(str(tmp_path / "t"))
    assert set(per_day) == {"day=d0", "day=d1", "day=d2"}
    # O(keys): the dominant key collapses to a handful of clustered
    # files (AQE may split an oversized key, hence <= 2, not == 1),
    # instead of one file per scan task that held a d0 row
    assert all(n <= 2 for n in per_day.values()), per_day
    back = spark.read.parquet(path)
    assert back.count() == 100
    # 90 dominant rows plus i ∈ {90, 93, 96, 99} from the i % 3 tail
    assert back.filter("day = 'd0'").count() == 94
