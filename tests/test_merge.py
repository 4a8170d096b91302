"""MERGE (upsert) over a partitioned landing: correctness, partition
isolation (untouched dirs byte-identical), idempotent re-run."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from kafka_connect_hdfs_spark.merge import merge_upsert
from kafka_connect_hdfs_spark.session import load_table


def _land(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 600)
    path = f"{tmp_path}/t"
    ev.write.partitionBy("event_type").parquet(path)
    return ev, path


def _inode_map(path):
    return {
        f: (os.stat(f).st_ino, os.stat(f).st_mtime_ns)
        for f in glob.glob(f"{path}/*/*.parquet")
    }


def test_merge_updates_inserts_and_isolates_partitions(spark, sf_dir, tmp_path):
    ev, path = _land(spark, sf_dir, tmp_path)
    types = sorted(r[0] for r in ev.select("event_type").distinct().collect())
    touched, untouched = types[0], types[1:]

    base = ev.filter(F.col("event_type") == touched)
    updates = base.filter(F.col("event_id") % 3 == 0).withColumn(
        "value", F.col("value") + 1000.0
    )
    inserts = (
        load_table(spark, sf_dir, "events")
        .filter((F.col("event_id") >= 600) & (F.col("event_id") < 650))
        .withColumn("event_type", F.lit(touched))
    )
    batch = updates.unionByName(inserts.select(*updates.columns))

    before = _inode_map(path)
    stats = merge_upsert(spark, path, batch, key_col="event_id",
                         partition_col="event_type")
    assert stats["n_partitions_touched"] == 1
    assert stats["n_update_rows"] == batch.count()

    after = _inode_map(path)
    for f, sig in before.items():
        part = f.split("event_type=")[1].split("/")[0]
        if part in untouched:
            assert after.get(f) == sig, f"untouched file rewritten: {f}"

    back = spark.read.parquet(path)
    # updated rows carry the new value
    upd_back = back.filter(
        (F.col("event_type") == touched) & (F.col("event_id") % 3 == 0)
        & (F.col("event_id") < 600)
    )
    assert upd_back.filter(F.col("value") < 1000.0).count() == 0
    # inserts arrived exactly once; non-updated rows intact
    assert back.count() == ev.count() + inserts.count()
    assert (
        back.filter((F.col("event_id") >= 600) & (F.col("event_id") < 650)).count()
        == inserts.count()
    )


def test_merge_rerun_is_idempotent(spark, sf_dir, tmp_path):
    ev, path = _land(spark, sf_dir, tmp_path)
    t0 = sorted(r[0] for r in ev.select("event_type").distinct().collect())[0]
    batch = (
        ev.filter((F.col("event_type") == t0) & (F.col("event_id") % 7 == 0))
        .withColumn("value", F.lit(-1.0))
    )
    merge_upsert(spark, path, batch, "event_id", "event_type")
    first = sorted(
        (r["event_id"], r["value"]) for r in spark.read.parquet(path).collect()
    )
    merge_upsert(spark, path, batch, "event_id", "event_type")
    second = sorted(
        (r["event_id"], r["value"]) for r in spark.read.parquet(path).collect()
    )
    assert first == second


def test_merge_recovers_crash_between_swap_renames(spark, sf_dir, tmp_path):
    """Crash window: rename(live→old) succeeded, rename(staged→live) did
    not. The partition's live dir is gone and only .<leaf>__merge_old holds
    its rows. A re-run must restore the backup BEFORE computing the merged
    state — otherwise the partition's non-updated rows are lost forever."""
    ev, path = _land(spark, sf_dir, tmp_path)
    t0 = sorted(r[0] for r in ev.select("event_type").distinct().collect())[0]
    expected_partition = ev.filter(F.col("event_type") == t0).count()

    # simulate the mid-swap crash state
    leaf = f"event_type={t0}"
    os.rename(f"{path}/{leaf}", f"{path}/.{leaf}__merge_old")
    assert not os.path.exists(f"{path}/{leaf}")

    batch = (
        ev.filter((F.col("event_type") == t0) & (F.col("event_id") % 7 == 0))
        .withColumn("value", F.lit(-1.0))
    )
    merge_upsert(spark, path, batch, "event_id", "event_type")

    back = spark.read.parquet(path).filter(F.col("event_type") == t0)
    assert back.count() == expected_partition  # non-updated rows survived
    assert back.filter(F.col("event_id") % 7 == 0).filter(
        F.col("value") != -1.0
    ).count() == 0
    assert glob.glob(f"{path}/.*__merge_old") == []  # backup consumed


def test_merge_drops_stale_backup_when_live_exists(spark, sf_dir, tmp_path):
    """Crash AFTER the swap completed but before backup cleanup: live dir is
    current, .<leaf>__merge_old is residue — the next run must drop it and
    merge normally."""
    import shutil

    ev, path = _land(spark, sf_dir, tmp_path)
    t0 = sorted(r[0] for r in ev.select("event_type").distinct().collect())[0]
    leaf = f"event_type={t0}"
    shutil.copytree(f"{path}/{leaf}", f"{path}/.{leaf}__merge_old")

    batch = (
        ev.filter((F.col("event_type") == t0) & (F.col("event_id") % 5 == 0))
        .withColumn("value", F.lit(-2.0))
    )
    merge_upsert(spark, path, batch, "event_id", "event_type")

    assert glob.glob(f"{path}/.*__merge_old") == []
    back = spark.read.parquet(path)
    assert back.count() == ev.count()


def test_streaming_foreachbatch_merge_upsert(spark, sf_dir, tmp_path):
    """Continuous CDC ingestion: a change stream applied micro-batch by
    micro-batch via merge_upsert in foreachBatch. Last-writer-wins per key
    must hold across batches — the final table equals applying the batches
    in order (later file = later batch because maxFilesPerTrigger=1 replays
    them in file order)."""
    from pyspark.sql import functions as SF

    ev, path = _land(spark, sf_dir, tmp_path)
    t0 = sorted(r[0] for r in ev.select("event_type").distinct().collect())[0]

    # two change batches touching the same keys with different values
    base = ev.filter(SF.col("event_type") == t0)
    b1 = base.filter(SF.col("event_id") % 4 == 0).withColumn("value", SF.lit(1.0))
    b2 = base.filter(SF.col("event_id") % 8 == 0).withColumn("value", SF.lit(2.0))
    src = f"{tmp_path}/changes"
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    files = sorted(__import__("glob").glob(f"{src}/*.parquet"))
    assert len(files) == 2

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )

    def apply_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        merge_upsert(
            batch_df.sparkSession, path, batch_df,
            key_col="event_id", partition_col="event_type",
        )

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", f"{tmp_path}/chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    back = spark.read.parquet(path).filter(SF.col("event_type") == t0)
    got = {r["event_id"]: r["value"] for r in back.collect()}
    for r in base.collect():
        eid = r["event_id"]
        want = 2.0 if eid % 8 == 0 else (1.0 if eid % 4 == 0 else r["value"])
        assert got[eid] == want, eid
    # no rows gained or lost
    assert back.count() == base.count()


def test_merge_handles_escaped_partition_values(spark, tmp_path):
    """Partition values with path-hostile characters: Spark escapes them in
    directory names; the swap must follow the ESCAPED names."""
    from pyspark.sql import functions as SF

    tbl = spark.createDataFrame(
        [(1, "a b:c", 1.0), (2, "plain", 1.0), (3, "a b:c", 1.0)],
        "id long, part string, value double",
    )
    path = f"{tmp_path}/esc"
    tbl.write.partitionBy("part").parquet(path)
    updates = spark.createDataFrame(
        [(1, "a b:c", 9.0), (4, "a b:c", 9.0)], "id long, part string, value double"
    )
    stats = merge_upsert(spark, path, updates, key_col="id", partition_col="part")
    assert stats["n_partitions_touched"] == 1
    back = {r["id"]: (r["part"], r["value"]) for r in spark.read.parquet(path).collect()}
    assert back == {
        1: ("a b:c", 9.0), 2: ("plain", 1.0), 3: ("a b:c", 1.0), 4: ("a b:c", 9.0),
    }


def test_refresh_aggregate_equals_full_recompute(spark, sf_dir):
    from pyspark.sql import functions as F

    from kafka_connect_hdfs_spark.merge import refresh_aggregate
    from kafka_connect_hdfs_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    base = ev.filter(F.col("event_id") % 5 != 0)
    delta = ev.filter(F.col("event_id") % 5 == 0)
    base_agg = base.groupBy("event_type", "day").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
    )
    got = {
        (r["event_type"], str(r["day"])): (r["n_rows"], r["total_value"])
        for r in refresh_aggregate(
            base_agg, delta, ["event_type", "day"],
            sum_cols={"value": "total_value"},
        ).collect()
    }
    want = {
        (r["event_type"], str(r["day"])): (r["n_rows"], r["total_value"])
        for r in ev.groupBy("event_type", "day")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        )
        .collect()
    }
    assert got == want


def test_refresh_aggregate_new_keys_and_empty_delta(spark):
    from pyspark.sql import functions as F

    from kafka_connect_hdfs_spark.merge import refresh_aggregate

    base_rows = spark.createDataFrame(
        [("a", 2, 10.0), ("b", 1, 5.0)], "k string, n_rows long, v double"
    ).select(
        "k",
        "n_rows",
        F.col("v").cast("decimal(18,2)").alias("total_v"),
    )
    # delta introduces a brand-new key c and augments a
    delta = spark.createDataFrame(
        [("a", 1.5), ("c", 2.0), ("c", 3.0)], "k string, value double"
    )
    got = {
        r["k"]: (r["n_rows"], float(r["total_v"]))
        for r in refresh_aggregate(
            base_rows, delta, ["k"], sum_cols={"value": "total_v"}
        ).collect()
    }
    assert got == {"a": (3, 11.5), "b": (1, 5.0), "c": (2, 5.0)}
    # empty delta: the mart passes through unchanged
    empty = delta.filter(F.lit(False))
    same = {
        r["k"]: (r["n_rows"], float(r["total_v"]))
        for r in refresh_aggregate(
            base_rows, empty, ["k"], sum_cols={"value": "total_v"}
        ).collect()
    }
    assert same == {"a": (2, 10.0), "b": (1, 5.0)}


def test_cube_profile_levels_and_plan(spark, sf_dir):
    from pyspark.sql import functions as F

    from kafka_connect_hdfs_spark.operators.quality import cube_profile
    from kafka_connect_hdfs_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    out = cube_profile(ev, ["event_type", "day"], value_col="value")
    rows = out.collect()
    by_gid: dict = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    # 4 grouping sets: cells(0), day-marginal rolled up (1), type-marginal
    # rolled up (2), grand total (3)
    assert set(by_gid) == {0, 1, 2, 3}
    assert len(by_gid[3]) == 1
    total = ev.count()
    assert by_gid[3][0]["n_rows"] == total
    assert sum(r["n_rows"] for r in by_gid[0]) == total
    assert sum(r["n_rows"] for r in by_gid[1]) == total
    assert sum(r["n_rows"] for r in by_gid[2]) == total
    # one-pass shape: a single Expand, no extra shuffles beyond the agg
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") >= 1
    assert plan.count("Exchange") <= 2  # partial agg + AQE reads
