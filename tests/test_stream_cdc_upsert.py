"""Streaming CDC upsert: per-micro-batch merges must converge to the
batch latest-per-key regardless of how the changelog splits into
batches, and the state swap must be atomic-restorable."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _events(spark):
    rows = [
        (1, dt.datetime(2026, 1, 1, 10, 0), 7, "a", 1.0),
        (2, dt.datetime(2026, 1, 1, 11, 0), 7, "b", 2.0),   # newer for 7
        (3, dt.datetime(2026, 1, 1, 10, 30), 8, "c", 3.0),
        (4, dt.datetime(2026, 1, 1, 10, 30), 8, "d", 4.0),  # ts tie -> id 4
        (5, dt.datetime(2026, 1, 1, 9, 0), 9, "e", 5.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_stream_upsert_matches_batch_latest(spark, tmp_path):
    from kafka_connect_hdfs_spark.streaming.cdc import start_cdc_upsert

    ev = _events(spark)
    src = str(tmp_path / "src")
    # many files -> many micro-batches with maxFilesPerTrigger=1
    ev.repartition(5).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_cdc_upsert(
        stream,
        str(tmp_path / "state"),
        ["user_id"],
        ["ts", "event_id"],
        str(tmp_path / "chk"),
    )
    q.awaitTermination(120)
    state = {
        r["user_id"]: (r["event_type"], r["value"])
        for r in spark.read.parquet(str(tmp_path / "state")).collect()
    }
    assert state == {7: ("b", 2.0), 8: ("d", 4.0), 9: ("e", 5.0)}


def test_stream_upsert_resumes_into_existing_state(spark, tmp_path):
    from kafka_connect_hdfs_spark.streaming.cdc import start_cdc_upsert

    ev = _events(spark)
    src1 = str(tmp_path / "src1")
    src2 = str(tmp_path / "src2")
    ev.filter(F.col("event_id") <= 3).write.parquet(src1)
    ev.filter(F.col("event_id") > 3).write.parquet(src2)
    schema = spark.read.parquet(src1).schema
    state = str(tmp_path / "state")
    for i, src in enumerate((src1, src2)):
        stream = spark.readStream.schema(schema).parquet(src)
        q = start_cdc_upsert(
            stream, state, ["user_id"], ["ts", "event_id"],
            str(tmp_path / f"chk{i}"),
        )
        q.awaitTermination(120)
    got = {
        r["user_id"]: r["event_type"]
        for r in spark.read.parquet(state).collect()
    }
    # event 4 (second run) beats event 3 on the ts tie; user 9 arrives late
    assert got == {7: "b", 8: "d", 9: "e"}
