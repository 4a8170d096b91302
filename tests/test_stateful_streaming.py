"""Custom stateful streaming operator (applyInPandasWithState sessionizer)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_hdfs_spark.streaming.stateful import streaming_sessionize


def test_streaming_sessionize_closes_gap_sessions(spark, sf_dir, tmp_path):
    from kafka_connect_hdfs_spark.session import load_table

    events = load_table(spark, sf_dir, "events")
    src = f"{tmp_path}/src"
    events.select("user_id", "ts", "value").coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    sessions = streaming_sessionize(stream)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("update")
        .option("checkpointLocation", f"{tmp_path}/chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sessions_out")

    # compare closed (gap) sessions against the batch sessionizer:
    # every closed session must equal a batch session of the same user/start
    from kafka_connect_hdfs_spark.plans.analytics2 import q_sessionize

    batch = q_sessionize(spark, "/root/testdata/sf0.001")
    b = {
        (r.user_id, r.session_start): (r.n_events, r.session_end)
        for r in batch.collect()
    }
    closed = got.filter(F.col("closed_by") == "gap").collect()
    assert closed, "expected at least one gap-closed session"
    for r in closed:
        key = (r.user_id, r.session_start)
        assert key in b, f"streaming session {key} missing from batch result"
        n_events, session_end = b[key]
        assert r.n_events == n_events
        assert r.session_end == session_end
