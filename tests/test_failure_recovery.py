"""Fault injection: the reference retries a failed put() after
retry.backoff.ms with buffered records intact (FailureRecoveryTest.java:54-91,
via in-memory storage with switchable failure modes). Spark's analog: a
foreachBatch body that throws fails the batch; on restart from the same
checkpoint the batch REPLAYS with the same data (no loss, no dups).
"""

from __future__ import annotations

import pytest

from kafka_connect_hdfs_spark.config import ConfigException, HdfsSinkConfig
from kafka_connect_hdfs_spark.sources import events_as_kafka_records
from kafka_connect_hdfs_spark.streaming.pipeline import file_replay_source, start_ingest


def test_failed_batch_replays_without_loss(spark, sf_dir, tmp_path):
    from kafka_connect_hdfs_spark.session import load_table

    events = load_table(spark, sf_dir, "events")
    src_dir = f"{tmp_path}/src"
    events.repartition(2).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    cfg = HdfsSinkConfig(
        url=f"file://{tmp_path}/landed", format="parquet", flush_size=1000
    )
    checkpoint = f"{tmp_path}/chk"
    fail_marker = tmp_path / "fail_once"
    fail_marker.write_text("arm")

    def flaky_transform(df):
        # injected failure: first run dies mid-stream (MemoryRecordWriter
        # failure-mode analog); marker removed so the retry succeeds
        if fail_marker.exists():
            fail_marker.unlink()
            raise RuntimeError("injected write failure")
        return events_as_kafka_records(df)

    def run():
        stream = file_replay_source(spark, src_dir, schema, max_files_per_trigger=1)
        q = start_ingest(
            spark, stream, cfg, topic="events", checkpoint_dir=checkpoint,
            ts_col="ts", transform=flaky_transform,
        )
        try:
            q.awaitTermination(120)
        except Exception:
            pass  # first run: injected failure surfaces here
        finally:
            if q.isActive:
                q.stop()

    run()   # fails once
    run()   # retry: replays the failed batch, completes the rest

    landed = spark.read.parquet(f"{tmp_path}/landed/topics/events")
    total = events.count()
    assert landed.count() == total
    assert landed.select("offset").distinct().count() == total


def test_kerberos_config_validation():
    # DataWriter.java:128-140
    with pytest.raises(ConfigException):
        HdfsSinkConfig(hdfs_authentication_kerberos=True)
    HdfsSinkConfig(
        hdfs_authentication_kerberos=True,
        connect_hdfs_principal="connect/host@REALM",
        connect_hdfs_keytab="/etc/security/keytab",
    )
