"""Streaming ingest: file-replay source → foreachBatch(land) → checkpointed
exactly-once (SURVEY.md §2.5 mapping: WAL → checkpoint + file-sink commit)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from kafka_connect_hdfs_spark.config import HdfsSinkConfig
from kafka_connect_hdfs_spark.sources import events_as_kafka_records
from kafka_connect_hdfs_spark.streaming.pipeline import file_replay_source, start_ingest


def test_stream_ingest_and_recovery(spark, sf_dir, tmp_path):
    from kafka_connect_hdfs_spark.session import load_table

    events = load_table(spark, sf_dir, "events")
    src_dir = f"{tmp_path}/src"
    # split source into several files so the stream sees multiple batches
    events.repartition(4).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    cfg = HdfsSinkConfig(
        url=f"file://{tmp_path}/landed", format="parquet", flush_size=1000,
        partitioner="default",
    )
    checkpoint = f"{tmp_path}/chk"

    def run():
        stream = file_replay_source(spark, src_dir, schema, max_files_per_trigger=1)
        q = start_ingest(
            spark,
            stream,
            cfg,
            topic="events",
            checkpoint_dir=checkpoint,
            ts_col="ts",
            transform=lambda df: events_as_kafka_records(df),
        )
        q.awaitTermination(120)
        return q

    run()
    landed = spark.read.parquet(f"{tmp_path}/landed/topics/events")
    total = events.count()
    assert landed.count() == total

    # restart against the same checkpoint: no new data -> no duplicates (S2/W2)
    run()
    landed2 = spark.read.parquet(f"{tmp_path}/landed/topics/events")
    assert landed2.count() == total
    # offsets are unique end-to-end (exactly-once at record granularity)
    assert landed2.select("offset").distinct().count() == total
    # checkpoint recorded commits
    assert glob.glob(f"{checkpoint}/commits/*")
