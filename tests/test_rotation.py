"""Rotation & filename-contract goldens.

Reference goldens: flush.size=3 with 7 records → files [0-2],[3-5], tail
discarded (DataWriterAvroTest.java:62-77); committed name format
FileUtils.java:77-100 / docs/hdfs_connector.rst:109-110; midnight-anchored
scheduled rotation DateTimeUtilsTest.java:23-41.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from kafka_connect_hdfs_spark.operators.rotation import (
    chunk_file_manifest,
    next_scheduled_rotation,
    size_based_chunks,
)


def _records(spark, n, partition=0, start=0):
    rows = [(partition, start + i) for i in range(n)]
    return spark.createDataFrame(rows, "partition int, offset long")


def test_flush_size_3_with_7_records(spark):
    # DataWriterAvroTest.java:62-77: files [0-2], [3-5]; 6 discarded
    df = _records(spark, 7)
    chunked = size_based_chunks(df, F.lit("partition=0"), flush_size=3)
    manifest = chunk_file_manifest(chunked, "test_hdfs", ".avro").orderBy("chunk")
    rows = manifest.collect()
    assert [(r.start_offset, r.end_offset, r.record_count) for r in rows] == [
        (0, 2, 3),
        (3, 5, 3),
    ]
    assert rows[0].file_name == "test_hdfs+0+0000000000+0000000002.avro"
    assert rows[1].file_name == "test_hdfs+0+0000000003+0000000005.avro"


def test_discard_partial_false_keeps_tail(spark):
    df = _records(spark, 7)
    chunked = size_based_chunks(df, F.lit("partition=0"), 3, discard_partial=False)
    manifest = chunk_file_manifest(chunked, "t", ".parquet").orderBy("chunk")
    rows = manifest.collect()
    assert [(r.start_offset, r.end_offset, r.record_count) for r in rows] == [
        (0, 2, 3),
        (3, 5, 3),
        (6, 6, 1),
    ]


def test_nonzero_start_offsets(spark):
    # non-zero starting offsets tested in DataWriterAvroTest.java:205-219
    df = _records(spark, 6, partition=2, start=100)
    chunked = size_based_chunks(df, F.lit("partition=2"), 3)
    rows = chunk_file_manifest(chunked, "topic.with.dots", ".parquet").orderBy("chunk").collect()
    assert rows[0].file_name == "topic.with.dots+2+0000000100+0000000102.parquet"
    assert rows[1].file_name == "topic.with.dots+2+0000000103+0000000105.parquet"


def test_chunks_are_per_partition_and_per_dir(spark):
    rows = [(p, o) for p in (0, 1) for o in range(4)]
    df = spark.createDataFrame(rows, "partition int, offset long")
    enc = F.concat(F.lit("partition="), F.col("partition").cast("string"))
    chunked = size_based_chunks(df, enc, 2)
    m = chunk_file_manifest(chunked, "t", ".x").orderBy("partition", "chunk").collect()
    assert [(r.partition, r.chunk, r.start_offset, r.end_offset) for r in m] == [
        (0, 0, 0, 1),
        (0, 1, 2, 3),
        (1, 0, 0, 1),
        (1, 1, 2, 3),
    ]


def test_next_scheduled_rotation_midnight_anchor():
    """DateTimeUtilsTest.java:23-41 semantics: fire times are local midnight
    + k*interval, next strictly after now."""
    tz = "America/Los_Angeles"
    now = datetime.datetime(2020, 6, 15, 0, 10, 0)  # naive local == LA wall here
    import zoneinfo

    la = zoneinfo.ZoneInfo(tz)
    now_la = now.replace(tzinfo=la)
    fire = next_scheduled_rotation(now_la, 60 * 60 * 1000, tz)
    assert fire.astimezone(la).hour == 1 and fire.astimezone(la).minute == 0
    # exactly on a boundary -> strictly next
    on_boundary = datetime.datetime(2020, 6, 15, 1, 0, 0, tzinfo=la)
    fire2 = next_scheduled_rotation(on_boundary, 60 * 60 * 1000, tz)
    assert fire2.astimezone(la).hour == 2
    # interval not dividing the day still anchors at midnight: 7h interval at
    # 15:30 -> fires at 0,7,14,21 -> next 21:00
    at_1530 = datetime.datetime(2020, 6, 15, 15, 30, 0, tzinfo=la)
    fire3 = next_scheduled_rotation(at_1530, 7 * 60 * 60 * 1000, tz)
    assert fire3.astimezone(la).hour == 21
