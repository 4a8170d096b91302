"""Multi-topic landing, path.format parsing, watermarked windowed aggs,
Connect JSON envelope parsing."""

from __future__ import annotations

import datetime as dt
import glob

import pytest
from pyspark.sql import functions as F

from kafka_connect_hdfs_spark.config import HdfsSinkConfig


def test_land_topics_separate_roots(spark, sf_dir, tmp_path):
    from kafka_connect_hdfs_spark.pipeline import land_topics
    from kafka_connect_hdfs_spark.session import load_table
    from kafka_connect_hdfs_spark.sources import events_as_kafka_records

    ev = load_table(spark, sf_dir, "events")
    records = events_as_kafka_records(ev).withColumn(
        "topic",
        F.when(F.col("event_type") == "error", "errors").otherwise("events"),
    )
    cfg = HdfsSinkConfig(url=f"file://{tmp_path}", format="parquet", flush_size=50)
    res = land_topics(spark, records, cfg, discard_partial=False)
    assert set(res) == {"errors", "events"}
    for topic in res:
        files = glob.glob(f"{tmp_path}/topics/{topic}/partition=*/part-*")
        assert files, topic
    total = sum(
        spark.read.parquet(f"{tmp_path}/topics/{t}").count() for t in res
    )
    assert total == ev.count()


def test_time_partitioner_from_path_format(spark):
    from kafka_connect_hdfs_spark.operators.partitioners import TimeBasedPartitioner

    p = TimeBasedPartitioner.from_path_format(
        "'year'=YYYY/'month'=MM/'day'=dd/'hour'=HH", 3600 * 1000, "UTC"
    )
    assert p.components == ("year", "month", "day", "hour")
    df = spark.createDataFrame([(dt.datetime(2015, 2, 1, 3, 0, 1),)], "ts timestamp")
    spec = p.apply(df)
    got = spec.df.select(spec.encoded.alias("e")).first()["e"]
    assert got == "year=2015/month=02/day=01/hour=03"
    with pytest.raises(ValueError):
        TimeBasedPartitioner.from_path_format("'q'=QQ", 1000)


def test_windowed_counts_batch_equals_plain_groupby(spark, sf_dir):
    from kafka_connect_hdfs_spark.session import load_table
    from kafka_connect_hdfs_spark.streaming.windowed import windowed_event_counts

    ev = load_table(spark, sf_dir, "events")
    got = windowed_event_counts(ev).agg(
        F.sum("n_events").alias("n"), F.count("*").alias("groups")
    ).first()
    assert got["n"] == ev.count()


def test_windowed_counts_streaming_append(spark, sf_dir, tmp_path):
    from kafka_connect_hdfs_spark.session import load_table
    from kafka_connect_hdfs_spark.streaming.windowed import windowed_event_counts

    ev = load_table(spark, sf_dir, "events")
    src = f"{tmp_path}/src"
    ev.repartition(2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-finalized windows; every emitted row
    # must match the batch result exactly
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in windowed_event_counts(ev).collect()
    }
    emitted = spark.sql("SELECT * FROM win_out").collect()
    assert emitted, "watermark should have finalized at least one window"
    for r in emitted:
        assert batch[(r.window_start, r.event_type)] == (r.n_events, r.total_value)


def test_connect_json_envelope_parsing(spark):
    """FIXTURES.md §4: schemaless JSON with {"schema":..., "payload":...}
    envelope (json/DataWriterJsonTest.java:98-127) parsed via from_json."""
    from pyspark.sql.types import (
        BooleanType, IntegerType, LongType, StringType, StructField, StructType,
    )

    payload_schema = StructType([
        StructField("booleanField", BooleanType(), True),
        StructField("intField", IntegerType(), True),
        StructField("longField", LongType(), True),
        StructField("stringField", StringType(), False),
    ])
    envelope_schema = StructType([
        StructField("schema", StringType(), True),   # carried, not enforced
        StructField("payload", payload_schema, True),
    ])
    raw = spark.createDataFrame(
        [(
            '{"schema": {"type": "struct"}, '
            '"payload": {"booleanField": true, "intField": 12, '
            '"longField": 12, "stringField": "a string"}}',
        )],
        "value string",
    )
    parsed = raw.select(
        F.from_json("value", envelope_schema).alias("env")
    ).select("env.payload.*")
    r = parsed.first()
    assert (r.booleanField, r.intField, r.longField, r.stringField) == (
        True, 12, 12, "a string"
    )
