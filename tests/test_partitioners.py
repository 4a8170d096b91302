"""Partitioner path-encoding goldens, mirroring the reference's partitioner
tests (partitioner/{Default,Field,TimeBased,Daily,Hourly}PartitionerTest and
avro/TopicPartitionWriterTest expected paths)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from kafka_connect_hdfs_spark.operators.partitioners import (
    DailyPartitioner,
    DefaultPartitioner,
    FieldPartitioner,
    HourlyPartitioner,
    TimeBasedPartitioner,
)


def _encoded(spark, partitioner, rows, schema):
    df = spark.createDataFrame(rows, schema)
    spec = partitioner.apply(df)
    return [r["e"] for r in spec.df.select(spec.encoded.alias("e")).collect()]


def test_default_partitioner(spark):
    # expected path `partition=<kafkaPartition>`: avro/TopicPartitionWriterTest.java:142-147
    got = _encoded(spark, DefaultPartitioner(), [(12,), (0,)], "partition int")
    assert got == ["partition=12", "partition=0"]


def test_field_partitioner_single_and_multi(spark):
    got = _encoded(
        spark, FieldPartitioner(["country"]), [("DE", "BY")], "country string, state string"
    )
    assert got == ["country=DE"]
    # multi-field `country=X/state=Y`: HiveIntegrationAvroTest.java:286-378
    got = _encoded(
        spark,
        FieldPartitioner(["country", "state"]),
        [("US", "CA")],
        "country string, state string",
    )
    assert got == ["country=US/state=CA"]


def test_hourly_partitioner_path(spark):
    # `year=2015/month=02/day=01/hour=03`: partitioner/HourlyPartitionerTest.java:47
    ts = datetime.datetime(2015, 2, 1, 3, 0, 1)
    got = _encoded(spark, HourlyPartitioner("UTC"), [(ts,)], "ts timestamp")
    assert got == ["year=2015/month=02/day=01/hour=03"]


def test_daily_partitioner_path(spark):
    # `year=2014/month=02/day=01`: partitioner/DailyPartitionerTest.java:46
    ts = datetime.datetime(2014, 2, 1, 20, 0, 0)
    got = _encoded(spark, DailyPartitioner("UTC"), [(ts,)], "ts timestamp")
    assert got == ["year=2014/month=02/day=01"]


def test_timebased_floors_in_local_time_dst_edge(spark):
    """TimeUtils.java:26-37 floors in LOCAL wall time; DST edge from
    TimeBasedPartitionerTest.java:50-60: on the spring-forward day in
    America/Los_Angeles, local wall clock skips 02:00-03:00 but flooring
    still tracks the local hour label."""
    part = TimeBasedPartitioner(
        3600 * 1000, "America/Los_Angeles", ("year", "month", "day", "hour"), "ts"
    )
    # 2015-03-08 10:30 UTC = 02:30 PST pre-jump? (PST=UTC-8 -> 02:30 doesn't
    # exist locally; 10:30 UTC is 03:30 PDT after the 02:00 jump)
    ts = datetime.datetime(2015, 3, 8, 10, 30, 0)
    got = _encoded(spark, part, [(ts,)], "ts timestamp")
    assert got == ["year=2015/month=03/day=08/hour=03"]
    # one hour earlier: 09:30 UTC = 01:30 PST
    ts = datetime.datetime(2015, 3, 8, 9, 30, 0)
    got = _encoded(spark, part, [(ts,)], "ts timestamp")
    assert got == ["year=2015/month=03/day=08/hour=01"]


def test_timebased_duration_flooring(spark):
    part = TimeBasedPartitioner(6 * 3600 * 1000, "UTC", ("year", "month", "day", "hour"), "ts")
    ts = datetime.datetime(2020, 6, 15, 17, 59, 59)
    got = _encoded(spark, part, [(ts,)], "ts timestamp")
    assert got == ["year=2020/month=06/day=15/hour=12"]


def test_custom_partitioner_plugin(spark):
    """P7 — any strategy object with .apply(df) -> PartitionSpec plugs in
    (the reference loads Partitioner classes reflectively,
    DataWriter.java:537-558 + PartitionerWrapper :560-588)."""
    from pyspark.sql import functions as F

    from kafka_connect_hdfs_spark.operators.partitioners import PartitionSpec

    class BucketByUserMod:
        def apply(self, df):
            out = df.withColumn("bucket", (F.col("user_id") % 7).cast("int"))
            return PartitionSpec(
                out, ["bucket"],
                F.concat(F.lit("bucket="), F.col("bucket").cast("string")),
            )

    df = spark.createDataFrame([(13,), (7,)], "user_id long")
    spec = BucketByUserMod().apply(df)
    got = sorted(r["e"] for r in spec.df.select(spec.encoded.alias("e")).collect())
    assert got == ["bucket=0", "bucket=6"]
    assert spec.partition_columns == ["bucket"]


def test_partition_columns_are_write_ready(spark):
    """partitionBy columns must exist on the output frame."""
    ts = datetime.datetime(2021, 1, 2, 3, 4, 5)
    spec = HourlyPartitioner("UTC").apply(spark.createDataFrame([(ts,)], "ts timestamp"))
    assert spec.partition_columns == ["year", "month", "day", "hour"]
    row = spec.df.select(*spec.partition_columns).first()
    assert (row["year"], row["month"], row["day"], row["hour"]) == ("2021", "01", "02", "03")
