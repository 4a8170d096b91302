"""End-to-end ingest: land + read-back verification, the reference's dominant
test pattern (TestWithMiniDFSCluster.verify(), :266-359: list files, compare
names, read back, compare records)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from kafka_connect_hdfs_spark.config import HdfsSinkConfig
from kafka_connect_hdfs_spark.pipeline import ingest_batch, land
from kafka_connect_hdfs_spark.sources import events_as_kafka_records


@pytest.fixture()
def records(spark, sf_dir):
    from kafka_connect_hdfs_spark.session import load_table

    return events_as_kafka_records(load_table(spark, sf_dir, "events"))


def test_ingest_batch_manifest_covers_all_committed(spark, records):
    cfg = HdfsSinkConfig(flush_size=100, partitioner="default")
    res = ingest_batch(records, cfg, topic="events", ts_col="ts")
    m = res.manifest.collect()
    assert all(r.record_count == 100 for r in m)
    # offset ranges must not overlap within a partition dir
    for part in {r.partition for r in m}:
        ranges = sorted(
            (r.start_offset, r.end_offset) for r in m if r.partition == part
        )
        for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
            assert e1 < s2
    assert res.data.count() == 100 * len(m)


def test_land_parquet_roundtrip(spark, records, tmp_path):
    cfg = HdfsSinkConfig(
        url=f"file://{tmp_path}", format="parquet", flush_size=50,
        partitioner="field", partition_fields=["event_type"],
    )
    res = land(spark, records, cfg, topic="events", ts_col="ts", discard_partial=False)
    base = f"{tmp_path}/topics/events"
    dirs = {os.path.basename(p) for p in glob.glob(f"{base}/*") if os.path.isdir(p)}
    assert dirs == {
        f"event_type={r['event_type']}"
        for r in records.select("event_type").distinct().collect()
    }
    back = spark.read.parquet(base)
    assert back.count() == records.count()
    # per-dir record counts match the source grouping
    src = {r["event_type"]: r["n"] for r in
           records.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    got = {r["event_type"]: r["n"] for r in
           back.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert got == src


def test_land_discards_partial_chunks(spark, records, tmp_path):
    cfg = HdfsSinkConfig(url=f"file://{tmp_path}", format="parquet", flush_size=100)
    res = land(spark, records, cfg, topic="events", ts_col="ts", discard_partial=True)
    back = spark.read.parquet(f"{tmp_path}/topics/events")
    # only full 100-record chunks are committed (F6 discard semantics)
    assert back.count() % 100 == 0
    assert back.count() < records.count()  # tails were discarded
    assert back.count() == res.manifest.agg(F.sum("record_count")).first()[0]


def test_json_and_text_sinks(spark, records, tmp_path):
    for fmt in ("json", "text"):
        cfg = HdfsSinkConfig(
            url=f"file://{tmp_path}/{fmt}", format=fmt, flush_size=500,
            partitioner="default",
        )
        land(spark, records, cfg, topic="events", ts_col="ts", discard_partial=False)
        files = glob.glob(f"{tmp_path}/{fmt}/topics/events/partition=*/part-*")
        assert files, fmt


def test_orc_sink_roundtrip(spark, records, tmp_path):
    cfg = HdfsSinkConfig(
        url=f"file://{tmp_path}", format="orc", flush_size=100,
        partitioner="default",
    )
    land(spark, records, cfg, topic="events", ts_col="ts", discard_partial=False)
    back = spark.read.orc(f"{tmp_path}/topics/events")
    assert back.count() == records.count()
    assert set(back.columns) == set(records.columns)


def test_landed_table_partition_pruning(spark, records, tmp_path):
    """Reading a landed partitioned table with a partition filter must prune
    directories (the read-side payoff of Hive-style layout, SURVEY.md §4)."""
    cfg = HdfsSinkConfig(
        url=f"file://{tmp_path}", format="parquet", flush_size=100,
        partitioner="field", partition_fields=["event_type"],
    )
    land(spark, records, cfg, topic="events", ts_col="ts", discard_partial=False)
    df = spark.read.parquet(f"{tmp_path}/topics/events").filter(
        F.col("event_type") == "purchase"
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters: [isnotnull(event_type" in plan


def test_avro_sink_roundtrip(spark, records, tmp_path):
    """O1: avro landing via the pure-Python container writer (no spark-avro
    needed); read back through the same sink (JVM reader covered separately
    in test_avro_format.py when the datasource exists)."""
    from kafka_connect_hdfs_spark.sinks import build_sink

    cfg = HdfsSinkConfig(url=f"file://{tmp_path}", format="avro", flush_size=500)
    land(spark, records.drop("props"), cfg, topic="events", ts_col="ts",
         discard_partial=False)
    back = build_sink(cfg).read(spark, f"{tmp_path}/topics/events")
    assert back.count() == records.count()


def test_register_external_table(spark, records, tmp_path):
    cfg = HdfsSinkConfig(
        url=f"file://{tmp_path}", format="parquet", flush_size=100,
        partitioner="field", partition_fields=["event_type"],
    )
    land(spark, records, cfg, topic="events", ts_col="ts",
         discard_partial=False, register_table=True)
    n = spark.sql("SELECT count(*) AS n FROM default.`events`").first()["n"]
    assert n == records.count()
    parts = spark.sql("SHOW PARTITIONS default.`events`").count()
    assert parts == records.select("event_type").distinct().count()


def test_backfill_replaces_only_touched_partitions(spark, records, tmp_path):
    """Backfill semantics: re-landing a corrected slice for one partition
    value replaces that directory's content and leaves every other
    partition's files byte-untouched (same paths, same mtimes)."""
    from kafka_connect_hdfs_spark.pipeline import backfill

    cfg = HdfsSinkConfig(
        url=f"file://{tmp_path}", format="parquet", flush_size=50,
        partitioner="field", partition_fields=["event_type"],
    )
    land(spark, records, cfg, topic="events", ts_col="ts", discard_partial=False)
    base = f"{tmp_path}/topics/events"
    types = sorted(
        r.event_type for r in records.select("event_type").distinct().collect()
    )
    target, others = types[0], types[1:]
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{base}/**/*.parquet", recursive=True)
    }

    # corrected slice: double the value column for the target partition
    fixed = records.filter(F.col("event_type") == target).withColumn(
        "value", F.col("value") * 2
    )
    backfill(spark, fixed, cfg, topic="events", ts_col="ts")

    # untouched partitions: identical file sets and mtimes
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{base}/**/*.parquet", recursive=True)
    }
    for p, mt in before.items():
        if f"event_type={target}" not in p:
            assert p in after and after[p] == mt, p
    # target partition: replaced content (doubled values), same row count
    back = spark.read.parquet(base)
    src = records.withColumn(
        "value",
        F.when(F.col("event_type") == target, F.col("value") * 2).otherwise(
            F.col("value")
        ),
    )
    assert back.count() == src.count()
    exp = src.groupBy("event_type").agg(
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2).alias("s")
    )
    got = back.groupBy("event_type").agg(
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2).alias("s")
    )
    assert {(r.event_type, r.s) for r in exp.collect()} == {
        (r.event_type, r.s) for r in got.collect()
    }


def test_backfill_avro_pure_python_path(spark, records, tmp_path):
    """Avro backfill without spark-avro: touched dirs cleared and re-landed
    through the container codec; untouched dirs keep their files."""
    from kafka_connect_hdfs_spark.pipeline import backfill
    from kafka_connect_hdfs_spark.sinks import build_sink, jvm_avro_available

    if jvm_avro_available(spark):
        pytest.skip("JVM avro present — native dynamic overwrite covers this")
    cfg = HdfsSinkConfig(
        url=f"file://{tmp_path}", format="avro", flush_size=50,
        partitioner="field", partition_fields=["event_type"],
    )
    small = records.filter(F.col("event_id") < 1000)
    land(spark, small, cfg, topic="events", ts_col="ts", discard_partial=False)
    base = f"{tmp_path}/topics/events"
    types = sorted(
        r.event_type for r in small.select("event_type").distinct().collect()
    )
    target = types[0]
    before_other = {
        p for p in glob.glob(f"{base}/**/*.avro", recursive=True)
        if f"event_type={target}" not in p
    }
    fixed = small.filter(F.col("event_type") == target)
    backfill(spark, fixed, cfg, topic="events", ts_col="ts")
    after_other = {
        p for p in glob.glob(f"{base}/**/*.avro", recursive=True)
        if f"event_type={target}" not in p
    }
    assert before_other == after_other
    back = build_sink(cfg).read(spark, base)
    assert back.filter(F.col("event_type") == target).count() == fixed.count()
