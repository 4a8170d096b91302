"""P6 timestamp extractors, S3 schema source, H2 alter schema, O5 readers."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kafka_connect_hdfs_spark.config import HdfsSinkConfig
from kafka_connect_hdfs_spark.operators.partitioners import extract_timestamp


def test_timestamp_extractor_record_field(spark):
    # RecordField (`timestamp.field`) — TopicPartitionWriter.java:174-185
    cfg = HdfsSinkConfig(timestamp_extractor="RecordField", timestamp_field="ts")
    df = spark.createDataFrame(
        [(dt.datetime(2020, 1, 2, 3, 4, 5),)], "ts timestamp"
    ).withColumn("extracted", extract_timestamp(cfg))
    assert df.first()["extracted"] == dt.datetime(2020, 1, 2, 3, 4, 5)


def test_timestamp_extractor_record(spark):
    # Record = the Kafka record timestamp column
    cfg = HdfsSinkConfig(timestamp_extractor="Record")
    df = spark.createDataFrame(
        [(dt.datetime(2021, 5, 6),)], "timestamp timestamp"
    ).withColumn("extracted", extract_timestamp(cfg))
    assert df.first()["extracted"] == dt.datetime(2021, 5, 6)


def test_timestamp_extractor_wallclock_injectable(spark):
    # Wallclock takes `now` as a parameter (MockTime pattern,
    # avro/TopicPartitionWriterTest.java:82) — never the real clock in tests
    cfg = HdfsSinkConfig(timestamp_extractor="Wallclock")
    df = spark.range(1).withColumn(
        "extracted", extract_timestamp(cfg, now="2022-02-02 00:00:00")
    )
    assert df.first()["extracted"] == dt.datetime(2022, 2, 2)


def test_schema_source_stream_alternates_versions(spark, tmp_path):
    # S3 — tools/SchemaSourceTask alternating v1/v2 (FIXTURES.md §1-2)
    from kafka_connect_hdfs_spark.sources import schema_source_stream

    src = schema_source_stream(spark, rows_per_second=100)
    q = (
        src.writeStream.format("memory")
        .queryName("schema_src")
        .option("checkpointLocation", f"{tmp_path}/chk")
        .trigger(processingTime="1 second")
        .start()
    )
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        n = spark.sql("SELECT count(*) AS n FROM schema_src").first()["n"]
        if n >= 4:
            break
        time.sleep(1)
    q.stop()
    rows = spark.sql("SELECT * FROM schema_src ORDER BY offset").collect()
    assert len(rows) >= 4
    for r in rows:
        if r.schema_version == 1:
            assert r.string is None
        else:
            assert r.string == "abc"
        assert r.long == 16 and abs(r.double - 12.2) < 1e-9


def test_alter_table_schema_adds_columns(spark, sf_dir, tmp_path):
    from kafka_connect_hdfs_spark.pipeline import alter_table_schema, land
    from kafka_connect_hdfs_spark.session import load_table
    from kafka_connect_hdfs_spark.sources import events_as_kafka_records

    records = events_as_kafka_records(load_table(spark, sf_dir, "events"))
    cfg = HdfsSinkConfig(
        url=f"file://{tmp_path}", format="parquet", flush_size=100,
        partitioner="default", compatibility="BACKWARD", hive_integration=True,
    )
    land(spark, records, cfg, topic="evolve_topic", ts_col="ts",
         discard_partial=False, register_table=True)
    alter_table_schema(spark, cfg, "evolve_topic", {"new_field": "string"})
    cols = [f.name for f in spark.table("default.`evolve_topic`").schema.fields]
    assert "new_field" in cols
    # idempotent: re-adding existing columns is a no-op
    alter_table_schema(spark, cfg, "evolve_topic", {"new_field": "string"})


def test_schema_file_reader_recovers_schema(spark, sf_dir, tmp_path):
    # O5 — recover the landed schema from committed files
    from kafka_connect_hdfs_spark.sinks import build_sink

    cfg = HdfsSinkConfig(format="parquet")
    sink = build_sink(cfg)
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    sink.write(df, f"{tmp_path}/out", [])
    schema = sink.schema_of(spark, f"{tmp_path}/out")
    assert [f.name for f in schema.fields] == ["id", "s"]


def test_avro_schema_literal_tracks_evolution(spark, tmp_path):
    """H-avro fidelity (avro/AvroHiveUtil.java:73-97, :62-71): the
    avro.schema.literal property is computed from the LANDED schema and
    replaced after evolution — verified end-to-end on the landed files
    (the DDL attach/replace path needs the JVM avro datasource; the literal
    contract itself is exercised here without it)."""
    import json
    import time

    from kafka_connect_hdfs_spark.pipeline import avro_schema_literal
    from kafka_connect_hdfs_spark.sinks import PurePythonAvroSink

    from pyspark.sql import Row

    sink = PurePythonAvroSink("avro", ".avro", {})
    out = f"{tmp_path}/t"
    v1 = spark.createDataFrame([Row(id=1, name="a")])
    sink.write(v1, out, [])
    lit1 = avro_schema_literal(sink.schema_of(spark, out), [], "my.topic")
    parsed1 = json.loads(lit1)
    assert parsed1["name"] == "my_topic"
    assert [f["name"] for f in parsed1["fields"]] == ["id", "name"]

    time.sleep(0.05)
    v2 = spark.createDataFrame([Row(id=2, name="b", score=1.5)])
    sink.write(v2, out, [])
    lit2 = avro_schema_literal(sink.schema_of(spark, out), [], "my.topic")
    parsed2 = json.loads(lit2)
    assert [f["name"] for f in parsed2["fields"]] == ["id", "name", "score"]
    # partition columns are excluded from the literal (they live in dir layout)
    lit3 = avro_schema_literal(sink.schema_of(spark, out), ["name"], "my.topic")
    assert [f["name"] for f in json.loads(lit3)["fields"]] == ["id", "score"]


def test_avro_table_ddl_attaches_literal(spark, tmp_path):
    """Full H1/H2 avro DDL path — only runnable with the JVM avro
    datasource (real cluster); skipped in this container."""
    import pytest as _pytest

    from kafka_connect_hdfs_spark.sinks import jvm_avro_available

    if not jvm_avro_available(spark):
        _pytest.skip("JVM avro datasource unavailable in this container")
    import json

    from pyspark.sql import Row

    from kafka_connect_hdfs_spark.config import HdfsSinkConfig
    from kafka_connect_hdfs_spark.pipeline import (
        alter_table_schema, register_external_table, table_name_for_topic,
    )

    cfg = HdfsSinkConfig(url=f"file://{tmp_path}", format="avro")
    out = f"{tmp_path}/topics/evt"
    spark.createDataFrame([Row(id=1, name="a")]).write.format("avro").save(out)
    register_external_table(spark, cfg, "evt", [], out)
    table = table_name_for_topic(cfg, "evt")
    props = dict(
        (r.key, r.value)
        for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    )
    lit = json.loads(props["avro.schema.literal"])
    assert [f["name"] for f in lit["fields"]] == ["id", "name"]
    alter_table_schema(spark, cfg, "evt", {"score": "double"})
    props2 = dict(
        (r.key, r.value)
        for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    )
    lit2 = json.loads(props2["avro.schema.literal"])
    assert [f["name"] for f in lit2["fields"]] == ["id", "name", "score"]


def test_replace_table_schema_drops_columns(spark, sf_dir, tmp_path):
    """H2 full REPLACE COLUMNS semantics (parquet/ParquetHiveUtil.java:
    53-59): the new column list replaces the old wholesale — dropped
    columns vanish from the catalog while data files stay untouched, and
    columns the files lack read as NULL."""
    from pyspark.sql import types as T

    from kafka_connect_hdfs_spark.pipeline import (
        land, replace_table_schema, table_name_for_topic,
    )
    from kafka_connect_hdfs_spark.session import load_table
    from kafka_connect_hdfs_spark.sources import events_as_kafka_records

    records = events_as_kafka_records(load_table(spark, sf_dir, "events"))
    cfg = HdfsSinkConfig(
        url=f"file://{tmp_path}", format="parquet", flush_size=100,
        partitioner="default", compatibility="FORWARD", hive_integration=True,
    )
    land(spark, records, cfg, topic="replace_topic", ts_col="ts",
         discard_partial=False, register_table=True)
    tbl = table_name_for_topic(cfg, "replace_topic")
    before = spark.table(tbl)
    old_cols = [f.name for f in before.schema.fields]
    assert "value" in old_cols
    n_before = before.count()
    # forward evolution: newest writer schema DROPS `value`, ADDS `note`
    new_schema = T.StructType(
        [f for f in before.schema.fields
         if f.name not in ("value", "partition")]
        + [T.StructField("note", T.StringType(), True)]
    )
    replace_table_schema(
        spark, cfg, "replace_topic", new_schema, ["partition"],
        f"{tmp_path}/topics/replace_topic",
    )
    after = spark.table(tbl)
    new_cols = [f.name for f in after.schema.fields]
    assert "value" not in new_cols           # dropped from the catalog
    assert "note" in new_cols                # added
    assert after.count() == n_before         # data files untouched
    assert after.where("note IS NOT NULL").count() == 0  # absent -> NULL


def test_replace_table_schema_preserves_partition_type(spark, sf_dir, tmp_path):
    """A payload-only evolution must not silently retype the partition
    column: absent partition cols inherit their CURRENT catalog type
    (r07 review finding)."""
    from pyspark.sql import types as T

    from kafka_connect_hdfs_spark.pipeline import (
        land, replace_table_schema, table_name_for_topic,
    )
    from kafka_connect_hdfs_spark.session import load_table
    from kafka_connect_hdfs_spark.sources import events_as_kafka_records

    records = events_as_kafka_records(load_table(spark, sf_dir, "events"))
    cfg = HdfsSinkConfig(
        url=f"file://{tmp_path}", format="parquet", flush_size=100,
        partitioner="default", compatibility="FORWARD", hive_integration=True,
    )
    land(spark, records, cfg, topic="ptype_topic", ts_col="ts",
         discard_partial=False, register_table=True)
    tbl = table_name_for_topic(cfg, "ptype_topic")
    before = {f.name: f.dataType for f in spark.table(tbl).schema.fields}
    new_schema = T.StructType(
        [f for f in spark.table(tbl).schema.fields
         if f.name not in ("value", "partition")]
    )
    replace_table_schema(
        spark, cfg, "ptype_topic", new_schema, ["partition"],
        f"{tmp_path}/topics/ptype_topic",
    )
    after = {f.name: f.dataType for f in spark.table(tbl).schema.fields}
    assert after["partition"] == before["partition"]  # type preserved
