"""Quickstart: what a kafka-connect-hdfs user writes here instead.

Reference connector properties (config/quickstart-hdfs.properties):
    connector.class=io.confluent.connect.hdfs.HdfsSinkConnector
    topics=test_hdfs
    hdfs.url=hdfs://localhost:9000
    flush.size=3
    format.class=...ParquetFormat
    partitioner.class=...HourlyPartitioner

This engine, same intent::

    python examples/quickstart.py

Runs the batch path on the bundled sample data; swap
``file_replay_source`` for ``kafka_source(spark, "broker:9092", "test_hdfs")``
and ``land`` stays identical (it is the foreachBatch body).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_hdfs_spark import HdfsSinkConfig, get_spark, load_table
from kafka_connect_hdfs_spark.contract_names import (
    land_with_contract_names,
    read_committed,
)
from kafka_connect_hdfs_spark.sources import events_as_kafka_records


def main() -> None:
    spark = get_spark("quickstart")
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="kchs_quickstart_")

    cfg = HdfsSinkConfig(
        url=f"file://{out}",           # hdfs.url — any Hadoop FS URI
        format="parquet",              # format.class
        flush_size=10,                 # flush.size
        partitioner="daily",           # partitioner.class
        timezone="UTC",
    )

    records = events_as_kafka_records(
        load_table(spark, "/root/testdata/sf0.001", "events")
    )
    res = land_with_contract_names(
        spark, records, cfg, topic="test_hdfs", ts_col="ts",
        discard_partial=False,   # keep partial chunks in the demo
    )

    print("committed files:")
    res.manifest.select("encodedPartition", "file_name", "record_count").show(
        5, truncate=False
    )
    back = read_committed(spark, cfg, "test_hdfs")
    print(f"read back {back.count()} committed records from {out}")
    spark.stop()


if __name__ == "__main__":
    main()
