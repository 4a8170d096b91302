"""Sources (SURVEY.md §2.1): Kafka intake (S1/S2) and replay/test sources (S3).

The Kafka wiring lives in streaming.pipeline (kafka_source); batch-side table
loading with nano-timestamp normalization lives in session.load_table.
"""

from kafka_connect_hdfs_spark.session import load_table, load_tables
from kafka_connect_hdfs_spark.streaming.pipeline import file_replay_source, kafka_source

__all__ = ["kafka_source", "file_replay_source", "load_table", "load_tables"]


def events_as_kafka_records(df, topic: str = "events", num_partitions: int = 4):
    """Adapter: present the driver's ``events`` table as Connect-envelope
    records (FIXTURES.md §6: user_id % N → kafkaPartition, event_id → offset,
    ts → record timestamp), so pipeline operators can be exercised and
    oracle-verified on deterministic data.
    """
    from pyspark.sql import functions as F

    return df.select(
        F.lit(topic).alias("topic"),
        (F.col("user_id") % num_partitions).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        "props",
    )
