"""Sources (SURVEY.md §2.1): Kafka intake (S1/S2) and replay/test sources (S3).

The Kafka wiring lives in streaming.pipeline (kafka_source); batch-side table
loading with nano-timestamp normalization lives in session.load_table.
"""

from kafka_connect_hdfs_spark.session import load_table, load_tables
from kafka_connect_hdfs_spark.streaming.pipeline import file_replay_source, kafka_source

__all__ = ["kafka_source", "file_replay_source", "load_table", "load_tables"]


def schema_source_stream(spark, rows_per_second: int = 10, num_partitions: int = 1):
    """S3 — the reference's synthetic SchemaSourceTask
    (tools/SchemaSourceTask.java:128-196): a rate-limited stream of versioned
    struct records alternating between schema v1 and v2 (v2 adds an optional
    defaulted string field — FIXTURES.md §1-2).

    Spark phrasing: the ``rate`` source + column expressions; the v2-only
    field is null for v1 records, and ``schema_version`` drives evolution
    logic downstream.
    """
    from pyspark.sql import functions as F

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .option("numPartitions", str(num_partitions))
        .load()
    )
    v2 = (F.col("value") % 2) == 1
    return rate.select(
        F.col("timestamp"),
        F.col("value").alias("offset"),
        F.when(v2, 2).otherwise(1).alias("schema_version"),
        F.lit(True).alias("boolean"),
        (F.col("value") % 16 + 16).cast("int").alias("int"),
        F.lit(16).cast("long").alias("long"),
        F.lit(12.2).cast("float").alias("float"),
        F.lit(12.2).cast("double").alias("double"),
        F.when(v2, F.lit("abc")).otherwise(F.lit(None).cast("string")).alias("string"),
    )


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


def parse_with_quarantine(
    df,
    schema_ddl: str,
    json_col: str = "value",
):
    """Dead-letter parsing: split a raw JSON payload column into
    ``(good, bad)`` frames — the Connect ``errors.tolerance=all`` +
    dead-letter-queue pattern (the reference relies on the framework for
    this; here it is explicit and testable). ``good`` carries the parsed
    columns; ``bad`` keeps the raw payload for quarantine landing and
    replay-after-fix.

    Scale: one ``from_json`` projection (codegen, no UDF) evaluated once —
    Catalyst shares the parse across both branch filters; each branch lands
    with its own sink. No shuffle.

    Parsed fields are selected explicitly by name (never ``_p.*`` + drop),
    so a parsed field may legally share the payload column's name; a parsed
    field colliding with any OTHER input column is rejected up front rather
    than silently shadowed.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    parsed_fields = [f.name for f in StructType.fromDDL(schema_ddl).fields]
    raw_cols = [c for c in df.columns if c != json_col]
    clash = sorted(set(parsed_fields) & set(raw_cols))
    if clash:
        raise ValueError(
            f"parse_with_quarantine: schema fields {clash} collide with "
            "input columns; rename one side"
        )
    full_schema = schema_ddl + ", _corrupt_record string"
    parsed = df.withColumn(
        "_p",
        F.from_json(
            F.col(json_col),
            full_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    good = parsed.filter(
        F.col("_p").isNotNull() & F.col("_p._corrupt_record").isNull()
    ).select(
        *[F.col(c) for c in raw_cols],
        *[F.col("_p").getField(f).alias(f) for f in parsed_fields],
    )
    bad = parsed.filter(
        F.col("_p").isNull() | F.col("_p._corrupt_record").isNotNull()
    ).select(df.columns)
    return good, bad
