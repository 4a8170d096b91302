"""The ingest pipeline: records → partition → rotate → land → register.

Batch-first (SURVEY.md §7.1): ``ingest_batch`` is a pure function used both by
tests/correctness harness (static DataFrame in) and by the streaming wrapper
(``streaming/pipeline.py`` calls it from ``foreachBatch``). It reproduces the
reference data path (HdfsSinkTask.put → DataWriter.write →
TopicPartitionWriter state machine, SURVEY.md §3.2) in set-oriented form:

  1. optional schema projection to the current schema (E2)
  2. partitioner → partition columns + encodedPartition (P1-P7)
  3. size-based chunking + offset bookkeeping (F1, W6)
  4. partitioned write in the configured format (O1-O4)
  5. file manifest with the reference's offset-encoded names (W6/F5)

Scale: one shuffle total — the window for chunking partitions by
(kafkaPartition, encodedPartition), which is exactly the layout the
partitioned write wants; everything else is narrow. Writes are
append-immutable like the reference's rename-commit (F5); Spark's file-sink
commit protocol provides the atomicity the WAL provided (W1-W5 — SURVEY.md
§2.5 maps them to checkpoint + ``_spark_metadata``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_hdfs_spark.config import HdfsSinkConfig
from kafka_connect_hdfs_spark.operators.partitioners import build_partitioner
from kafka_connect_hdfs_spark.operators.rotation import chunk_file_manifest, size_based_chunks
from kafka_connect_hdfs_spark.sinks import build_sink

#: Kafka-envelope columns (FIXTURES.md §5) that are bookkeeping, not payload
ENVELOPE_COLS = ("topic", "partition", "offset", "timestamp", "key")


@dataclass
class IngestResult:
    data: DataFrame          # records that were committed (chunk-complete)
    manifest: DataFrame      # one row per committed file (W6 contract)
    partition_columns: list[str]


def ingest_batch(
    df: DataFrame,
    cfg: HdfsSinkConfig,
    topic: str,
    ts_col: str = "ts",
    discard_partial: bool = True,
) -> IngestResult:
    """Assign every record to its (partition dir, committed file) — the
    set-oriented equivalent of one DataWriter.write() pass. Does NOT write;
    ``land`` does, so correctness tests can verify assignment without I/O.
    """
    part = build_partitioner(cfg, ts_col=ts_col)
    spec = part.apply(df)
    flush = cfg.flush_size or 1000
    sink = build_sink(cfg)
    chunked = size_based_chunks(
        spec.df,
        spec.encoded,
        flush,
        discard_partial=discard_partial,
    )
    manifest = chunk_file_manifest(
        chunked, topic, sink.extension, pad_width=cfg.filename_offset_zero_pad_width
    )
    return IngestResult(chunked, manifest, spec.partition_columns)


def land(
    spark: SparkSession,
    df: DataFrame,
    cfg: HdfsSinkConfig,
    topic: str,
    ts_col: str = "ts",
    discard_partial: bool = True,
    register_table: bool = False,
) -> IngestResult:
    """Full data path: assign + write + (optionally) register in the catalog.

    Directory layout mirrors the reference
    (``<url>/<topics.dir>/<topic>/<encodedPartition>/...``, SURVEY.md §1.3)
    via ``partitionBy`` on the partitioner's columns.
    """
    res = ingest_batch(df, cfg, topic, ts_col=ts_col, discard_partial=discard_partial)
    sink = build_sink(cfg)
    path = f"{cfg.topics_path}/{topic}"
    out = res.data.drop("encodedPartition", "chunk")
    sink.write(out, path, res.partition_columns)
    if register_table:
        register_external_table(spark, cfg, topic, res.partition_columns, path)
    return res


def backfill(
    spark: SparkSession,
    df: DataFrame,
    cfg: HdfsSinkConfig,
    topic: str,
    ts_col: str = "ts",
) -> IngestResult:
    """Idempotent reprocessing of a partition range: re-land corrected
    records, replacing ONLY the partition directories the new batch touches
    and leaving every other partition's committed files untouched. This is
    the recovery/backfill story the reference handles by truncating the WAL
    and rewinding offsets per topic-partition (TopicPartitionWriter
    recovery) — expressed at the directory-partition level, the granularity
    a batch engine can replace atomically. Re-running the same backfill
    reproduces the same content (safe after a failure).

    Scale: native formats use dynamic partition overwrite — overwrite scope
    is computed executor-side from the written partitions, unrelated
    partitions are never listed, read, or rewritten, and no partition list
    ever funnels through the driver. The pure-Python avro fallback collects
    the touched partition VALUES (dir count, not data) to clear those dirs,
    then appends fresh containers.
    """
    from kafka_connect_hdfs_spark.sinks import jvm_avro_available

    res = ingest_batch(df, cfg, topic, ts_col=ts_col, discard_partial=False)
    path = f"{cfg.topics_path}/{topic}"
    out = res.data.drop("encodedPartition", "chunk")
    pcols = res.partition_columns
    if cfg.format == "avro" and not jvm_avro_available(spark):
        import shutil

        sink = build_sink(cfg)
        local = path.removeprefix("file://")
        touched = out.select(*pcols).distinct().collect()
        for r in touched:
            d = "/".join([local] + [f"{c}={r[c]}" for c in pcols])
            shutil.rmtree(d, ignore_errors=True)
        sink.write(out, path, pcols)
        return res
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        writer = out.write.mode("overwrite").format(cfg.format)
        if pcols:
            writer = writer.partitionBy(*pcols)
        writer.save(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return res


def land_topics(
    spark: SparkSession,
    df: DataFrame,
    cfg: HdfsSinkConfig,
    topic_col: str = "topic",
    ts_col: str = "ts",
    discard_partial: bool = True,
    register_tables: bool = False,
) -> dict[str, IngestResult]:
    """Multi-topic landing (R1 routing: DataWriter keeps one writer per
    topic-partition, DataWriter.java:314-333). Each topic lands under its own
    ``<topics.dir>/<topic>/`` root — the reference's raw-topic-name layout,
    which ``partitionBy`` alone can't produce (it would emit ``topic=`` dirs).

    One write job per topic, submitted from a driver-side thread pool so the
    Spark scheduler overlaps them (FIFO scheduling interleaves task sets;
    the reference serializes on one task thread — we don't have to). Threads
    only submit jobs; all data movement stays on the executors.
    """
    from concurrent.futures import ThreadPoolExecutor

    topics = sorted(r[0] for r in df.select(topic_col).distinct().collect())

    def land_one(topic: str) -> IngestResult:
        sub = df.filter(F.col(topic_col) == topic)
        return land(
            spark, sub, cfg, topic, ts_col=ts_col,
            discard_partial=discard_partial, register_table=register_tables,
        )

    if len(topics) <= 1:
        return {t: land_one(t) for t in topics}
    with ThreadPoolExecutor(max_workers=min(8, len(topics))) as pool:
        results = pool.map(land_one, topics)
        return dict(zip(topics, results))


# ---------------------------------------------------------------------------
# Hive/catalog operators H1-H4 (SURVEY.md §2.8)


def avro_schema_literal(schema, partition_columns: list[str], topic: str) -> str:
    """The ``avro.schema.literal`` table property the reference attaches to
    Avro Hive tables (avro/AvroHiveUtil.java:73-97): the latest landed
    PAYLOAD schema (partition columns excluded — they live in the dir
    layout) as an Avro record named after the topic."""
    import json

    from kafka_connect_hdfs_spark.formats.avro_io import struct_to_avro_schema

    payload = [f for f in schema.fields if f.name not in partition_columns]
    record = struct_to_avro_schema(
        type(schema)(payload), name=topic.replace(".", "_")
    )
    return json.dumps(record)


def register_external_table(
    spark: SparkSession,
    cfg: HdfsSinkConfig,
    topic: str,
    partition_columns: list[str],
    path: str,
) -> None:
    """H1 + H4 — create the external partitioned table and sync partitions.

    Reference: avro/AvroHiveUtil.constructAvroTable (AvroHiveUtil.java:73-97),
    ParquetHiveUtil.java:61-84; partition registration
    TopicPartitionWriter.addHivePartition (:787-800) and
    DataWriter.syncWithHive (:383-420). Spark: CREATE TABLE USING + MSCK.
    Avro tables carry ``avro.schema.literal`` exactly like the reference's
    (AvroHiveUtil.java:73-97) — recomputed from the landed files, replaced
    on every evolution (H2).
    """
    from kafka_connect_hdfs_spark.sinks import build_sink

    table = table_name_for_topic(cfg, topic)
    sink = build_sink(cfg)
    schema = sink.schema_of(spark, path)
    if cfg.format == "avro":
        # partition cols come from dir names, not the container schema
        from pyspark.sql import types as T

        for c in partition_columns:
            if c not in schema.fieldNames():
                schema = schema.add(T.StructField(c, T.StringType(), True))
    _recreate_external_table(
        spark, cfg, topic, schema, partition_columns, path
    )


def _recreate_external_table(
    spark: SparkSession,
    cfg: HdfsSinkConfig,
    topic: str,
    schema,
    partition_columns: "list[str]",
    path: str,
) -> None:
    """The shared Hive DDL tail (H1 create + H2 replace): render the
    column list (data columns first, partition columns last — Spark's
    table layout rule; USING syntax lists every column once,
    PARTITIONED BY takes names only), DROP + CREATE at the external
    location, MSCK-sync partitions. One definition so the H1 and H2
    paths can never produce divergent catalog tables (r07 review)."""
    table = table_name_for_topic(cfg, topic)
    ordered = [f for f in schema.fields if f.name not in partition_columns] + [
        f for f in schema.fields if f.name in partition_columns
    ]
    cols_sql = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in ordered)
    part_sql = ", ".join(f"`{c}`" for c in partition_columns)
    fmt = {
        "parquet": "PARQUET", "orc": "ORC", "avro": "AVRO",
        "json": "JSON", "text": "TEXT",
    }[cfg.format]
    props = ""
    if cfg.format == "avro":
        literal = avro_schema_literal(schema, partition_columns, topic)
        props = (
            " TBLPROPERTIES ('avro.schema.literal' = '"
            + literal.replace("'", "\\'")
            + "')"
        )
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    partitioned = f" PARTITIONED BY ({part_sql})" if part_sql else ""
    spark.sql(
        f"CREATE TABLE {table} ({cols_sql}) USING {fmt}{partitioned}"
        f"{props} LOCATION '{path}'"
    )
    if partition_columns:
        spark.sql(f"MSCK REPAIR TABLE {table}")  # H4 sync


def alter_table_schema(
    spark: SparkSession, cfg: HdfsSinkConfig, topic: str, new_columns: dict[str, str]
) -> None:
    """H2 — evolve the catalog table to the latest schema by adding the new
    columns (Avro path replaces avro.schema.literal, Parquet path replaces
    the column list — avro/AvroHiveUtil.java:62-71, ParquetHiveUtil.java:53-59;
    triggered async in TopicPartitionWriter.alterHiveSchema :772-785).

    Spark: ALTER TABLE ADD COLUMNS — additive evolution matches the
    BACKWARD/FULL gate (H6) under which hive integration runs.
    """
    table = table_name_for_topic(cfg, topic)
    existing = {f.name for f in spark.table(table).schema.fields}
    cols = ", ".join(
        f"`{name}` {dtype}" for name, dtype in new_columns.items() if name not in existing
    )
    if cols:
        spark.sql(f"ALTER TABLE {table} ADD COLUMNS ({cols})")
    if cfg.format == "avro":
        # replace avro.schema.literal with the evolved schema, exactly the
        # reference's alterSchema (avro/AvroHiveUtil.java:62-71)
        desc = spark.sql(f"DESCRIBE TABLE {table}").collect()
        part_cols, in_part = [], False
        for r in desc:
            if r.col_name.startswith("# Partition"):
                in_part = True
            elif in_part and r.col_name and not r.col_name.startswith("#"):
                part_cols.append(r.col_name)
        literal = avro_schema_literal(spark.table(table).schema, part_cols, topic)
        spark.sql(
            f"ALTER TABLE {table} SET TBLPROPERTIES "
            "('avro.schema.literal' = '" + literal.replace("'", "\\'") + "')"
        )


def replace_table_schema(
    spark: SparkSession,
    cfg: HdfsSinkConfig,
    topic: str,
    schema,
    partition_columns: "list[str]",
    path: str,
) -> None:
    """H2 (full) — REPLACE COLUMNS semantics: swap the catalog table's
    column list for ``schema`` wholesale, including column DROPS, exactly
    the reference's ParquetHiveUtil.alterSchema
    (parquet/ParquetHiveUtil.java:53-59, ``ALTER TABLE … REPLACE
    COLUMNS``). Spark SQL has no REPLACE COLUMNS for v1 external tables,
    but for an EXTERNAL location the column list is pure catalog metadata
    — so the equivalent is re-registering the table at the same location
    with the new list (DROP + CREATE + MSCK, which
    :func:`register_external_table`'s create path already performs
    atomically enough for a single-writer catalog). Data files are
    untouched; columns absent from the new list become invisible, columns
    the files lack read as NULL — Hive REPLACE COLUMNS behavior.

    Use :func:`alter_table_schema` (ADD COLUMNS) for the additive
    BACKWARD/FULL path; this entry point exists for FORWARD-compatible
    evolution where the newest writer schema may DROP fields
    (schema_evolution.py compatibility modes).
    """
    from pyspark.sql import types as T

    table = table_name_for_topic(cfg, topic)
    # partition columns absent from the new schema keep their CURRENT
    # catalog type (r07 review: a payload-only evolution must not
    # silently retype `partition int` to string); STRING only when the
    # table never existed
    # only a MISSING table may fall through to the fresh-create default
    # (r07 ADVICE): a transient metastore error swallowed here would
    # silently retype existing partition columns to STRING — exactly what
    # the preservation below exists to prevent — so anything else
    # propagates.
    current = {}
    if spark.catalog.tableExists(table):
        current = {
            f.name: f for f in spark.table(table).schema.fields
        }
    fields = list(schema.fields)
    have = {f.name for f in fields}
    for c in partition_columns:
        if c not in have:
            fields.append(
                current.get(c, T.StructField(c, T.StringType(), True))
            )
    _recreate_external_table(
        spark, cfg, topic, T.StructType(fields), partition_columns, path
    )


def add_partition(spark: SparkSession, cfg: HdfsSinkConfig, topic: str, spec: str) -> None:
    """H3 — ALTER TABLE ADD IF NOT EXISTS PARTITION (addHivePartition :787-800)."""
    table = table_name_for_topic(cfg, topic)
    spark.sql(f"ALTER TABLE {table} ADD IF NOT EXISTS PARTITION ({spec})")


def table_name_for_topic(cfg: HdfsSinkConfig, topic: str) -> str:
    """Topics may contain dots (`topic.with.dots`,
    HdfsSinkConnectorTestBase.java:48); Hive table names can't."""
    return f"{cfg.hive_database}.`{topic.replace('.', '_')}`"
