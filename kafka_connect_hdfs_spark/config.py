"""Connector configuration, mirroring HdfsSinkConnectorConfig.

Reference: src/main/java/io/confluent/connect/hdfs/HdfsSinkConnectorConfig.java:297-314
(composes storage/hive/partitioner config groups) and the validation rules in
HdfsSinkTask.java:55-76 (hive => compatibility != NONE; scheduled rotation =>
timezone required). Defaults follow docs/configuration_options.rst.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class ConfigException(ValueError):
    """Invalid connector configuration (mirrors Connect's ConfigException)."""


VALID_FORMATS = ("parquet", "orc", "avro", "json", "text", "csv")
VALID_COMPAT = ("NONE", "BACKWARD", "FORWARD", "FULL")
VALID_PARTITIONERS = ("default", "field", "time", "daily", "hourly")
VALID_EXTRACTORS = ("Wallclock", "Record", "RecordField")


@dataclass
class HdfsSinkConfig:
    """Typed view of the reference's property map.

    Property-name mapping (docs/configuration_options.rst):
      hdfs.url -> url, topics.dir -> topics_dir, logs.dir -> logs_dir,
      format.class -> format, flush.size -> flush_size,
      rotate.interval.ms / rotate.schedule.interval.ms -> rotate_*,
      partitioner.class -> partitioner, partition.field.name -> partition_fields,
      partition.duration.ms -> partition_duration_ms, path.format -> path_format,
      locale/timezone -> timezone, timestamp.extractor/timestamp.field,
      schema.compatibility -> compatibility, hive.integration -> hive_integration,
      filename.offset.zero.pad.width -> filename_offset_zero_pad_width.
    """

    url: str = "file:///tmp/kchs"
    topics_dir: str = "topics"
    logs_dir: str = "logs"
    format: str = "parquet"

    # rotation (docs/configuration_options.rst:84-102)
    flush_size: int | None = None          # required by the reference, no default
    rotate_interval_ms: int = -1           # event-time rotation, off by default
    rotate_schedule_interval_ms: int = -1  # wallclock scheduled rotation, off

    # partitioner (docs/configuration_options.rst:217-229)
    partitioner: str = "default"
    partition_fields: list[str] = field(default_factory=list)
    partition_duration_ms: int = -1
    path_format: str = ""
    timezone: str = ""
    timestamp_extractor: str = "Wallclock"  # TopicPartitionWriter.java:64-65
    timestamp_field: str = "timestamp"

    # schema evolution (docs/hdfs_connector.rst:302-339)
    compatibility: str = "NONE"

    # hive (docs/hdfs_connector.rst:172-200)
    hive_integration: bool = False
    hive_database: str = "default"

    # formats
    avro_codec: str = "null"               # avro/AvroRecordWriterProvider.java:69
    parquet_codec: str = "snappy"          # parquet/ParquetRecordWriterProvider.java:54

    # filenames (docs/configuration_options.rst:125-131)
    filename_offset_zero_pad_width: int = 10

    retry_backoff_ms: int = 5000
    shutdown_timeout_ms: int = 3000
    schema_cache_size: int = 1000

    # Kerberos (DataWriter.java:121-206: optional secure-HDFS login + ticket
    # renewal thread; on Spark, principal/keytab map to
    # spark.kerberos.principal/keytab and renewal is driver-managed)
    hdfs_authentication_kerberos: bool = False
    connect_hdfs_principal: str = ""
    connect_hdfs_keytab: str = ""
    kerberos_ticket_renew_period_ms: int = 3_600_000

    def __post_init__(self) -> None:
        if self.format not in VALID_FORMATS:
            raise ConfigException(f"format must be one of {VALID_FORMATS}: {self.format}")
        if self.compatibility not in VALID_COMPAT:
            raise ConfigException(f"schema.compatibility must be one of {VALID_COMPAT}")
        if self.partitioner not in VALID_PARTITIONERS:
            raise ConfigException(f"partitioner must be one of {VALID_PARTITIONERS}")
        if self.timestamp_extractor not in VALID_EXTRACTORS:
            raise ConfigException(f"timestamp.extractor must be one of {VALID_EXTRACTORS}")
        # HdfsSinkTask.java:55-65 — hive requires a real compatibility mode
        if self.hive_integration and self.compatibility == "NONE":
            raise ConfigException(
                "Hive integration requires schema.compatibility of BACKWARD, FORWARD or FULL"
            )
        # HdfsSinkTask.java:67-76 — scheduled rotation requires a timezone
        if self.rotate_schedule_interval_ms > 0 and not self.timezone:
            raise ConfigException(
                "rotate.schedule.interval.ms requires a timezone (got none)"
            )
        if self.partitioner == "field" and not self.partition_fields:
            raise ConfigException("field partitioner requires partition.field.name")
        # DataWriter.java:128-140: kerberos requires both principal and keytab
        if self.hdfs_authentication_kerberos and not (
            self.connect_hdfs_principal and self.connect_hdfs_keytab
        ):
            raise ConfigException(
                "hdfs.authentication.kerberos requires connect.hdfs.principal "
                "and connect.hdfs.keytab"
            )

    @property
    def topics_path(self) -> str:
        return f"{self.url.rstrip('/')}/{self.topics_dir}"

    @property
    def tmp_path(self) -> str:
        # "+tmp" constant: HdfsSinkConnectorConstants.java:33-34
        return f"{self.topics_path}/+tmp"

    @property
    def logs_path(self) -> str:
        return f"{self.url.rstrip('/')}/{self.logs_dir}"
