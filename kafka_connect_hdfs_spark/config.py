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


# ---------------------------------------------------------------------------
# ConfigDef surface: recommenders + visibility (reference
# HdfsSinkConnectorConfig.getConfig() recommender/dependents wiring and
# HdfsSinkConnectorConfigTest.java:56-370 — the Connect UI contract: which
# values a key recommends, and which keys are visible given the current
# partial configuration).

AVRO_CODECS = ("null", "deflate", "snappy", "bzip2")
PARQUET_CODECS = ("none", "snappy", "gzip", "zstd")

#: Connect property name -> dataclass field name (the docstring mapping,
#: machine-readable)
PROPERTY_FIELDS: "dict[str, str]" = {
    "hdfs.url": "url",
    "topics.dir": "topics_dir",
    "logs.dir": "logs_dir",
    "format.class": "format",
    "flush.size": "flush_size",
    "rotate.interval.ms": "rotate_interval_ms",
    "rotate.schedule.interval.ms": "rotate_schedule_interval_ms",
    "partitioner.class": "partitioner",
    "partition.field.name": "partition_fields",
    "partition.duration.ms": "partition_duration_ms",
    "path.format": "path_format",
    "timezone": "timezone",
    "timestamp.extractor": "timestamp_extractor",
    "timestamp.field": "timestamp_field",
    "schema.compatibility": "compatibility",
    "hive.integration": "hive_integration",
    "hive.database": "hive_database",
    "avro.codec": "avro_codec",
    "parquet.codec": "parquet_codec",
    "filename.offset.zero.pad.width": "filename_offset_zero_pad_width",
    "retry.backoff.ms": "retry_backoff_ms",
    "shutdown.timeout.ms": "shutdown_timeout_ms",
    "schema.cache.size": "schema_cache_size",
    "hdfs.authentication.kerberos": "hdfs_authentication_kerberos",
    "connect.hdfs.principal": "connect_hdfs_principal",
    "connect.hdfs.keytab": "connect_hdfs_keytab",
    "kerberos.ticket.renew.period.ms": "kerberos_ticket_renew_period_ms",
}

_RECOMMENDERS: "dict[str, tuple]" = {
    "format.class": VALID_FORMATS,
    "schema.compatibility": VALID_COMPAT,
    "partitioner.class": VALID_PARTITIONERS,
    "timestamp.extractor": VALID_EXTRACTORS,
    "avro.codec": AVRO_CODECS,
    "parquet.codec": PARQUET_CODECS,
    "hive.integration": (True, False),
    "hdfs.authentication.kerberos": (True, False),
}

#: gate key -> the keys whose visibility it controls (the reference's
#: ConfigDef dependents lists)
DEPENDENTS: "dict[str, tuple]" = {
    "hive.integration": ("hive.database", "schema.compatibility"),
    "partitioner.class": (
        "partition.field.name",
        "partition.duration.ms",
        "path.format",
        "timezone",
    ),
    "format.class": ("avro.codec", "parquet.codec"),
    "hdfs.authentication.kerberos": (
        "connect.hdfs.principal",
        "connect.hdfs.keytab",
        "kerberos.ticket.renew.period.ms",
    ),
}


def _as_bool(value) -> "bool | None":
    """Coerce a Connect-style boolean property value: Python bools pass
    through; the canonical string forms ``'true'``/``'false'`` (any case,
    the way a REST properties map delivers them) coerce; anything else is
    ``None`` (not a boolean — callers report or treat as unset).
    Mirrors ConfigDef.Type.BOOLEAN parsing (r08 ADVICE: the REST path
    hands every value over as a string)."""
    if isinstance(value, bool):
        return value
    if isinstance(value, str):
        low = value.strip().lower()
        if low == "true":
            return True
        if low == "false":
            return False
    return None


def _as_int(value, default: int = -1) -> "int | None":
    """Coerce a Connect-style numeric property value; ``None``/empty →
    ``default``; unparseable → ``None`` (callers report per-key instead
    of letting ``ValueError`` escape the REST-style validator —
    r08 ADVICE)."""
    if value is None or value == "":
        return default
    try:
        return int(value)
    except (TypeError, ValueError):
        return None


def recommended_values(key: str, partial: "dict | None" = None) -> list:
    """Recommender hook: values the Connect UI should offer for ``key``
    given the ``partial`` configuration entered so far. Keys without a
    recommender return [] (free-form), matching ConfigDef semantics.

    The one context-dependent recommendation mirrors the reference's
    hive gate (HdfsSinkTask.java:55-65): with hive.integration on,
    schema.compatibility must not be NONE, so NONE is not recommended.
    """
    partial = partial or {}
    vals = list(_RECOMMENDERS.get(key, ()))
    if key == "schema.compatibility" and _as_bool(
        partial.get("hive.integration")
    ):
        vals = [v for v in vals if v != "NONE"]
    return vals


def is_visible(key: str, partial: "dict | None" = None) -> bool:
    """Visibility hook: should the Connect UI show ``key`` given the
    ``partial`` configuration so far — the reference's recommender
    ``visible()`` wiring:

    - hive.database only with hive.integration on
    - partition.field.name only for the field partitioner;
      partition.duration.ms / path.format / timezone only for the
      time-based family (time/daily/hourly)
    - avro.codec only for the avro format; parquet.codec for parquet/orc
    - kerberos principal/keytab/renew period only with
      hdfs.authentication.kerberos on
    Unknown keys raise (the UI asked about a key this connector does not
    define); everything defined and ungated is visible.
    """
    if key not in PROPERTY_FIELDS:
        raise ConfigException(f"unknown configuration key: {key}")
    partial = partial or {}
    part = partial.get("partitioner.class", "default")
    fmt = partial.get("format.class", "parquet")
    if key == "hive.database":
        return bool(_as_bool(partial.get("hive.integration")))
    if key == "partition.field.name":
        return part == "field"
    if key in ("partition.duration.ms", "path.format"):
        return part in ("time", "daily", "hourly")
    if key == "timezone":
        # timezone also gates scheduled rotation (HdfsSinkTask.java:67-76).
        # An unparseable interval is a validate_config problem, not a
        # visibility one — treat it as unset here (r08 ADVICE: no raw
        # ValueError out of a UI hook).
        interval = _as_int(partial.get("rotate.schedule.interval.ms"))
        return part in ("time", "daily", "hourly") or (
            interval is not None and interval > 0
        )
    if key == "avro.codec":
        return fmt == "avro"
    if key == "parquet.codec":
        return fmt in ("parquet", "orc")
    if key in (
        "connect.hdfs.principal",
        "connect.hdfs.keytab",
        "kerberos.ticket.renew.period.ms",
    ):
        return bool(_as_bool(partial.get("hdfs.authentication.kerberos")))
    return True


def validate_config(partial: "dict") -> "dict[str, list[str]]":
    """Connect-style ``validate()``: per-key error lists for a property
    map (empty dict = valid). Unknown keys, out-of-recommendation values
    for recommender-backed keys, and the cross-key gates the dataclass
    enforces — reported per key instead of fail-fast, the way the
    Connect REST validation endpoint renders them.
    """
    errors: "dict[str, list[str]]" = {}

    def _err(key: str, msg: str) -> None:
        errors.setdefault(key, []).append(msg)

    for key in partial:
        if key not in PROPERTY_FIELDS:
            _err(key, "unknown configuration key")
    _BOOL_KEYS = ("hive.integration", "hdfs.authentication.kerberos")
    for key, allowed in _RECOMMENDERS.items():
        if key not in partial:
            continue
        # Connect's REST path delivers every value as a string: accept
        # the canonical 'true'/'false' forms for boolean-recommender keys
        # instead of failing them against the Python-bool tuple (r08
        # ADVICE).
        value = _as_bool(partial[key]) if key in _BOOL_KEYS else partial[key]
        if value not in allowed:
            _err(key, f"must be one of {list(allowed)}")
    if _as_bool(partial.get("hive.integration")) and (
        partial.get("schema.compatibility", "NONE") == "NONE"
    ):
        _err(
            "schema.compatibility",
            "hive.integration requires BACKWARD, FORWARD or FULL",
        )
    interval = _as_int(partial.get("rotate.schedule.interval.ms"))
    if interval is None:
        # numeric coercion failure is a per-key error entry, never an
        # uncaught ValueError out of the validator (r08 ADVICE)
        _err(
            "rotate.schedule.interval.ms",
            "must be an integer number of milliseconds",
        )
    elif interval > 0 and not partial.get("timezone"):
        _err("timezone", "required when rotate.schedule.interval.ms is set")
    if partial.get("partitioner.class") == "field" and not partial.get(
        "partition.field.name"
    ):
        _err("partition.field.name", "required by the field partitioner")
    if _as_bool(partial.get("hdfs.authentication.kerberos")) and not (
        partial.get("connect.hdfs.principal")
        and partial.get("connect.hdfs.keytab")
    ):
        _err(
            "connect.hdfs.principal",
            "kerberos requires both principal and keytab",
        )
    return errors
