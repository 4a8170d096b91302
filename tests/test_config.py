"""Config validation mirroring HdfsSinkTask.java:55-76 and
HdfsSinkConnectorConfigTest.java."""

import pytest

from kafka_connect_hdfs_spark.config import ConfigException, HdfsSinkConfig


def test_defaults():
    cfg = HdfsSinkConfig()
    assert cfg.format == "parquet"
    assert cfg.rotate_interval_ms == -1
    assert cfg.retry_backoff_ms == 5000
    assert cfg.filename_offset_zero_pad_width == 10
    assert cfg.topics_path.endswith("/topics")
    assert cfg.tmp_path.endswith("/topics/+tmp")


def test_hive_requires_compatibility():
    # HdfsSinkTask.java:55-65
    with pytest.raises(ConfigException):
        HdfsSinkConfig(hive_integration=True, compatibility="NONE")
    HdfsSinkConfig(hive_integration=True, compatibility="BACKWARD")


def test_scheduled_rotation_requires_timezone():
    # HdfsSinkTask.java:67-76
    with pytest.raises(ConfigException):
        HdfsSinkConfig(rotate_schedule_interval_ms=60000)
    HdfsSinkConfig(rotate_schedule_interval_ms=60000, timezone="America/Los_Angeles")


def test_field_partitioner_requires_fields():
    with pytest.raises(ConfigException):
        HdfsSinkConfig(partitioner="field")
    HdfsSinkConfig(partitioner="field", partition_fields=["event_type"])


def test_invalid_enums():
    for kwargs in (
        {"format": "orc2"},
        {"compatibility": "SIDEWAYS"},
        {"partitioner": "nope"},
        {"timestamp_extractor": "Guess"},
    ):
        with pytest.raises(ConfigException):
            HdfsSinkConfig(**kwargs)
