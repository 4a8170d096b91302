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


def test_kerberos_renewer_lifecycle():
    """Initial synchronous login, periodic renewal on the configured cadence,
    immediate stop (DataWriter.java:121-206 semantics, injectable login)."""
    import time

    from kafka_connect_hdfs_spark.config import ConfigException, HdfsSinkConfig
    from kafka_connect_hdfs_spark.security import (
        KerberosTicketRenewer, build_renewer,
    )

    calls = []
    r = KerberosTicketRenewer(
        "user@REALM", "/etc/kt", renew_period_ms=40,
        login_fn=lambda p, k: calls.append((p, k)),
    )
    r.start()
    assert calls == [("user@REALM", "/etc/kt")]  # synchronous initial login
    time.sleep(0.25)
    r.stop()
    n_after_stop = len(calls)
    assert n_after_stop >= 3  # initial + >=2 renewals in 250ms at 40ms period
    time.sleep(0.1)
    assert len(calls) == n_after_stop  # nothing after stop

    import pytest as _pytest

    with _pytest.raises(ConfigException):
        KerberosTicketRenewer("", "/etc/kt", 1000, lambda p, k: None)

    assert build_renewer(HdfsSinkConfig(), lambda p, k: None) is None
    cfg = HdfsSinkConfig(
        hdfs_authentication_kerberos=True,
        connect_hdfs_principal="u@R", connect_hdfs_keytab="/kt",
    )
    rn = build_renewer(cfg, lambda p, k: None)
    assert rn is not None and rn.renew_period_ms == 3_600_000
