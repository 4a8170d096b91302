from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from kafka_connect_hdfs_spark.session import get_spark

    s = get_spark("kchs-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


# hypothesis-driven tests can't take function-scoped fixtures; session alias
@pytest.fixture(scope="session")
def spark_global(spark):
    return spark
