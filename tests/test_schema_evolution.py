"""Schema evolution goldens from DataWriterAvroTest.java:267-353 and
SchemaUtils semantics (schema/SchemaUtils.java:38-91)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_connect_hdfs_spark.operators.schema_evolution import (
    SchemaProjectorException,
    VersionedSchema,
    project,
    should_change_schema,
    simulate_file_boundaries,
)

V1 = VersionedSchema(
    StructType(
        [
            StructField("boolean", StringType(), False),
            StructField("int", IntegerType(), False),
        ]
    ),
    version=1,
)
V2 = VersionedSchema(
    StructType(
        list(V1.struct.fields)
        + [StructField("string", StringType(), True, metadata={"default": "abc"})]
    ),
    version=2,
)


def test_should_change_none_any_difference():
    assert should_change_schema(V2, V1, "NONE")
    assert should_change_schema(V1, V2, "NONE")
    assert not should_change_schema(V1, V1, "NONE")


def test_should_change_backward_newer_wins():
    assert should_change_schema(V2, V1, "BACKWARD")      # newer arrives -> change
    assert not should_change_schema(V1, V2, "BACKWARD")  # older arrives -> project


def test_should_change_forward_older_wins():
    # FORWARD projects new data DOWN to the oldest schema (SURVEY.md §7.4)
    assert should_change_schema(V1, V2, "FORWARD")
    assert not should_change_schema(V2, V1, "FORWARD")


def test_version_required():
    nover = VersionedSchema(V1.struct, version=None)
    with pytest.raises(SchemaProjectorException):
        should_change_schema(nover, V1, "BACKWARD")


ALTERNATING_7 = [(i, 1 if i % 2 == 0 else 2) for i in range(7)]


def test_file_boundaries_backward():
    # DataWriterAvroTest.testProjectBackWard: {0,1,3,5,7}
    assert simulate_file_boundaries(ALTERNATING_7, 2, "BACKWARD") == [0, 1, 3, 5, 7]


def test_file_boundaries_none():
    # testProjectNone: rotate on every schema change -> {0..6}
    assert simulate_file_boundaries(ALTERNATING_7, 2, "NONE") == [0, 1, 2, 3, 4, 5, 6]


def test_file_boundaries_forward():
    # testProjectForward: 8 records from offset 1 (skip first) -> {1,2,4,6,8}
    alternating_8 = [(i, 2 if i % 2 == 1 else 1) for i in range(1, 9)]
    assert simulate_file_boundaries(alternating_8, 2, "FORWARD") == [1, 2, 4, 6, 8]


def test_project_fills_defaults_and_drops(spark):
    df = spark.createDataFrame([("x", 1)], "boolean string, int int")
    out = project(df, V1, V2)
    assert out.columns == ["boolean", "int", "string"]
    assert out.first()["string"] == "abc"
    # downgrade drops the extra field
    df2 = spark.createDataFrame([("x", 1, "s")], "boolean string, int int, string string")
    back = project(df2, V2, V1)
    assert back.columns == ["boolean", "int"]


def test_project_missing_required_raises(spark):
    target = VersionedSchema(
        StructType([StructField("must", LongType(), False)]), version=3
    )
    df = spark.createDataFrame([("x",)], "boolean string")
    with pytest.raises(SchemaProjectorException):
        project(df, V1, target)
