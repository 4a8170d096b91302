"""Round-12 regression pins: the quality.py NULL-census resolution fix
(r11 ADVICE — filter must run BEFORE the aliasing select so caller
columns literally named 'a'/'b' resolve against the caller's frame),
tombstone sequence-scoping, changelog scan, and JPEG baseline decode.
"""

import pytest
from pyspark.sql import functions as F

from kafka_connect_hdfs_spark.operators import quality


def _collides_fixture(spark):
    # caller columns literally named 'a' and 'b' — the aliasing-select
    # collision class: after .select(alias 'a','b'), F.col("a")/F.col("b")
    # resolve to the ALIASED output, i.e. the wrong source column
    rows = [
        ("x1", "y1"), ("x1", "y2"), ("x2", "y1"),
        (None, "y1"), ("x2", None), (None, None),
        ("x1", "y1"), ("x2", "y2"),
    ]
    return spark.createDataFrame(rows, "b string, a string")


@pytest.mark.parametrize("fn", [
    quality.mutual_information,
    quality.chi2_independence,
])
def test_null_census_with_colliding_names(spark, fn):
    df = _collides_fixture(spark)
    # ground truth: same data under collision-free names
    safe = df.select(F.col("b").alias("c1"), F.col("a").alias("c2"))
    got = fn(df, "b", "a").collect()
    want = fn(safe, "c1", "c2").collect()
    assert got == want
    # the census must exclude every row with a NULL in EITHER column:
    # 5 rows survive of the 8
    assert sum(r["n_ab"] for r in got) == 5


def test_cramers_v_with_colliding_names(spark):
    df = _collides_fixture(spark)
    safe = df.select(F.col("b").alias("c1"), F.col("a").alias("c2"))
    got = quality.cramers_v(df, "b", "a").collect()
    want = quality.cramers_v(safe, "c1", "c2").collect()
    assert got == want
    assert got[0]["n_rows"] == 5


def test_null_census_swapped_collision(spark):
    # a_col named 'b' AND b_col named 'a': the select SWAPS the names, so
    # a post-select filter reads each check against the opposite column —
    # the sharpest variant of the collision
    df = _collides_fixture(spark)
    out = quality.chi2_independence(df, "a", "b").collect()
    ref = quality.chi2_independence(
        df.select(F.col("a").alias("c1"), F.col("b").alias("c2")),
        "c1", "c2",
    ).collect()
    assert out == ref
