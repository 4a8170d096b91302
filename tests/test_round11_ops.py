"""Round-11 semantics pins: the four r10 ADVICE closures (chi2/MI
NULL-census filter, cramers_v non-negative clamp, _table_sig mtime
hardening, empty-table index bootstrap), plus the r11 build items
(star-routed duplicate clustering, PNG codec, row-level deletes,
Avro snappy) pinned in their own sections below as they land.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F


def _mk_table(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(40).select(
        F.col("id").alias("k"),
        F.concat(F.lit("c"), (F.col("id") % 5).cast("string")).alias("p"),
        (F.col("id") * 1.5).alias("v"),
    )
    df.write.partitionBy("p").parquet(path)
    return path


# ---------------------------------------------------------------------------
# r10 ADVICE: _table_sig must catch same-name/same-size rewrites (mtime)


def test_table_sig_catches_same_size_rewrite(spark, tmp_path):
    """An out-of-band rewrite that preserves file name AND size was
    invisible to the old name+size fingerprint — the index stayed
    'fresh' while its pairs could be wrong (r10 ADVICE). With mtime in
    each fingerprint line the status must flip to stale."""
    from kafka_connect_hdfs_spark.merge import (
        build_key_index, key_index_status, locate_keys,
    )

    path = _mk_table(spark, tmp_path)
    build_key_index(spark, path, "k", "p", n_buckets=8)
    assert key_index_status(spark, path, "p") == "fresh"
    # simulate a same-name/same-size rewrite: bump one data file's mtime
    # (content identical so the .crc sidecar stays valid)
    leaf = os.path.join(path, "p=c0")
    part = next(
        f for f in os.listdir(leaf)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    target = os.path.join(leaf, part)
    st = os.stat(target)
    os.utime(target, (st.st_atime, st.st_mtime + 10))
    assert key_index_status(spark, path, "p") == "stale"
    keys = spark.createDataFrame([(1,)], "k long")
    assert locate_keys(spark, path, keys, "k", "p") is None


def test_table_sig_covers_null_partition_leaf(spark, tmp_path):
    """Spark lands NULL partition values in
    `p=__HIVE_DEFAULT_PARTITION__`, which matches the `p=` prefix test —
    an out-of-band write into THAT leaf must flip the index stale too."""
    from kafka_connect_hdfs_spark.merge import (
        build_key_index, key_index_status,
    )

    path = str(tmp_path / "tnull")
    df = spark.createDataFrame(
        [(1, "c0", 1.0), (2, None, 2.0)], "k long, p string, v double"
    )
    df.write.partitionBy("p").parquet(path)
    build_key_index(spark, path, "k", "p", n_buckets=4)
    assert key_index_status(spark, path, "p") == "fresh"
    extra = spark.createDataFrame([(9, None, 9.0)], "k long, p string, v double")
    extra.write.mode("append").partitionBy("p").parquet(path)
    assert key_index_status(spark, path, "p") == "stale"


# ---------------------------------------------------------------------------
# r10 ADVICE: empty-table index bootstrap needs an explicit schema


def test_build_key_index_empty_table_with_schema(spark, tmp_path):
    """Bootstrap on an empty/leafless table: schema inference has no
    files to read, so the build REQUIRES the caller's table_schema —
    with it, an empty index publishes and locate_keys resolves (to
    nothing) instead of falling back."""
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from kafka_connect_hdfs_spark.merge import build_key_index, locate_keys

    path = str(tmp_path / "empty_t")
    os.makedirs(path)
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("p", StringType()),
            StructField("v", DoubleType()),
        ]
    )
    meta = build_key_index(
        spark, path, "k", "p", n_buckets=4, table_schema=schema
    )
    assert meta["key_col"] == "k"
    keys = spark.createDataFrame([(1,), (2,)], "k long")
    located = locate_keys(spark, path, keys, "k", "p")
    assert located is not None
    assert located.count() == 0


def test_build_key_index_empty_table_without_schema_fails_fast(
    spark, tmp_path
):
    from kafka_connect_hdfs_spark.merge import build_key_index

    path = str(tmp_path / "empty_t2")
    os.makedirs(path)
    with pytest.raises(Exception):
        build_key_index(spark, path, "k", "p", n_buckets=4)


# ---------------------------------------------------------------------------
# r10 ADVICE: chi2/MI NULL-category rows excluded from the census


def _null_census_df(spark):
    rows = (
        [("x", "u")] * 2
        + [("x", "v")]
        + [("y", "u")]
        + [("x", None)] * 5
        + [(None, "u")] * 5
    )
    return spark.createDataFrame(rows, "a string, b string")


def test_chi2_marginals_exclude_null_rows(spark):
    """With 10 NULL-keyed rows present, the (x,u) expected count must be
    computed over the NULL-free census (N=4, n_x=3, n_u=3 → e=2.25) —
    the old join-side drop inflated it to 7*7/14 = 3.5."""
    from kafka_connect_hdfs_spark.operators.quality import chi2_independence

    out = {
        (r["a"], r["b"]): r
        for r in chi2_independence(_null_census_df(spark), "a", "b").collect()
    }
    assert set(out) == {("x", "u"), ("x", "v"), ("y", "u")}
    assert out[("x", "u")]["n_ab"] == 2
    assert abs(out[("x", "u")]["expected"] - 2.25) < 1e-9


def test_mutual_info_marginals_exclude_null_rows(spark):
    from kafka_connect_hdfs_spark.operators.quality import mutual_information

    out = {
        (r["a"], r["b"]): r
        for r in mutual_information(_null_census_df(spark), "a", "b").collect()
    }
    assert set(out) == {("x", "u"), ("x", "v"), ("y", "u")}
    assert out[("x", "u")]["n_a"] == 3
    assert out[("x", "u")]["n_b"] == 3


# ---------------------------------------------------------------------------
# r10 ADVICE: cramers_v chi2 clamped at 0 (near-independence rounding)


def test_cramers_v_never_negative_nor_nan(spark):
    """Near perfect independence with non-integer expectations, the
    zero-cell correction N − Σq6(e) can overshoot by half-up roundings;
    chi2 must clamp at 0 and V stay a real number in [0, 1]."""
    import math

    from kafka_connect_hdfs_spark.operators.quality import cramers_v

    # 3×3 independent-ish table with ragged counts (non-integer e)
    rows = []
    counts = {
        ("a", "u"): 7, ("a", "v"): 11, ("a", "w"): 5,
        ("b", "u"): 13, ("b", "v"): 21, ("b", "w"): 9,
        ("c", "u"): 3, ("c", "v"): 5, ("c", "w"): 2,
    }
    for (a, b), n in counts.items():
        rows += [(a, b)] * n
    r = cramers_v(spark.createDataFrame(rows, "x string, y string"), "x", "y")
    row = r.collect()[0]
    assert row["chi2"] >= 0.0
    assert not math.isnan(row["cramers_v"])
    assert 0.0 <= row["cramers_v"] <= 1.0
