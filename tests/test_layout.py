"""Z-order layout: correctness (same rows back) + the data-skipping
payoff (per-file bounding boxes shrink vs natural order)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


def _file_spans(files, col):
    """Per-file (max - min + 1) footer span of ``col`` — what min/max
    pruning sees: a range filter on ``col`` skips a file iff it misses
    the file's span, so SMALLER summed spans = more skippable files."""
    spans = []
    for f in files:
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                c = row.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        if mins:
            spans.append(max(maxs) - min(mins) + 1)
    return spans


@pytest.fixture(scope="module")
def events_keys(spark_global, sf_dir):
    from kafka_connect_hdfs_spark.session import load_table

    ev = load_table(spark_global, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("user_id").cast("long").alias("user_id"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).cast("long").alias(
            "day"
        ),
        "value",
    )


def test_zorder_value_interleaves_bits(spark_global):
    from kafka_connect_hdfs_spark.operators.layout import zorder_value

    df = spark_global.createDataFrame(
        [(0b101, 0b011)], "a long, b long"
    ).select(zorder_value(F.col("a"), F.col("b")).alias("z"))
    # a bits -> even positions (1,0,1 -> 0b010001... ), b -> odd:
    # a=101, b=011 => z bits (b2 a2 b1 a1 b0 a0) = 0 1 1 0 1 1 = 0b011011
    assert df.collect()[0]["z"] == 0b011011


def test_zorder_roundtrip_on_events(spark_global, events_keys, tmp_path):
    from kafka_connect_hdfs_spark.operators.layout import zorder_write

    zordered = str(tmp_path / "zorder")
    zorder_write(events_keys, zordered, "user_id", "day", n_files=8)
    a = sorted(
        (r["event_id"], r["user_id"])
        for r in spark_global.read.parquet(zordered).collect()
    )
    b = sorted(
        (r["event_id"], r["user_id"]) for r in events_keys.collect()
    )
    assert a == b


def test_zorder_bbox_shrinks_on_uniform_grid(spark_global, tmp_path):
    """On a 1024x1024 uniform key grid (deterministic, hash-derived),
    natural insertion order leaves every file spanning ~the full range
    of BOTH keys — no min/max pruning at all. Z-order must cut the
    summed per-file span of EACH key by >= 2x (files become tiles)."""
    from kafka_connect_hdfs_spark.operators.layout import zorder_write

    rows = (
        spark_global.range(65536)
        .select(
            F.col("id").alias("event_id"),
            F.pmod(F.xxhash64(F.col("id")), F.lit(1024)).alias("user_id"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(1024)).alias(
                "day"
            ),
        )
    )
    natural = str(tmp_path / "nat")
    zordered = str(tmp_path / "z")
    rows.repartitionByRange(16, "event_id").sortWithinPartitions(
        "event_id"
    ).write.parquet(natural)
    zorder_write(rows, zordered, "user_id", "day", n_files=16, bits=10)

    nat_files = glob.glob(natural + "/part-*.parquet")
    z_files = glob.glob(zordered + "/part-*.parquet")
    for col in ("user_id", "day"):
        s_nat = sum(_file_spans(nat_files, col))
        s_z = sum(_file_spans(z_files, col))
        assert s_z * 2 <= s_nat, (col, s_z, s_nat)


def test_zorder_read_prunes_row_groups(spark_global, events_keys, tmp_path):
    """A selective user_id-range scan over the z-ordered layout must
    skip files: Spark's parquet reader applies footer min/max, so the
    scan's input files drop below the full file count."""
    from kafka_connect_hdfs_spark.operators.layout import zorder_write

    zordered = str(tmp_path / "zp")
    zorder_write(events_keys, zordered, "user_id", "day", n_files=8)
    umin = events_keys.agg(F.min("user_id")).collect()[0][0]
    narrow = spark_global.read.parquet(zordered).filter(
        (F.col("user_id") >= umin) & (F.col("user_id") <= umin + 2)
    )
    # correctness of the filtered read
    expect = events_keys.filter(
        (F.col("user_id") >= umin) & (F.col("user_id") <= umin + 2)
    ).count()
    assert narrow.count() == expect
