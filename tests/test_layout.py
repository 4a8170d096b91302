"""Physical-layer proof for the Z-order layout (operators/layout.py):
the logical z-range disjointness is covered in
test_quantized_and_repetition.py — THESE tests check what the parquet
FOOTERS actually say, i.e. the min/max spans a file-skipping reader
sees, on a deterministic uniform key grid."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
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


def _uniform_grid(spark):
    """64k rows over a 1024x1024 key grid, keys hash-derived from the id
    (deterministic, uncorrelated with insertion order)."""
    return spark.range(65536).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(1024)).alias("u"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(1024)).alias("m"),
    )


def test_zorder_footer_spans_shrink_on_both_dims(spark_global, tmp_path):
    """Natural insertion order leaves every file spanning ~the full range
    of BOTH keys — footer min/max prunes nothing. The z-order layout must
    cut the summed per-file footer span of EACH key by >= 2x."""
    from kafka_connect_hdfs_spark.operators.layout import zorder_layout

    rows = _uniform_grid(spark_global)
    natural = str(tmp_path / "nat")
    zordered = str(tmp_path / "z")
    rows.repartitionByRange(16, "event_id").sortWithinPartitions(
        "event_id"
    ).write.parquet(natural)
    zorder_layout(rows, ["u", "m"], bits=10, n_files=16).drop(
        "_z"
    ).write.parquet(zordered)

    nat_files = glob.glob(natural + "/part-*.parquet")
    z_files = glob.glob(zordered + "/part-*.parquet")
    for col in ("u", "m"):
        s_nat = sum(_file_spans(nat_files, col))
        s_z = sum(_file_spans(z_files, col))
        assert s_z * 2 <= s_nat, (col, s_z, s_nat)


def test_zorder_manifest_prunes_and_loses_nothing(spark_global, tmp_path):
    """file_stats + prune_files over the z-ordered landing: a narrow
    range scan reads a strict subset of files AND returns exactly the
    full-scan answer."""
    from kafka_connect_hdfs_spark.operators.layout import (
        file_stats, prune_files, zorder_layout,
    )

    rows = _uniform_grid(spark_global)
    path = str(tmp_path / "landed")
    zorder_layout(rows, ["u", "m"], bits=10, n_files=16).drop(
        "_z"
    ).write.parquet(path)
    stats = file_stats(spark_global, path, ["u"])
    n_total = stats.count()
    pruned = prune_files(stats, "u", 100, 160)
    files = [r["file"] for r in pruned.collect()]
    assert 0 < len(files) < n_total  # actually skipped something
    got = (
        spark_global.read.parquet(*files)
        .filter(F.col("u").between(100, 160))
        .count()
    )
    want = rows.filter(F.col("u").between(100, 160)).count()
    assert got == want
