"""Targeted erasure: keys gone, untouched partition dirs byte-identical."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafka_connect_hdfs_spark.erasure import erase_keys
from kafka_connect_hdfs_spark.session import load_table


def _file_state(root):
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[p] = (st.st_size, st.st_mtime_ns, st.st_ino)
    return out


def test_erase_keys_targets_only_affected_dirs(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "bucket", F.pmod(F.col("user_id"), F.lit(8))
    )
    path = str(tmp_path / "landed")
    ev.write.partitionBy("bucket").parquet(path)
    n0 = spark.read.parquet(path).count()

    # erase two users from one bucket → exactly one dir rewritten
    victims = [r.user_id for r in ev.filter(F.col("bucket") == 3)
               .select("user_id").distinct().limit(2).collect()]
    before = _file_state(path)
    stats = erase_keys(spark, path, "user_id", victims)
    after = _file_state(path)

    assert stats["n_dirs_rewritten"] == 1
    assert stats["n_rows_erased"] > 0
    back = spark.read.parquet(path)
    assert back.filter(F.col("user_id").isin(victims)).count() == 0
    assert back.count() == n0 - stats["n_rows_erased"]
    # untouched dirs: every surviving original file byte-identical (same
    # inode and mtime — never rewritten, not even re-copied)
    untouched_before = {p: v for p, v in before.items() if "/bucket=3/" not in p}
    untouched_after = {p: v for p, v in after.items() if "/bucket=3/" not in p}
    assert untouched_before == untouched_after

    # DataFrame-shaped key set takes the anti-join path, same result
    df_victims = spark.createDataFrame([(v,) for v in victims], "user_id long")
    stats2 = erase_keys(spark, path, "user_id", df_victims)
    assert stats2["n_rows_erased"] == 0  # idempotent: nothing left to erase
