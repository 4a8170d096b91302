"""Shared column functions and parallelism helpers.

``fan_out`` fixes the small-input / heavy-compute mismatch: a 5 MB parquet
file arrives as ONE scan partition (maxPartitionBytes), so CPU-bound
per-row operators (shingling, hashing, vector math, Pandas UDF decode) run
single-threaded no matter how many cores exist. Repartitioning a small
input costs a trivial shuffle and unlocks full parallelism; a large input
(≥ target partitions) passes through untouched — so the call is safe to
leave in at 100 TB, where scans are already thousands of partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fan_out(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Repartition up to defaultParallelism×multiplier iff under-partitioned."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiplier
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def md5_int48(col: Column) -> Column:
    """Deterministic 48-bit integer from md5 hex (first 12 chars).

    DuckDB-replayable as ``('0x' || substr(md5(x),1,12))::BIGINT``; 48 bits
    leaves int64 headroom for universal-hash multiplies.
    """
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint")
