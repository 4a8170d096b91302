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
    """Repartition up to defaultParallelism×multiplier iff under-partitioned.

    Streaming frames pass through untouched (partition introspection is a
    batch-only action; micro-batch parallelism comes from the source's own
    splitting) — this is what lets every corpus operator compose with
    readStream unchanged.
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiplier
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for skewed keys.

    Phase 1 groups by (key, salt) — a hot key splits across ``salt_buckets``
    reducers; phase 2 re-aggregates the per-salt partials by key. Supported
    aggs: {"out_col": (fn, in_col)} with fn in sum/count/min/max — the
    partial-mergeable functions.

    When AQE's skew handling isn't enough (single giant groupBy key rather
    than a skewed join), this is the standard manual remedy; the salt is
    deterministic (hash of the full row spread via monotonically increasing
    id would be non-deterministic on retry — use a stable column hash).
    """
    salt = (F.xxhash64(*[F.col(c) for c in df.columns]) % salt_buckets).alias("_salt")
    phase1_aggs = []
    phase2_aggs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            phase1_aggs.append(F.count(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "sum":
            phase1_aggs.append(F.sum(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            phase1_aggs.append(F.min(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            phase1_aggs.append(F.max(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-mergeable agg {fn}")
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*phase1_aggs)
    return partial.groupBy(*keys).agg(*phase2_aggs)


def md5_int48(col: Column) -> Column:
    """Deterministic 48-bit integer from md5 hex (first 12 chars).

    DuckDB-replayable as ``('0x' || substr(md5(x),1,12))::BIGINT``; 48 bits
    leaves int64 headroom for universal-hash multiplies.
    """
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the big side salts its key deterministically
    (md5-derived, stable across retries), the small side replicates
    ``salt_buckets``× so every (key, salt) pair finds its match — a hot key
    splits across ``salt_buckets`` reducers instead of melting one task.

    Use when AQE's skew-join splitting isn't available (pre-shuffle
    bucketed layouts) or the small side is just over the broadcast
    threshold. For genuinely broadcast-small dims prefer
    ``broadcast(small)`` — zero shuffle beats a salted one.

    Supported: inner and left joins (right/full would need null-salt rows
    on the replicated side).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    # salt varies per ROW (full-row hash), never per key — a per-key salt
    # would land every row of the hot key in one bucket again; full-row
    # hashing is deterministic on retry, unlike rand()/monotonic ids.
    # pmod, not abs+%: abs(Long.MIN_VALUE) stays negative in Spark, and a
    # negative salt has no replicated match — the row would silently drop.
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)
    ).cast("int")
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")
