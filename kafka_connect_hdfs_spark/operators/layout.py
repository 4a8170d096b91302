"""Data-layout operators: Z-order clustering for multi-dimensional file
skipping.

The reference's partitioners (SURVEY.md §2.3) prune on ONE directory
hierarchy; queries filtering on a second dimension still scan everything
inside a partition. Z-ordering (the Morton curve — the same layout Delta
Lake's OPTIMIZE ZORDER BY and Databricks clustering use) interleaves the
bits of several columns into one sort key, so ranges of the key are small
hyper-rectangles: sorting files by z-value gives every indexed column
locality, and a min/max-stats file index can skip files for predicates on
ANY of them.

Scale: the z-value is a pure whole-stage-codegen bit fold (no UDF, no
shuffle); the layout pass is ONE repartitionByRange on the z-value — the
same single shuffle a plain sorted write costs, but buying skip-ability on
d dimensions instead of 1.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zvalue(cols: Sequence[str], bits: int = 16) -> F.Column:
    """Morton (Z-curve) interleave of ``len(cols)`` non-negative integer
    columns, ``bits`` bits each: bit ``i`` of column ``j`` lands at output
    bit ``i * n_cols + j``. Columns must already be bucketed to
    ``[0, 2^bits)`` (rank, width_bucket, or modulo — the caller picks the
    quantization that matches its predicate granularity).

    Total output bits = ``bits * len(cols)`` must stay < 63.
    """
    n = len(cols)
    if bits * n >= 63:
        raise ValueError(f"bits*len(cols) = {bits * n} overflows a signed long")
    terms = " + ".join(
        f"shiftleft(shiftright(cast({c} as bigint), i) & 1L, {n}*i + {j})"
        for j, c in enumerate(cols)
    )
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> acc + {terms})"
    )


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    n_files: int = 64,
) -> DataFrame:
    """Cluster ``df`` for writing: z-value over ``cols``, range-partitioned
    into ``n_files`` splits and sorted within each — every output file then
    covers a contiguous z-range (disjoint across files), which is exactly
    what a min/max file index needs to skip on any of the indexed columns.

    Write with ``.write.parquet(...)`` directly — the partitioning IS the
    file layout; no partition directories are involved.
    """
    return (
        df.withColumn("_z", zvalue(cols, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
    )


def file_stats(spark, path: str, cols: Sequence[str]) -> DataFrame:
    """Per-file min/max column statistics over a parquet directory — the
    file-skipping index (what Delta/Iceberg keep in their manifests,
    FileUtils.java:151-176 is the reference's nearest analogue: it lists
    leaf files but keeps no stats). One distributed pass; output is
    file-count-sized: ``(file, n_rows, min_<c>, max_<c>, ...)``.

    Build it once after a :func:`zorder_layout` write and the manifest can
    answer "which files can contain x BETWEEN lo AND hi" for EVERY
    z-ordered column without opening a single footer.
    """
    df = spark.read.parquet(path)
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def prune_files(stats: DataFrame, col: str, lo, hi) -> DataFrame:
    """Select manifest rows whose ``[min_col, max_col]`` interval
    intersects ``[lo, hi]`` — the files a scan for ``col BETWEEN lo AND
    hi`` must read; every other file is provably irrelevant. Sound for
    any layout; the payoff (files actually skipped) comes from the
    clustering :func:`zorder_layout` provides.
    """
    return stats.filter(
        ~((F.col(f"max_{col}") < F.lit(lo)) | (F.col(f"min_{col}") > F.lit(hi)))
    )


def write_with_bloom_filters(
    df: DataFrame,
    path: str,
    bloom_cols: Sequence[str],
    ndv: int = 100_000,
    mode: str = "overwrite",
    disable_dictionary: bool = False,
) -> None:
    """Land parquet with per-column bloom filters — the point-lookup
    complement to min/max stats: range predicates skip via ``file_stats``/
    ``prune_files``; equality probes on high-cardinality columns (user ids,
    fingerprints) skip via blooms even when every file's [min,max] straddles
    the probe value. This is the parquet-native feature Delta/Iceberg expose
    as bloom filter indexes; Spark's parquet writer takes it as per-column
    write options.

    ``ndv`` sizes the filter (expected distinct values per file) — oversize
    rather than undersize: a saturated bloom skips nothing.

    Dictionary interplay (parquet-mr semantics, verified in the test):
    a column whose pages stay fully dictionary-encoded gets NO bloom —
    the dictionary page already answers membership exactly. At real scale
    high-cardinality columns overflow the dictionary and the bloom kicks
    in automatically; ``disable_dictionary`` forces it for small/test
    writes.
    """
    w = df.write.mode(mode)
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
        w = w.option(f"parquet.bloom.filter.expected.ndv#{c}", str(ndv))
        if disable_dictionary:
            w = w.option(f"parquet.enable.dictionary#{c}", "false")
    w.parquet(path)


def partition_profile(df: DataFrame) -> DataFrame:
    """Physical-partition skew report: rows per Spark partition (id, count,
    share of max). The first diagnostic to run when a stage straggles —
    a top-heavy profile means the upstream key needs salting
    (``functions.salted_agg``), AQE skew-join splitting, or a different
    partitioner.

    Scale: one count-per-partition aggregate (map-side, no data movement
    beyond one long per partition).
    """
    from pyspark.sql import Window

    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count("*").alias("n_rows"))
        .select(
            F.col("_pid").alias("partition_id"),
            "n_rows",
            F.round(
                F.col("n_rows") / F.max("n_rows").over(Window.partitionBy()), 4
            ).alias("share_of_max"),
        )
    )


def rebalance_for_write(df: DataFrame, *cols: str) -> DataFrame:
    """AQE rebalance before landing: inserts the REBALANCE hint so the
    final write produces evenly-sized files — splitting skewed partitions
    AND coalescing tiny ones at runtime (a fixed ``repartition(n)`` can't
    split a skewed hash bucket; ``coalesce`` can never split anything).
    Pass columns to co-locate rows while rebalancing (e.g. the partitionBy
    columns, so each output file stays single-partition-value).

    Target file size tunes via ``spark.sql.adaptive.advisoryPartitionSizeInBytes``.
    This is the write-side cure for the small-files problem at the source,
    complementing :mod:`..compaction` which repairs it after the fact.
    Requires AQE (on by default in this engine's session).
    """
    return df.hint("rebalance", *[F.col(c) for c in cols])
