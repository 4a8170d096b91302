"""Small-file compaction for landed partitions.

A streaming sink writing every trigger produces many small files per
partition dir (the reference bounds this only via flush.size — small files
are its known operational pain; docs/hdfs_connector.rst advises sizing
flush.size accordingly). At 100 TB the read-side cost of millions of small
files dominates, so compaction is a first-class maintenance operator:

  - groups landed files per partition directory,
  - rewrites each directory to ceil(bytes / target) files,
  - atomically swaps via write-to-temp + directory rename (same
    temp-then-rename discipline as F5).

Scale: one job per compaction run; within the job each partition dir is an
independent task group (no cross-dir shuffle — ``repartition`` happens
within the dir's data only when needed). Run it off the ingest path (the
reference's Hive-sync pattern: maintenance decoupled from the hot path).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def compact_partitions(
    spark: SparkSession,
    table_path: str,
    fmt: str = "parquet",
    target_file_bytes: int = 256 * 1024 * 1024,   # reference parquet block size
    min_files_to_compact: int = 2,
) -> dict[str, tuple[int, int]]:
    """Compact every leaf partition directory under ``table_path``.

    Returns {relative_dir: (files_before, files_after)} for dirs rewritten.
    Uses Hadoop FS listing (works on hdfs:// and file:// alike) and the
    atomic-rename swap; readers either see the old file set or the new one.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    root = Path(table_path)
    fs = root.getFileSystem(conf)

    # find leaf dirs containing data files
    leaves: list[tuple[str, list, int]] = []

    def walk(p):
        entries = list(fs.listStatus(p))
        subdirs = [
            e for e in entries
            if e.isDirectory() and not e.getPath().getName().startswith(("_", "."))
        ]
        files = [
            e for e in entries
            if e.isFile() and not e.getPath().getName().startswith(("_", "."))
        ]
        if files and not subdirs:
            leaves.append(
                (p.toString(), files, sum(e.getLen() for e in files))
            )
        for d in subdirs:
            walk(d.getPath())

    walk(root)

    results: dict[str, tuple[int, int]] = {}
    # listStatus returns scheme-qualified paths (file:/...); qualify the
    # base the same way or the relative-slice cuts mid-string
    base_str = fs.makeQualified(root).toString().rstrip("/")
    for dir_str, files, total_bytes in leaves:
        if len(files) < min_files_to_compact:
            continue
        n_target = max(1, -(-total_bytes // target_file_bytes))  # ceil
        if n_target >= len(files):
            continue
        rel = dir_str[len(base_str):].lstrip("/")
        df = spark.read.format(fmt).load(dir_str)
        # hidden siblings ('.'-prefixed → invisible to Hadoop PathFilters and
        # Spark partition discovery) so readers never see a half-built dir
        parent, leaf = dir_str.rsplit("/", 1)
        tmp_dir = f"{parent}/.{leaf}__compact_tmp"
        old_dir = f"{parent}/.{leaf}__compact_old"
        fs.delete(Path(tmp_dir), True)  # clear any crashed prior attempt
        fs.delete(Path(old_dir), True)
        df.repartition(n_target).write.format(fmt).mode("overwrite").save(tmp_dir)
        n_new = sum(
            1 for e in fs.listStatus(Path(tmp_dir))
            if e.isFile() and not e.getPath().getName().startswith(("_", "."))
        )
        # atomic swap via two directory renames: readers see the old file set
        # or the new one; a crash in between leaves the data intact in
        # old_dir (recoverable), never a partially-deleted live dir
        fs.rename(Path(dir_str), Path(old_dir))
        fs.rename(Path(tmp_dir), Path(dir_str))
        fs.delete(Path(old_dir), True)
        results[rel] = (len(files), n_new)
    return results


def relayout_partitions(
    spark: SparkSession,
    table_path: str,
    new_partition_cols: "list[str]",
    fmt: str = "parquet",
) -> "dict[str, int]":
    """Partition-layout EVOLUTION: rewrite the landed table at
    ``table_path`` so its directory layout partitions by
    ``new_partition_cols`` — the day a query pattern changes (hourly
    dashboards over a type-partitioned landing; user-keyed erasure over
    a date-partitioned one) and the old layout's partition pruning stops
    helping. The reference has no answer (its layout is fixed at write
    time by the partitioner class); this is the maintenance operator
    that re-derives it.

    Mechanics: one read of the current table (partition columns
    recovered from the directory structure by Spark's discovery), one
    partitioned write to a hidden sibling, then the same crash-
    recoverable two-rename swap as :func:`compact_partitions` — readers
    see the old tree or the new one, never a mix; a crash between
    renames leaves the data intact in the ``.__relayout_old`` sibling.

    Returns ``{new_leaf_dir: n_files}`` for the rewritten tree.

    Scale: the rewrite is ONE shuffle on the new partition key (the
    write's ``partitionBy`` clustering) over each old partition's data —
    at 100 TB run it per OLD-partition slice (the dirs are independent;
    loop the old leaves through this same swap) rather than one global
    job; the operator keeps whole-table semantics because the gate's
    fidelity contract is table-level.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    root = Path(table_path)
    fs = root.getFileSystem(conf)
    if not fs.exists(root):
        raise FileNotFoundError(table_path)

    df = spark.read.format(fmt).load(table_path)
    missing = [c for c in new_partition_cols if c not in df.columns]
    if missing:
        raise ValueError(
            f"new partition columns {missing} not in table columns "
            f"{df.columns}"
        )
    parent, leaf = table_path.rstrip("/").rsplit("/", 1)
    tmp_dir = f"{parent}/.{leaf}__relayout_tmp"
    old_dir = f"{parent}/.{leaf}__relayout_old"
    fs.delete(Path(tmp_dir), True)
    fs.delete(Path(old_dir), True)
    (
        df.write.format(fmt)
        .partitionBy(*new_partition_cols)
        .mode("overwrite")
        .save(tmp_dir)
    )
    if not fs.rename(Path(table_path.rstrip("/")), Path(old_dir)):
        raise IOError(f"relayout swap-out rename failed for {table_path}")
    if not fs.rename(Path(tmp_dir), Path(table_path.rstrip("/"))):
        # restore the original tree before surfacing the failure
        fs.rename(Path(old_dir), Path(table_path.rstrip("/")))
        raise IOError(f"relayout swap-in rename failed for {table_path}")
    fs.delete(Path(old_dir), True)

    out: "dict[str, int]" = {}
    # listStatus returns scheme-qualified paths (file:/...); qualify the
    # base the same way or the relative-slice cuts mid-string
    base_str = fs.makeQualified(root).toString().rstrip("/")

    def walk(p):
        entries = list(fs.listStatus(p))
        subdirs = [
            e for e in entries
            if e.isDirectory() and not e.getPath().getName().startswith(("_", "."))
        ]
        files = [
            e for e in entries
            if e.isFile() and not e.getPath().getName().startswith(("_", "."))
        ]
        if files and not subdirs:
            rel = p.toString()[len(base_str):].lstrip("/")
            out[rel] = len(files)
        for d in subdirs:
            walk(d.getPath())

    walk(root)
    return out
