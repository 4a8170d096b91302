"""Crash-recoverable state-directory swap — the shared protocol behind
every foreachBatch-maintained parquet state table (streaming CDC upsert,
streaming mart refresh).

Protocol (two-rename publish, mirroring the reference's WAL
rename-is-the-commit discipline):

    1. recover: state missing but backup present ⇒ the previous run
       crashed between the two renames — restore the backup FIRST
       (otherwise the replayed batch rebuilds state from itself alone).
    2. compute the new state from (current state | None) and write it to
       a hidden sibling; optionally drop a marker file inside it (e.g.
       the last-applied batch id — parquet readers ignore underscore
       files) so the publish and the marker are ONE atomic unit.
    3. publish: rename live aside, rename new in, delete the backup
       LAST; on a failed publish rename, restore the backup and raise.

A crash anywhere leaves either the old or the new state recoverable;
the window where the live path is absent is two metadata ops wide and
healed by step 1 on the next batch.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """Single acquisition point for the Hadoop FileSystem handle used by
    the rename-protocol operators (state swap, relayout, merge). This is
    the FAULT-INJECTION SEAM: the chaos kill-point sweep
    (tests/test_chaos_killpoints.py) monkeypatches this function to wrap
    the returned fs in a mutation-counting proxy that dies at every
    rename/delete/create boundary in turn — so recovery is proven at
    EVERY boundary mechanically, not at hand-picked ones."""
    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(path).getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, Path


def _fs(spark: SparkSession, path: str):
    return hadoop_fs(spark, path)


def read_text(spark: SparkSession, path) -> str:
    """Read a small text/metadata file through the Hadoop FS API (works
    for any supported URI scheme) — the shared helper behind checkpoint
    metadata and tag-ref reads. ``path`` may be a string or an
    already-constructed Hadoop Path: a listStatus-produced Path must be
    opened directly, because round-tripping it through str() re-parses
    '#'/'%' as URI syntax and targets a different file (r07 review)."""
    if isinstance(path, str):
        fs, Path = _fs(spark, path)
        p = Path(path)
    else:
        p = path
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(p)
    try:
        jvm = spark._jvm
        buf = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, buf, 65536, False)
        return bytes(buf.toByteArray()).decode("utf-8")
    finally:
        stream.close()


def state_marker(
    spark: SparkSession, state_path: str, prefix: str
) -> "str | None":
    """The marker file name with ``prefix`` inside the live state dir
    (None when absent). Each swap writes at most one."""
    fs, Path = _fs(spark, state_path)
    if not fs.exists(Path(state_path)):
        return None
    for st in fs.listStatus(Path(state_path)):
        name = st.getPath().getName()
        if name.startswith(prefix):
            return name
    return None


def recover_state(spark: SparkSession, state_path: str, suffix: str) -> None:
    """Step-1 crash recovery of the two-rename swap, callable on its
    own: state missing but the ``_old`` backup present means the
    previous swap died between its renames — restore the backup.
    Callers that READ swap-published metadata (e.g. the changelog
    mirror's sync marker) before swapping must run this first, or a
    crash in that two-op window reads as 'no state yet'."""
    fs, Path = _fs(spark, state_path)
    parent, leaf = state_path.rstrip("/").rsplit("/", 1)
    old = f"{parent}/.{leaf}__{suffix}_old"
    if not fs.exists(Path(state_path)) and fs.exists(Path(old)):
        if not fs.rename(Path(old), Path(state_path)):
            raise IOError(f"{suffix} state swap: crash-recovery restore failed")
    elif fs.exists(Path(state_path)) and fs.exists(Path(old)):
        # live + backup: the publish landed and only the final backup
        # delete was lost — finish it (a marker-guarded caller may
        # never swap again, so the residue would otherwise persist)
        fs.delete(Path(old), True)


def swap_state_update(
    spark: SparkSession,
    state_path: str,
    update_fn: "Callable[[DataFrame | None], DataFrame]",
    suffix: str,
    marker: "str | None" = None,
) -> None:
    """Atomically replace the parquet dir at ``state_path`` with
    ``update_fn(current_state_or_None)`` via the two-rename protocol.
    ``suffix`` namespaces the hidden sibling dirs (``.<leaf>__<suffix>_new``
    / ``_old``) so protocols sharing a parent never collide."""
    fs, Path = _fs(spark, state_path)
    parent, leaf = state_path.rstrip("/").rsplit("/", 1)
    tmp = f"{parent}/.{leaf}__{suffix}_new"
    old = f"{parent}/.{leaf}__{suffix}_old"

    recover_state(spark, state_path, suffix)

    base = (
        spark.read.parquet(state_path)
        if fs.exists(Path(state_path))
        else None
    )
    out = update_fn(base)
    fs.delete(Path(tmp), True)
    out.write.parquet(tmp)
    if marker is not None:
        fs.create(Path(f"{tmp}/{marker}"), True).close()
    fs.delete(Path(old), True)
    if fs.exists(Path(state_path)):
        if not fs.rename(Path(state_path), Path(old)):
            raise IOError(f"{suffix} state swap: backup rename failed")
    if not fs.rename(Path(tmp), Path(state_path)):
        fs.rename(Path(old), Path(state_path))  # restore and fail
        raise IOError(f"{suffix} state swap: publish rename failed")
    fs.delete(Path(old), True)
