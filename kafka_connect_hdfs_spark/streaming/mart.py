"""Streaming incremental-mart maintenance: a ``foreachBatch`` loop that
folds every micro-batch into a persisted per-key aggregate table with
:func:`kafka_connect_hdfs_spark.merge.refresh_aggregate` — the live
counterpart of the batch mart refresh, and the aggregate twin of
:mod:`.cdc` (which maintains latest-state; this maintains count/sum
marts).

Per micro-batch: aggregate the batch (delta-sized shuffle), merge with
the current mart (keys-bounded), and publish with the SAME
crash-recoverable two-rename swap as :func:`.cdc._merge_batch` — write
new state to a hidden sibling, rename live aside, rename new in, drop
the backup last, restore a stranded backup on the next batch. Because
count/sum are distributive, arrival order across micro-batches cannot
change the result: the final mart equals the full batch rollup, which is
what makes the gate oracle-able.

Scale: each trigger costs O(|batch| + |mart|) — the corpus is never
re-scanned. This is how a 100 TB landing keeps its dashboards current
from the stream instead of re-aggregating nightly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def start_mart_refresh(
    stream: DataFrame,
    state_path: str,
    keys: Sequence[str],
    checkpoint: str,
    count_col: str = "n_rows",
    sum_cols: "dict[str, str] | None" = None,
    available_now: bool = True,
):
    """Start the mart-maintenance query; returns the StreamingQuery. The
    mart at ``state_path`` is plain parquet, readable between batches."""
    spark = stream.sparkSession

    def _refresh(batch_df: DataFrame, batch_id: int) -> None:
        _refresh_batch(
            spark, batch_df, state_path, list(keys), count_col, sum_cols
        )

    writer = stream.writeStream.foreachBatch(_refresh).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _refresh_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    state_path: str,
    keys: "list[str]",
    count_col: str,
    sum_cols: "dict[str, str] | None",
) -> None:
    from kafka_connect_hdfs_spark.merge import refresh_aggregate

    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(state_path).getFileSystem(spark._jsc.hadoopConfiguration())

    parent, leaf = state_path.rstrip("/").rsplit("/", 1)
    tmp = f"{parent}/.{leaf}__mart_new"
    old = f"{parent}/.{leaf}__mart_old"
    # crash recovery (the cdc._merge_batch protocol): a crash between the
    # swap's two renames leaves the mart ONLY at the backup path; without
    # the restore the replayed batch would rebuild the mart from itself
    # alone, silently dropping every previously folded batch.
    if not fs.exists(Path(state_path)) and fs.exists(Path(old)):
        if not fs.rename(Path(old), Path(state_path)):
            raise IOError("mart refresh: crash-recovery restore failed")

    base = (
        spark.read.parquet(state_path)
        if fs.exists(Path(state_path))
        else None
    )
    refreshed = refresh_aggregate(
        base, batch_df, keys, count_col=count_col, sum_cols=sum_cols
    )
    fs.delete(Path(tmp), True)
    refreshed.write.parquet(tmp)
    fs.delete(Path(old), True)
    if fs.exists(Path(state_path)):
        if not fs.rename(Path(state_path), Path(old)):
            raise IOError("mart refresh: backup rename failed")
    if not fs.rename(Path(tmp), Path(state_path)):
        fs.rename(Path(old), Path(state_path))  # restore and fail
        raise IOError("mart refresh: publish rename failed")
    fs.delete(Path(old), True)
