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
            spark,
            batch_df,
            state_path,
            list(keys),
            count_col,
            sum_cols,
            batch_id=batch_id,
        )

    writer = stream.writeStream.foreachBatch(_refresh).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_MARKER_PREFIX = "_applied_"


def _refresh_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    state_path: str,
    keys: "list[str]",
    count_col: str,
    sum_cols: "dict[str, str] | None",
    batch_id: "int | None" = None,
) -> None:
    """Fold one micro-batch through the shared crash-recoverable swap
    (statedir.swap_state_update). UNLIKE the CDC upsert, an additive
    count/sum fold is NOT idempotent — a batch re-delivered after a
    crash that landed past the publish but before the streaming offset
    commit would double-count — so the last-applied batch id rides as a
    marker file INSIDE the swapped state dir (atomic with the data;
    parquet readers ignore underscore files) and an already-applied
    batch id is skipped."""
    from kafka_connect_hdfs_spark.merge import refresh_aggregate
    from kafka_connect_hdfs_spark.statedir import (
        state_marker, swap_state_update,
    )

    if batch_id is not None:
        m = state_marker(spark, state_path, _MARKER_PREFIX)
        if m is not None and batch_id <= int(m[len(_MARKER_PREFIX):]):
            return  # replayed batch: already folded into the mart

    def _upd(state: "DataFrame | None") -> DataFrame:
        return refresh_aggregate(
            state, batch_df, keys, count_col=count_col, sum_cols=sum_cols
        )

    swap_state_update(
        spark,
        state_path,
        _upd,
        suffix="mart",
        marker=(
            f"{_MARKER_PREFIX}{batch_id}" if batch_id is not None else None
        ),
    )
