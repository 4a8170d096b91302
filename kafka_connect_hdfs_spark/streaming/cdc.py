"""Streaming CDC upsert: maintain a latest-state table from a changelog
stream with ``foreachBatch`` merges — the streaming counterpart of
:mod:`kafka_connect_hdfs_spark.operators.cdc` (batch latest/tombstone/
SCD2) and the live half of a CDC lakehouse pipeline. Reference analogue:
kafka-connect-hdfs appends immutably and defers compaction to Hive-side
jobs; here each micro-batch folds into the state table atomically.

Per micro-batch: reduce the batch to its latest row per key (version
order = (ts, tiebreak) descending), union with the current state, keep
the global latest per key, and swap the state directory atomically
(write-new + double-rename, the wap.py protocol). Arrival order across
micro-batches therefore CANNOT change the result — the final state is
the same latest-per-key the batch replay computes, which is what makes
the gate oracle-able.

Scale: state updates shuffle |batch ∪ state| rows on the key — the
standard streaming-upsert cost; for key-partitioned state tables the
union prunes to touched partitions (the merge.py partition-scoped
staging pattern applies unchanged).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _latest_per_key(
    df: DataFrame, key_cols: Sequence[str], order_cols: Sequence[str]
) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def start_cdc_upsert(
    stream: DataFrame,
    state_path: str,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    checkpoint: str,
    available_now: bool = True,
):
    """Start the upsert query; returns the StreamingQuery. The state
    table at ``state_path`` is parquet and readable between batches."""
    spark = stream.sparkSession

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        _merge_batch(spark, batch_df, state_path, key_cols, order_cols)

    writer = stream.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _merge_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    state_path: str,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> None:
    """One micro-batch fold through the shared crash-recoverable swap
    (statedir.swap_state_update — the ADVICE-r04 recovery plus the
    two-rename publish live there now, shared with streaming.mart).
    No replay marker needed: latest-per-key is IDEMPOTENT, so a batch
    re-delivered after a crash-past-publish merges to the same state."""
    from kafka_connect_hdfs_spark.statedir import swap_state_update

    latest = _latest_per_key(batch_df, key_cols, order_cols)

    def _upd(state: "DataFrame | None") -> DataFrame:
        if state is None:
            return latest
        return _latest_per_key(
            state.unionByName(latest), key_cols, order_cols
        )

    swap_state_update(spark, state_path, _upd, suffix="cdc")
