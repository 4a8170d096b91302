"""Streaming sketch maintenance: fold each micro-batch's count-min cells
into a persisted sketch table — live heavy-hitter screening over an
unbounded stream with BOUNDED state (depth × width cells, ~1024 rows,
regardless of key cardinality or stream length).

Because a count-min sketch is a grid of COUNTS, it merges across
micro-batches by per-cell addition — a distributive aggregate — so the
fold IS the incremental-mart machinery (:mod:`.mart`) keyed on
``(r, bucket)``: same crash-recoverable two-rename swap, same
stream-identity replay guard, and the streamed sketch is BIT-IDENTICAL
to the batch sketch over the same records (exact integer cells — no
approximation drift from batching), which is what makes the gate
oracle-able.

Scale: each trigger shuffles ≤ depth × width partial rows per partition
(the cells partial-aggregate map-side inside refresh_aggregate); the
persisted state never exceeds depth × width rows. The raw keys never
shuffle and never persist — this is the privacy-friendly shape too.
"""

from __future__ import annotations

from kafka_connect_hdfs_spark.streaming.mart import start_mart_refresh


def start_cms_refresh(
    stream,
    state_path: str,
    key_col: str,
    checkpoint: str,
    depth: int = 4,
    width: int = 256,
    available_now: bool = True,
):
    """Start the sketch-maintenance query; returns the StreamingQuery.
    The sketch at ``state_path`` is a plain ``(r, bucket, c)`` parquet
    table readable between batches by :func:`operators.sketches.cms_estimate`."""
    from kafka_connect_hdfs_spark.operators.sketches import cms_cells

    cells = cms_cells(stream, key_col, depth=depth, width=width)
    return start_mart_refresh(
        cells,
        state_path,
        keys=["r", "bucket"],
        checkpoint=checkpoint,
        count_col="c",
        sum_cols=None,
        available_now=available_now,
    )
