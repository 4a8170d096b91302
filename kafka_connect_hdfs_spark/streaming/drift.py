"""Streaming distribution-drift monitoring: fold each micro-batch's
quantized value-grid counts into a persisted grid mart, then score the
KS (or PSI) statistic against a frozen reference grid on demand — drift
gates are natively streaming in production (r08 verdict item 5), and
the landing should not re-scan its corpus to know its current value
distribution.

Because the grid is a table of exact integer COUNTS per quantized value
(:func:`operators.quality.quantized_counts`), it merges across
micro-batches by per-point addition — a distributive aggregate — so the
fold IS the incremental-mart machinery (:mod:`.mart`) keyed on ``q``:
same crash-recoverable two-rename swap, same stream-identity replay
guard, and the streamed grid is BIT-IDENTICAL to the batch grid over
the same records. The KS statistic computed from it
(:func:`operators.quality.ks_from_grids`) therefore equals the batch
:func:`operators.quality.ks_drift` exactly, which is what makes the
gate oracle-able.

Scale: each trigger shuffles ≤ |distinct grid values in the batch|
partial rows (map-side combined); the persisted state is bounded by the
value domain's granularity, not the stream length. Raw rows never
persist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kafka_connect_hdfs_spark.streaming.mart import start_mart_refresh


def start_ks_grid_refresh(
    stream: DataFrame,
    state_path: str,
    value_col: str,
    checkpoint: str,
    quantize_scale: int = 2,
    available_now: bool = True,
):
    """Start the grid-maintenance query; returns the StreamingQuery. The
    grid at ``state_path`` is a plain ``(q, n)`` parquet table readable
    between batches — score it any time with
    :func:`operators.quality.ks_from_grids` against a reference grid
    (same ``quantize_scale``, or the grids are not comparable)."""
    from pyspark.sql import functions as F

    unit = 10**quantize_scale
    v = F.col(value_col).cast("double") * F.lit(float(unit))
    m = F.when(v < 0, -F.floor(-v + F.lit(0.5))).otherwise(
        F.floor(v + F.lit(0.5))
    ).cast("bigint")
    # per-row grid points; refresh_aggregate's count fold makes the cells
    # (the stream-side twin of quality.quantized_counts — the groupBy
    # must live INSIDE the mart fold so replays stay idempotent)
    points = stream.select(m.alias("q"))
    return start_mart_refresh(
        points,
        state_path,
        keys=["q"],
        checkpoint=checkpoint,
        count_col="n",
        sum_cols=None,
        available_now=available_now,
    )


def start_psi_bucket_refresh(
    stream: DataFrame,
    state_path: str,
    value_col: str,
    checkpoint: str,
    lo: float,
    hi: float,
    n_buckets: int = 10,
    available_now: bool = True,
):
    """The PSI twin of :func:`start_ks_grid_refresh`: fold each
    micro-batch's equal-width bucket counts into a persisted
    ``(bucket, n)`` mart. ``lo``/``hi`` are the FROZEN reference min/max
    pinned at monitor setup (collect them once from the reference
    sample) — the bucket expression is the identical IEEE kernel as
    batch :func:`operators.quality.psi_drift`
    (:func:`operators.quality.bucket_counts`), so the streamed counts
    are bit-identical to the batch recompute and
    :func:`operators.quality.psi_from_counts` scores them identically.
    Out-of-range late values clamp to the edge buckets — exactly the
    drift signal."""
    from pyspark.sql import functions as F

    v = F.col(value_col).cast("double")
    if float(hi) == float(lo):
        b = F.lit(0)
    else:
        raw = (
            (v - F.lit(float(lo)))
            * F.lit(float(n_buckets))
            / F.lit(float(hi) - float(lo))
        )
        b = F.floor(
            F.greatest(F.lit(0.0), F.least(F.lit(float(n_buckets - 1)), raw))
        ).cast("int")
    points = stream.select(b.alias("bucket"))
    return start_mart_refresh(
        points,
        state_path,
        keys=["bucket"],
        checkpoint=checkpoint,
        count_col="n",
        sum_cols=None,
        available_now=available_now,
    )
