"""Watermarked event-time windowed aggregation.

The reference has NO late-data handling — late records simply land in the
partition their timestamp encodes (SURVEY.md §2.9, TimeUtils.java:26-37).
Structured Streaming upgrades that: a watermark bounds state and drops
too-late rows deterministically, and windowed aggregates emit once final
(append mode). This is the streaming query surface a user of the landed
tables would run live instead of via Hive afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_hdfs_spark.functions import dec_sum_double


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per (event_type, tumbling window) counts with a late-data watermark.

    Works on a streaming OR batch DataFrame (batch ignores the watermark —
    same results as the landed-table query, which is the point: one
    definition, two execution modes).

    Scale: streaming state is one row per (type, window) — bounded by the
    watermark horizon; the aggregation is partial map-side like any groupBy.
    """
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            dec_sum_double(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def windowed_distinct_users(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Per tumbling window approximate distinct ``key_col`` (HLL sketch)
    with a late-data watermark — the live audience counter. The sketch is
    the POINT at streaming scale: exact distinct would hold every key in
    state forever; HLL state is a fixed-size register set per window,
    bounded by the watermark horizon. Same query runs in batch for the
    backfill (watermark ignored), which is what the gate exploits.
    """
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"))
        .agg(F.approx_count_distinct(key_col).alias("n_est"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_est",
        )
    )
