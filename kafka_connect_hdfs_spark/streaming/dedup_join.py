"""Streaming dedup + stream-stream join — the Spark-idiomatic equivalents of
two reference guarantees:

- The reference's exactly-once delivery (WAL + offset-encoded filenames,
  SURVEY.md §2.5, wal/FSWAL.java:54-135) makes Kafka replays invisible in
  the landed files. With an at-least-once source, Structured Streaming
  expresses the same guarantee as event-level dedup by record identity
  within a watermark horizon (`dropDuplicatesWithinWatermark`) — state is
  bounded by the watermark, so it runs forever at any scale.

- The reference joins nothing (SURVEY.md §2.9); downstream Hive queries do.
  The streaming query surface includes the stream-stream inner join with
  symmetric time bounds — the watermark lets Spark evict both join-state
  sides, which is what keeps the operator viable on unbounded input.

Scale: state store size is (keys within watermark window) — tune the delay
to the real late-data bound, never "1 day to be safe" at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate records by ``keys`` arriving within the watermark
    horizon (replay suppression for at-least-once sources).

    Reference behavior reproduced: a record (topic, partition, offset)
    re-delivered after a failure lands exactly once
    (TopicPartitionWriter.java:636-650 tracks offsets for the same purpose).
    """
    out = df.withWatermark(ts_col, watermark_delay)
    if hasattr(out, "dropDuplicatesWithinWatermark"):
        return out.dropDuplicatesWithinWatermark(keys)
    # batch DataFrames (and very old Spark) fall back to plain dedup —
    # identical result set on bounded input
    return out.dropDuplicates(keys)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_lag: str = "15 minutes",
    watermark_delay: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with a symmetric event-time bound:
    |left.ts - right.ts| <= max_lag. Both inputs are watermarked so the join
    state for expired time ranges is evicted.

    Returns columns of both sides with the right side's ``on`` and ts
    dropped (they equal/bound the left's).
    """
    l = left.withWatermark(left_ts, watermark_delay)
    r = right.withWatermark(right_ts, watermark_delay)
    r2 = r.select(
        F.col(on).alias("__rk"),
        F.col(right_ts).alias("__rts"),
        *[c for c in r.columns if c not in (on, right_ts)],
    )
    cond = (
        (F.col(on) == F.col("__rk"))
        & (F.col("__rts") >= F.col(left_ts) - F.expr(f"INTERVAL {max_lag}"))
        & (F.col("__rts") <= F.col(left_ts) + F.expr(f"INTERVAL {max_lag}"))
    )
    return l.join(r2, cond, how).drop("__rk", "__rts")


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment: join the event stream against a dimension
    table at ingest (user → account tier, topic → schema metadata — the
    lookup every landing pipeline performs before partitioning).

    The static side is broadcast-hinted: each micro-batch ships the dim
    table to executors and the stream side never shuffles — the only plan
    that works when the stream is 100 TB/day and the dim is millions of
    rows. Spark re-resolves the static side per micro-batch, so a dim
    backed by files/Delta picks up updates between batches without
    restarting the query (the streaming analogue of the reference's
    per-batch schema-registry lookup, SURVEY.md §2.3).

    No watermark is needed: stream-static joins keep no state.
    """
    return stream.join(F.broadcast(dim), on=on, how=how)
