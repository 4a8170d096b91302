"""Changelog compaction operators — Kafka log-compaction semantics in batch.

The reference lands an append-only event log (SURVEY.md §2.1); the natural
companion for a CDC/changelog topic is *compaction*: reduce the log to the
latest record per key, honoring tombstones (Kafka's null-value deletes —
compare the broker's cleanup.policy=compact contract, which the reference
relies on upstream but never materializes downstream).

Scale design: ``latest_state`` is ONE ``max(struct(...))`` aggregate — a
lexicographic max that Spark partial-aggregates map-side, so each executor
forwards one candidate row per key per partition and the single shuffle
carries keys + one struct, never the log. The window-function phrasing
(``row_number() OVER (PARTITION BY key ORDER BY ts DESC) = 1``) computes the
same answer but must shuffle and SORT every log row; at 100 TB the agg form
is the only viable plan. The ordering struct leads with the timestamp and a
unique id tie-break, making the result total-order deterministic even when
timestamps collide.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_state(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_cols: Sequence[str] = ("event_id",),
    value_cols: Sequence[str] = ("event_type", "value"),
) -> DataFrame:
    """Latest record per key: the compacted state table of a changelog.

    Output columns: ``key_col``, then ``last_<c>`` for the timestamp, each
    tie-break column, and each value column.

    ``tie_cols`` must make (ts, *tie_cols) unique per key (a monotone
    record id does); ties are then impossible rather than
    engine/partition-dependent — the same determinism discipline as the
    hash-based samplers.
    """
    ordered = F.struct(
        F.col(ts_col), *[F.col(c) for c in tie_cols], *[F.col(c) for c in value_cols]
    )
    out_cols = [ts_col, *tie_cols, *value_cols]
    agg = df.groupBy(key_col).agg(F.max(ordered).alias("_last"))
    return agg.select(
        key_col, *[F.col(f"_last.{c}").alias(f"last_{c}") for c in out_cols]
    )


def compact_changelog(
    df: DataFrame,
    tombstone_types: Sequence[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_cols: Sequence[str] = ("event_id",),
    value_cols: Sequence[str] = ("event_type", "value"),
) -> DataFrame:
    """Compact a changelog with delete semantics: keys whose LATEST record
    is a tombstone disappear from the state table entirely (Kafka
    compaction's null-value contract, expressed over a type column).

    A key deleted mid-stream but re-created later correctly survives —
    only the final record decides. Same single-aggregate plan as
    ``latest_state`` plus a map-side filter on the compacted (small) side.
    """
    state = latest_state(
        df, key_col=key_col, ts_col=ts_col, tie_cols=tie_cols, value_cols=value_cols
    )
    return state.filter(~F.col(f"last_{type_col}").isin(list(tombstone_types)))


def scd2_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_cols: Sequence[str] = ("event_type", "value"),
    tie_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a changelog into validity
    intervals — each change record becomes a row with
    ``[valid_from, valid_to)`` where ``valid_to`` is the next change's
    timestamp for that key (NULL for the current version, with
    ``is_current`` flagged) — the dimension shape behind every as-of
    reporting join.

    Scale: one exchange on the key, one per-partition sort shared by the
    lead() window — the same single-window cost as any per-key ordering;
    the result is dimension-sized, not log-sized, only if the caller
    pre-compacts equal-value runs (not done here: every change row is
    kept, which is SCD2's contract).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, *tie_cols)
    return df.select(
        F.col(key_col),
        F.col(ts_col).alias("valid_from"),
        *[F.col(c) for c in tie_cols],
        *[F.col(c) for c in value_cols],
        F.lead(F.col(ts_col)).over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
