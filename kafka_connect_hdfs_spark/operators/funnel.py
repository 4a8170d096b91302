"""Ordered-sequence funnel analysis — MATCH_RECOGNIZE-lite over event logs.

Semantics: per user, stage 1 completes at the FIRST stage-1 event; stage
i+1 completes at the first stage-(i+1) event STRICTLY after stage i (and
within ``horizon_hours`` of it, when set). The classic conversion funnel
(signup → view → purchase) no Spark built-in expresses directly.

Scale: irrelevant event types are filtered map-side BEFORE the one shuffle
on user_id; each user's remaining events fold through a sorted-array
``aggregate`` — whole-stage codegen, no Python, no window functions, no
re-scan per stage (the equivalent staged-min formulation scans and joins
the log once PER STAGE). Per-user state is the user's own funnel-relevant
events; with a horizon set, pre-filtering to the analysis window bounds it
the way production funnels run.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_times(
    df: DataFrame,
    stages: Sequence[str],
    horizon_hours: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """Per-user funnel completion times: ``(user, t0, t1, ..., t{k-1})``
    with ``t_i`` the stage-i completion timestamp (null = never reached).
    """
    k = len(stages)
    evs = df.filter(F.col(type_col).isin(list(stages)))
    per_user = evs.groupBy(user_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("ts"),
                    F.col(tie_col).alias("tid"),
                    F.col(type_col).alias("tp"),
                )
            )
        ).alias("evs")
    )

    init = F.struct(
        *[F.lit(None).cast("timestamp").alias(f"t{i}") for i in range(k)]
    )

    def step(acc, e):
        new_fields = []
        for i in range(k):
            fill = acc[f"t{i}"].isNull() & (e["tp"] == stages[i])
            if i > 0:
                prev = acc[f"t{i - 1}"]
                fill = fill & prev.isNotNull() & (e["ts"] > prev)
                if horizon_hours is not None:
                    fill = fill & (
                        e["ts"] <= prev + F.expr(f"INTERVAL {horizon_hours} HOURS")
                    )
            new_fields.append(
                F.when(fill, e["ts"]).otherwise(acc[f"t{i}"]).alias(f"t{i}")
            )
        return F.struct(*new_fields)

    folded = F.aggregate(F.col("evs"), init, step)
    return per_user.select(
        user_col, *[folded[f"t{i}"].alias(f"t{i}") for i in range(k)]
    )


def funnel_counts(
    df: DataFrame,
    stages: Sequence[str],
    horizon_hours: int | None = None,
    **kwargs,
) -> DataFrame:
    """Stage-level rollup of :func:`funnel_times`:
    ``(stage, stage_type, n_users)`` — users reaching each stage. The
    per-stage counts aggregate the (users × k) table; the reshape runs on
    the single result row.
    """
    k = len(stages)
    times = funnel_times(df, stages, horizon_hours=horizon_hours, **kwargs)
    agg = times.agg(
        *[F.count(f"t{i}").alias(f"n{i}") for i in range(k)]
    )
    return agg.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i + 1).alias("stage"),
                    F.lit(stages[i]).alias("stage_type"),
                    F.col(f"n{i}").alias("n_users"),
                )
                for i in range(k)
            ])
        ).alias("s")
    ).select("s.stage", "s.stage_type", "s.n_users")


def cohort_retention(
    df: DataFrame,
    anchor_type: str = "signup",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Cohort retention matrix: users grouped by the week of their first
    ``anchor_type`` event; for each (cohort_week, weeks_since_anchor), the
    distinct users still active — the retention table behind every
    "week-4 retention" metric.

    Scale: the anchor pass and the activity join both key on ``user_col``
    — ONE co-partitioned shuffle key end to end (Spark reuses the exchange
    under AQE; with the events table bucketed by user the whole operator
    is shuffle-free). Week arithmetic is integer epoch math, deterministic
    across engines. The countDistinct shuffles (cohort, week, user)
    triples — at 100 TB swap in the HLL sketch from
    :mod:`..operators.sketches` at the same call site.
    """
    anchor = (
        df.filter(F.col(type_col) == anchor_type)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t0"))
    )
    joined = df.join(anchor, user_col).filter(F.col(ts_col) >= F.col("_t0"))
    return (
        joined.select(
            F.date_format(F.date_trunc("week", F.col("_t0")), "yyyy-MM-dd").alias(
                "cohort_week"
            ),
            (
                (
                    F.unix_timestamp(ts_col) - F.unix_timestamp("_t0")
                ) / F.lit(604800)
            ).cast("bigint").alias("week_n"),
            F.col(user_col),
        )
        .groupBy("cohort_week", "week_n")
        .agg(F.countDistinct(user_col).alias("n_active"))
    )


def assemble_sessions(
    df: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Conversation/trajectory assembly — the event-log → sequence-dataset
    step of a behavioral / agentic training pipeline: per user, events are
    cut into sessions at ``gap_minutes`` inactivity gaps, and each session
    becomes ONE row carrying its ordered action sequence (fingerprinted,
    so the row stays narrow) plus count/duration features. The output is
    what sequence-model training consumes (one example per session).

    Ordering inside a session is total and deterministic: (ts, event id)
    — so the fingerprint is reproducible across partitionings and engines
    (DuckDB replays it with ``string_agg(... ORDER BY ts, id)``).

    Scale: ONE shuffle key (user) end to end — the session-gap window, the
    session groupBy, and the sequence assembly all partition by user (the
    groupBy adds the session id, a subdivision of the same key; Spark
    reuses the exchange under AQE). collect_list holds one session's
    events, bounded by the gap cut, never a user's full history.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_ts = F.lag(ts_col).over(w)
    new_sess = (
        prev_ts.isNull()
        | (
            F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
            > gap_minutes * 60
        )
    ).cast("long")
    with_sess = df.select(
        F.col(user_col),
        F.col(ts_col),
        F.col(id_col),
        F.col(type_col),
    ).withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ordered = F.array_sort(
        F.collect_list(
            F.struct(F.col(ts_col), F.col(id_col), F.col(type_col))
        )
    )
    seq = F.array_join(F.transform(ordered, lambda s: s[type_col]), " ")
    return (
        with_sess.groupBy(user_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            (
                F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
            ).cast("bigint").alias("duration_sec"),
            F.md5(seq).alias("sequence_fp"),
        )
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    ``(prev_type, next_type, n_transitions, p)`` where ``p`` is the
    row-normalized transition probability. The sequence-model prior of
    behavioral analytics (and the label table for next-event prediction).

    Scale: ONE shuffle on the user key for the lag window (the pruned
    (user, ts, tiebreak, type) projection is all that moves), then a
    transition-pair aggregation whose shuffle is bounded by
    |event types|² — constant-sized regardless of corpus scale. The
    per-prev normalizer comes from a window over that constant-sized
    count table, not a second pass over the data.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        events.select(user_col, ts_col, tiebreak_col, type_col)
        .withColumn("prev_type", F.lag(type_col).over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type"), F.col(type_col).alias("next_type"))
        .agg(F.count("*").alias("n_transitions"))
    )
    wp = Window.partitionBy("prev_type")
    return pairs.withColumn(
        "p",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wp), 6
        ),
    )


def decayed_engagement(
    df: DataFrame,
    k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Recency-weighted engagement ranking: each event contributes
    ``value / (1 + age_days)`` (hyperbolic decay against the corpus's
    newest event) and users rank by their decayed sum — the freshness-
    aware activity score feeds retention triage and training-data
    recency mixing, where a raw lifetime sum lets long-dead heavy users
    dominate.

    Hyperbolic (rational) decay rather than exponential half-life:
    ``pow()`` is libm-implementation-shaped and can differ across engines
    in the last ulp, while ``v / (1 + d)`` with integer ``d`` is one
    identical IEEE op. Per-event scores quantize to HALF-UP micro-ints
    BEFORE summation (fp_sum_micro_q6 — float partial sums are
    partition-order-dependent), the exact integer sum crosses to double
    via the hi/lo split, and the surfaced score is q6 — bit-reproducible
    for any partitioning and oracle-replayable.

    Returns the top ``k`` users: ``(user_id, n_events, score)``,
    ties broken by user id.

    Scale: one single-row max(ts) broadcast, one map-side projection
    (int day-diff + one divide + micro-int), one exact per-user sum
    (partial-combining), one top-k sort of the per-user table.
    """
    from kafka_connect_hdfs_spark.operators.similarity import (
        dec_to_double, fp_sum_micro_q6, q6_col,
    )

    ref = df.agg(F.max(F.to_date(F.col(ts_col))).alias("_ref"))
    scored = df.crossJoin(F.broadcast(ref)).select(
        F.col(user_col),
        (
            F.col(value_col).cast("double")
            / (
                F.lit(1)
                + F.datediff(F.col("_ref"), F.to_date(F.col(ts_col)))
            ).cast("double")
        ).alias("_w"),
    )
    per_user = scored.groupBy(user_col).agg(
        F.count("*").alias("n_events"),
        fp_sum_micro_q6(F.col("_w")).alias("_s"),
    )
    out = per_user.select(
        user_col,
        "n_events",
        q6_col(dec_to_double("_s") / F.lit(1e6)).alias("score"),
    )
    return out.orderBy(F.desc("score"), F.asc(user_col)).limit(k)
