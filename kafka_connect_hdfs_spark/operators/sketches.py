"""Mergeable-sketch operators (Apache DataSketches via Spark built-ins).

Beyond the reference's surface (SURVEY.md §2.9 — its query layer is
Hive-delegated): at 100 TB, ``count(DISTINCT ...)`` is the classic scale
cliff — it shuffles every distinct (group, value) pair. The HLL sketch is
the production answer: a fixed-size (~2^lg_k bytes) register array that
partial-aggregates map-side, merges associatively across partitions, days,
and clusters, and answers within ~1.6%/sqrt(2^(lg_k-12)) relative error.
The same mergeability gives incremental rollups: keep one sketch per
(group, day), union at query time — never rescan history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_with_sketch(
    df: DataFrame,
    group_col: str,
    count_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """Per-group exact distinct count alongside the HLL estimate:
    ``(group, n_exact, n_est)``. The exact side is the ground truth the
    sketch is judged against (and the operator you DELETE at 100 TB,
    keeping only the sketch).
    """
    return df.groupBy(group_col).agg(
        F.countDistinct(count_col).alias("n_exact"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(count_col), F.lit(lg_k))
        ).alias("n_est"),
    )


def daily_sketch_rollup(
    df: DataFrame,
    group_col: str,
    count_col: str,
    ts_col: str = "ts",
    lg_k: int = 14,
) -> DataFrame:
    """Incremental distinct-count rollup: one HLL sketch per (group, day)
    — the materialization a streaming/backfill pipeline appends to — then
    a union-merge to per-group estimates ``(group, n_union)``. Unioning
    per-day sketches is lossless for a fixed ``lg_k``: the union's
    register array equals the one a single pass would build, so the
    estimate matches :func:`distinct_with_sketch` exactly while reading
    only day-sized increments.
    """
    daily = df.withColumn("_day", F.to_date(F.col(ts_col))).groupBy(
        group_col, "_day"
    ).agg(F.hll_sketch_agg(F.col(count_col), F.lit(lg_k)).alias("sk"))
    return daily.groupBy(group_col).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("sk"), F.lit(False))
        ).alias("n_union")
    )


def quantiles_with_approx_check(
    df: DataFrame,
    group_col: str,
    value_col: str,
    accuracy: int = 100_000,
) -> DataFrame:
    """Per-group exact p50/p95 alongside the mergeable approximation:
    ``(group, p50, p95, approx_ok)``. Exact ``percentile`` must hold each
    sorted group in one place; ``percentile_approx`` (Greenwald-Khanna,
    bounded memory ~O(accuracy), partial-aggregable) is what survives
    100 TB groups — the check asserts it lands within 1% of the value
    range of the exact answer, so the gate proves the approximation is
    usable, not just runnable.
    """
    v = F.col(value_col)
    rng = F.max(v) - F.min(v)
    return df.groupBy(group_col).agg(
        F.round(F.expr(f"percentile({value_col}, 0.5)"), 6).alias("p50"),
        F.round(F.expr(f"percentile({value_col}, 0.95)"), 6).alias("p95"),
        (
            F.abs(
                F.percentile_approx(v, F.lit(0.5), F.lit(accuracy))
                - F.expr(f"percentile({value_col}, 0.5)")
            )
            <= F.greatest(rng * 0.01, F.lit(1e-9))
        ).alias("approx_ok"),
    )
