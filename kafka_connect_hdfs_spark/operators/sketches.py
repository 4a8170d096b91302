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


def count_min_table(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch as a relational table: ``(r, bucket, c)`` with
    ``depth`` md5-derived hash rows over ``width`` buckets. Point-frequency
    estimates come from :func:`cms_estimate`; the estimate upper-bounds the
    true count (collisions only ever add), with error ≤ 2N/width at
    probability 1 - (1/2)^depth — the heavy-hitter screen that replaces a
    full ``groupBy(key)`` when the key space is huge.

    Unlike ``F.count_min_sketch`` (an opaque serialized binary), this
    sketch is a plain DataFrame: mergeable by summing ``c`` over
    ``(r, bucket)``, inspectable, and byte-reproducible on any engine with
    md5 — which is what lets the oracle verify the ESTIMATES exactly, not
    just the true counts.

    Scale: the groupBy partial-aggregates map-side into at most
    depth × width cells per partition, so the shuffle carries ≤ 1024
    partial rows per partition regardless of corpus size or key skew —
    the key itself never shuffles.
    """
    return (
        cms_cells(df, key_col, depth, width)
        .groupBy("r", "bucket")
        .agg(F.count("*").alias("c"))
    )


def cms_cells(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """The pre-aggregation cell stream behind :func:`count_min_table`:
    one ``(r, bucket)`` row per input row per hash row. Exposed so the
    STREAMING fold can feed it straight into the incremental-mart
    machinery (count per cell is a distributive aggregate — the sketch
    merges by cell-sum across micro-batches exactly)."""
    rows = F.explode(
        F.array(*[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(str(r)), F.lit(":"),
                                    F.col(key_col).cast("string"),
                                )
                            ),
                            1, 12,
                        ),
                        16, 10,
                    ).cast("bigint"),
                    F.lit(width),
                ).alias("bucket"),
            )
            for r in range(depth)
        ])
    )
    return df.select(rows.alias("cell")).select(
        F.col("cell.r").alias("r"), F.col("cell.bucket").alias("bucket")
    )


def cms_estimate(
    cms: DataFrame,
    items: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Query a :func:`count_min_table`: per item, the minimum bucket count
    across the sketch's hash rows — ``(key, est_n)``. ``items`` is a small
    key list (the candidate heavy hitters); the sketch is ≤ depth × width
    rows, so the join broadcasts both ways and touches no corpus data.
    """
    buckets = items.select(
        F.col(key_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("r"),
                    F.pmod(
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(
                                        F.lit(str(r)), F.lit(":"),
                                        F.col(key_col).cast("string"),
                                    )
                                ),
                                1, 12,
                            ),
                            16, 10,
                        ).cast("bigint"),
                        F.lit(width),
                    ).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("cell"),
    ).select(key_col, F.col("cell.r").alias("r"), F.col("cell.bucket").alias("bucket"))
    return (
        buckets.join(F.broadcast(cms), ["r", "bucket"])
        .groupBy(key_col)
        .agg(F.min("c").alias("est_n"))
    )


def hll_set_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    lg_k: int = 14,
    union_tol: float = 0.02,
    inter_tol: float = 0.05,
) -> DataFrame:
    """Audience-overlap / set algebra on HLL sketches: one row with the
    exact |A|, |B|, |A∪B|, |A∩B| (ground truth) plus two booleans
    asserting the SKETCH-side estimates land within tolerance — the union
    straight from ``hll_union`` (sketch algebra, no data rescan), the
    intersection by inclusion-exclusion (|A|+|B|−|A∪B|), whose error
    compounds, hence the looser ``inter_tol``.

    This is the query shape behind "how many users did both campaigns
    reach": at 100 TB you persist one sketch per segment (fixed ~2^lg_k
    bytes) and answer every pairwise overlap WITHOUT touching the data
    again — the exact sides here exist only as the correctness gate.

    Scale: two fixed-size sketch aggregations with map-side partials, a
    one-row cross join of the three scalar frames; nothing corpus-sized
    survives the aggs.
    """
    a = df_a.agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("sk_a"),
        F.countDistinct(col).alias("n_a"),
    )
    b = df_b.agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("sk_b"),
        F.countDistinct(col).alias("n_b"),
    )
    u = (
        df_a.select(F.col(col).alias("_v"))
        .unionAll(df_b.select(F.col(col).alias("_v")))
        .agg(F.countDistinct("_v").alias("n_union"))
    )
    row = a.crossJoin(b).crossJoin(u)
    est_a = F.hll_sketch_estimate("sk_a")
    est_b = F.hll_sketch_estimate("sk_b")
    est_u = F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
    est_i = est_a + est_b - est_u
    n_i = F.col("n_a") + F.col("n_b") - F.col("n_union")
    return row.select(
        "n_a",
        "n_b",
        "n_union",
        n_i.alias("n_intersect"),
        (
            F.abs(est_u - F.col("n_union"))
            <= F.greatest(F.col("n_union") * union_tol, F.lit(1.0))
        ).alias("union_est_ok"),
        (
            F.abs(est_i - n_i) <= F.greatest(F.col("n_union") * inter_tol, F.lit(1.0))
        ).alias("intersect_est_ok"),
    )
