"""As-of (point-in-time) join — a custom operator Spark's DataFrame API lacks.

Semantics: for each left row, attach the latest right row with the same key
whose timestamp is <= the left timestamp (direction="backward"; "forward"
symmetric). The classic time-series/point-in-time-correctness primitive.

Scale-first implementation (composition of existing ops, SURVEY.md custom-
operator guidance (a)): instead of a range join (which explodes to
|left|x|right| per key before filtering), union the two sides tagged by
origin, sort within key by (ts, origin), and carry the most recent right
payload forward with last(..., ignorenulls) over a running window. Cost:
ONE shuffle on the key — the same lower bound any keyed join pays; no pair
blowup, skew handled by AQE like any other window.

DuckDB's native ASOF JOIN is the correctness oracle — two independent
implementations of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: latest right row with right_ts <= left_ts per key.

    Right rows sort before left rows at equal timestamps (a right row AT the
    left timestamp matches — DuckDB ASOF `>=` semantics).
    """
    if right_value_cols is None:
        right_value_cols = [c for c in right.columns if c not in (on, right_ts)]

    l_tagged = left.withColumn("_is_left", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r_proj = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols],
    ).withColumn(f"{right_ts}{suffix}", F.col("_ts")).withColumn("_is_left", F.lit(0))

    carried = [f"{c}{suffix}" for c in right_value_cols] + [f"{right_ts}{suffix}"]
    unioned = l_tagged.unionByName(
        r_proj, allowMissingColumns=True
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in carried
        ],
    )
    out = filled.filter(F.col("_is_left") == 1)
    for c in carried:
        out = out.drop(c).withColumnRenamed(f"_f_{c}", c)
    return out.drop("_is_left", "_ts")


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Point-in-interval (range) join without a cross product — the second
    custom join Spark's DataFrame API lacks (after as-of). Matches every
    point row to every interval row with ``start <= point < end``.

    Plan shape: intervals explode into the buckets they COVER
    (``floor(start/w) .. floor((end-1)/w)`` — ≤ ceil(len/w)+1 rows each);
    points map to exactly ONE bucket; then a plain equi-join on the bucket
    plus the exact range filter. With bucket_width ≈ typical interval
    length, each interval lands in ≤2 buckets, so the join is ~2× the
    interval count instead of |points| × |intervals| — the standard interval
    bucketing trick behind production range joins.

    Scale: points (the big side) gain one narrow column and shuffle once on
    the bucket — or not at all when ``broadcast_intervals`` (default) keeps
    the exploded interval side broadcast. Skewed buckets (one interval
    covering everything) degrade toward broadcast-nested-loop — cap interval
    length / pick bucket_width accordingly.
    """
    b_start = F.floor(F.col(start_col) / bucket_width)
    b_end = F.floor((F.col(end_col) - 1) / bucket_width)
    iv = intervals.withColumn("_bucket", F.explode(F.sequence(b_start, b_end)))
    if broadcast_intervals:
        iv = broadcast(iv)
    pt = points.withColumn("_bucket", F.floor(F.col(point_col) / bucket_width))
    return (
        pt.join(iv, "_bucket")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("_bucket")
    )
