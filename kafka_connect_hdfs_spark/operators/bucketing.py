"""Bucketed-table layout: the shuffle-ELIMINATION primitive for repeated
big-table joins (Hive/Spark bucketing, the warehouse-native answer to
"this fact table joins on user_id every night — stop re-shuffling 100 TB
every time").

``bucketBy(n, key)`` writes each table pre-partitioned AND pre-sorted by
the join key into ``n`` files per partition; two tables bucketed to the
SAME bucket count on the SAME key then sort-merge join with NO Exchange
on either side — the shuffle is paid ONCE at write time and amortized
over every subsequent join, aggregation, or dedup on that key. At 100 TB
this is the difference between a nightly 2×-corpus shuffle and a
metadata-only co-located join.

Caveats built into the helpers:
  - bucketed tables must go through ``saveAsTable`` (the bucket metadata
    lives in the catalog, not the parquet footer);
  - the join must be a sort-merge (the ``merge`` hint pins it — a
    broadcast would hide the demonstration, and AQE cannot convert a
    bucketed SMJ anyway);
  - bucket pruning additionally skips non-matching buckets on point
    lookups (``spark.sql.sources.bucketing.enabled`` is on by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a managed table bucketed (and by default sorted)
    by ``key`` — the one-time shuffle that every later key-join skips."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys as a
    sort-merge join that reads the bucket layout instead of shuffling —
    ``assert_no_exchange`` (and the plan-quality tests) verify the plan.
    """
    lt = spark.table(left_table).hint("merge")
    rt = spark.table(right_table).hint("merge")
    return lt.join(rt, lt[left_key] == rt[right_key])


def assert_no_exchange(df: DataFrame) -> str:
    """Raise if the physical plan re-shuffles (contains an Exchange) —
    the bucketing contract; returns the plan string for diagnostics."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(
            "bucketed join plan contains an Exchange (shuffle):\n" + plan
        )
    return plan


def drop_bucketed(spark: SparkSession, *tables: str) -> None:
    """Drop the managed bucketed tables (cleanup for gates/tests)."""
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
