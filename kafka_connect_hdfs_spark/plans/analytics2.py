"""Second tranche of the query surface: selective scans, semi/anti joins,
set operations, sessionization, schemaless-JSON parsing, as-of joins.

Together with analytics.py these cover the relational shapes the reference
delegates to Hive (SURVEY.md §2.9) plus streaming-flavored batch analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType

from kafka_connect_hdfs_spark.plans.analytics import _dec, _dsum, _t


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight selective filter + single scalar aggregate.

    Scale: every predicate pushes to the parquet scan (PushedFilters); the
    aggregate is a two-phase partial → one row crosses the wire per
    partition. The canonical 'scan speed' probe.
    """
    li = _t(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * _dec("l_discount")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(_dsum(revenue).alias("revenue"), F.count("*").alias("n_rows"))


Q6_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti join surface: per market segment, customers with vs.
    without any order.

    Scale: left-semi/anti joins shuffle only the key column of the probe
    side; here orders' o_custkey is distinct-aggregated map-side first.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    with_orders = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "semi"
    ).groupBy("c_mktsegment").agg(F.count("*").alias("n_with_orders"))
    without = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "anti"
    ).groupBy("c_mktsegment").agg(F.count("*").alias("n_without_orders"))
    return (
        with_orders.join(without, "c_mktsegment", "full")
        .select(
            "c_mktsegment",
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
        .orderBy("c_mktsegment")
    )


Q_SEMI_ANTI_SQL = """
WITH w AS (
  SELECT c_mktsegment, count(*) AS n_with_orders
  FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY c_mktsegment
),
wo AS (
  SELECT c_mktsegment, count(*) AS n_without_orders
  FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY c_mktsegment
)
SELECT COALESCE(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
       COALESCE(n_with_orders, 0) AS n_with_orders,
       COALESCE(n_without_orders, 0) AS n_without_orders
FROM w FULL JOIN wo ON w.c_mktsegment = wo.c_mktsegment
ORDER BY c_mktsegment
"""


def q_set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation surface: INTERSECT / EXCEPT / UNION over user cohorts
    (purchasers vs. error-reporters).

    Scale: Spark plans set ops as aggregations on the distinct key — one
    shuffle each, no row explosion.
    """
    ev = _t(spark, sf_dir, "events")
    purchasers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    erroring = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    both = purchasers.intersect(erroring).agg(F.count("*").alias("n")).select(
        F.lit("both").alias("cohort"), "n"
    )
    only_buy = purchasers.exceptAll(erroring).agg(F.count("*").alias("n")).select(
        F.lit("purchase_only").alias("cohort"), "n"
    )
    either = purchasers.union(erroring).distinct().agg(F.count("*").alias("n")).select(
        F.lit("either").alias("cohort"), "n"
    )
    return both.unionByName(only_buy).unionByName(either).orderBy("cohort")


Q_SET_OPS_SQL = """
WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
     e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
SELECT 'both' AS cohort, count(*) AS n FROM (SELECT * FROM p INTERSECT SELECT * FROM e)
UNION ALL
SELECT 'purchase_only', count(*) FROM (SELECT * FROM p EXCEPT SELECT * FROM e)
UNION ALL
SELECT 'either', count(*) FROM (SELECT * FROM p UNION SELECT * FROM e)
ORDER BY cohort
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: split each user's event stream at gaps > 30 minutes;
    per-session aggregates. The batch phrasing of a streaming session window
    (Structured Streaming's ``session_window`` computes the same grouping).

    Scale: one shuffle on user_id; gap detection is lag() within partition,
    session ids a running sum — no cross-user data movement.
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    sessions = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_ts").isNull()
                | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") > 1800)
            ).cast("int"),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            _dsum(_dec("value")).alias("session_value"),
        )
        .orderBy("user_id", "session_id")
    )


Q_SESSIONIZE_SQL = """
WITH gaps AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
numbered AS (
  SELECT user_id, ts, value,
         (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
  FROM gaps
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


def q_json_schemaless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schemaless-JSON surface (§1.2: valueSchema == null → raw JSON values,
    json/JsonRecordWriterProvider.java:81-93): parse events.props with a
    permissive map schema and aggregate on an extracted field.

    Scale: from_json is a codegen expression — parsing happens in the scan
    pipeline, no UDF, no extra pass.
    """
    ev = _t(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "props_map", F.from_json(F.col("props"), MapType(StringType(), StringType()))
    ).withColumn("k", F.col("props_map")["k"].cast("long"))
    return (
        parsed.groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(F.count("*").alias("n_events"), F.sum("k").alias("sum_k"))
        .orderBy("k_mod")
    )


Q_JSON_SQL = """
SELECT (json_extract(props, '$.k')::BIGINT) % 10 AS k_mod,
       count(*) AS n_events,
       sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k
FROM events
GROUP BY 1 ORDER BY 1
"""


def q_asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join surface: for every purchase event, the timestamp of the
    user's most recent signup event at-or-before it (point-in-time lookup).

    Oracle: DuckDB's native ASOF JOIN — an independent implementation of the
    same semantics.
    """
    from kafka_connect_hdfs_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_event_id")
    )
    joined = asof_join(
        purchases, signups, on="user_id", left_ts="ts", right_ts="ts",
        right_value_cols=["signup_event_id"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("signup_event_id_asof").alias("signup_event_id"),
        F.col("ts_asof").alias("signup_ts"),
    ).orderBy("event_id")


Q_ASOF_SQL = """
SELECT p.event_id, p.user_id,
       s.event_id AS signup_event_id, s.ts AS signup_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
ORDER BY p.event_id
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated aggregate subquery — lineitems below 50%
    of their part's average quantity.

    Scale: the subquery decorrelates into a per-part aggregate joined back;
    the aggregate side is tiny (one row per part) and broadcasts, so the
    fact table is scanned once and never shuffled.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = (
        li.groupBy("l_partkey")
        .agg((F.avg("l_quantity") * 0.5).alias("half_avg_qty"))
    )
    from pyspark.sql.functions import broadcast

    return (
        li.join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(avg_qty.join(part.select("p_partkey"),
                                     F.col("l_partkey") == F.col("p_partkey"), "semi")),
              "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            (_dsum(_dec("l_extendedprice")) / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_rows"),
        )
    )


Q17_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       count(*) AS n_rows
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.5 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey
  )
"""


def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation surface: exact distinct users + events per type.

    Scale: count(DISTINCT) plans as a two-level aggregate (distinct-expand
    then count) — partials combine map-side; for approximate mode at 100 TB
    swap in approx_count_distinct (HLL) without changing the query shape.
    """
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


Q_DISTINCT_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS — orders with at least one lineitem
    shipped after the order date, counted per priority.

    Scale: EXISTS plans as a left-semi join on orderkey; only the key column
    of lineitem shuffles, and the semi join short-circuits per key.
    """
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = li.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey"), "inner"
    ).filter(F.col("l_shipdate") > F.col("o_orderdate")).select("l_orderkey").distinct()
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional (CASE) aggregation after a fact join —
    high- vs low-priority line counts per linestatus.

    Scale: the CASE branches fold into one aggregation pass; no extra scans.
    """
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus ORDER BY l_linestatus
"""


def q_pivot_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot surface: day × event_type count matrix.

    Scale: pivot with an explicit value list compiles to one aggregation
    with conditional counts — single shuffle, no per-pivot-value passes.
    """
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("day")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .orderBy("day")
    )


Q_PIVOT_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       count(*) FILTER (event_type = 'click') AS click,
       count(*) FILTER (event_type = 'error') AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup') AS signup,
       count(*) FILTER (event_type = 'view') AS view
FROM events GROUP BY 1 ORDER BY 1
"""


def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) of value per event type.

    Scale note: exact percentile requires the sorted group in one place —
    fine for bounded group counts; at 100 TB with huge groups switch to
    percentile_approx (t-digest) at the same call site.
    """
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
            F.round(F.min("value"), 2).alias("v_min"),
            F.round(F.max("value"), 2).alias("v_max"),
        )
        .orderBy("event_type")
    )


Q_PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(min(value), 2) AS v_min,
       round(max(value), 2) AS v_max
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_f4_schema_rotation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 schema-change rotation boundaries in batch form: synthetic
    alternating schema versions derived from event offsets (the reference's
    alternating-schema fixture, TestWithMiniDFSCluster.java:184-203),
    BACKWARD compatibility, flush.size=100."""
    from kafka_connect_hdfs_spark.operators.rotation import schema_rotation_chunks
    from kafka_connect_hdfs_spark.sources import events_as_kafka_records

    from kafka_connect_hdfs_spark.session import load_table

    records = events_as_kafka_records(load_table(spark, sf_dir, "events"))
    # version flips 1 -> 2 partway through each partition's stream
    records = records.withColumn(
        "schema_version", F.when(F.col("offset") % 7 == 3, 2).otherwise(1)
    )
    chunked = schema_rotation_chunks(
        records,
        "schema_version",
        flush_size=100,
        compatibility="BACKWARD",
        encoded_partition=F.concat(
            F.lit("partition="), F.col("partition").cast("string")
        ),
    )
    return (
        chunked.groupBy("partition", "run_id", "chunk")
        .agg(
            F.min("offset").alias("start_offset"),
            F.max("offset").alias("end_offset"),
            F.count("*").alias("record_count"),
            F.max("current_version").alias("schema_version"),
        )
        .orderBy("partition", "run_id", "chunk")
    )


Q_F4_SQL = """
WITH records AS (
  SELECT (user_id % 4)::INT AS "partition", event_id AS "offset",
         CASE WHEN event_id % 7 = 3 THEN 2 ELSE 1 END AS v
  FROM events
),
runs AS (
  SELECT "partition", "offset",
         max(v) OVER (PARTITION BY "partition" ORDER BY "offset"
                      ROWS UNBOUNDED PRECEDING) AS current_version
  FROM records
),
flagged AS (
  SELECT "partition", "offset", current_version,
         CASE WHEN lag(current_version) OVER (PARTITION BY "partition" ORDER BY "offset") IS NULL
                OR lag(current_version) OVER (PARTITION BY "partition" ORDER BY "offset") != current_version
              THEN 1 ELSE 0 END AS changed
  FROM runs
),
run_ids AS (
  SELECT "partition", "offset", current_version,
         (sum(changed) OVER (PARTITION BY "partition" ORDER BY "offset"
                             ROWS UNBOUNDED PRECEDING))::BIGINT AS run_id
  FROM flagged
),
chunked AS (
  SELECT "partition", "offset", current_version, run_id,
         ((row_number() OVER (PARTITION BY "partition", run_id ORDER BY "offset") - 1) // 100)::BIGINT AS chunk
  FROM run_ids
)
SELECT "partition", run_id, chunk,
       min("offset") AS start_offset, max("offset") AS end_offset,
       count(*) AS record_count, max(current_version) AS schema_version
FROM chunked
GROUP BY 1, 2, 3
ORDER BY "partition", run_id, chunk
"""


def q_offset_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 offset restore: next offset per topic-partition from the committed
    file manifest (readOffset semantics, TopicPartitionWriter.java:526-537)."""
    from kafka_connect_hdfs_spark.config import HdfsSinkConfig
    from kafka_connect_hdfs_spark.operators.rotation import next_offset_per_partition
    from kafka_connect_hdfs_spark.pipeline import ingest_batch
    from kafka_connect_hdfs_spark.sources import events_as_kafka_records

    from kafka_connect_hdfs_spark.session import load_table

    records = events_as_kafka_records(load_table(spark, sf_dir, "events"))
    cfg = HdfsSinkConfig(format="parquet", flush_size=100, partitioner="default")
    res = ingest_batch(records, cfg, topic="events", ts_col="ts")
    return next_offset_per_partition(res.manifest)


Q_OFFSET_RECOVERY_SQL = """
WITH ranked AS (
  SELECT (user_id % 4)::INT AS "partition", event_id AS "offset",
         row_number() OVER (PARTITION BY user_id % 4 ORDER BY event_id) - 1 AS rn
  FROM events
),
chunks AS (
  SELECT "partition", (rn // 100)::BIGINT AS chunk, max("offset") AS end_offset,
         count(*) AS n
  FROM ranked GROUP BY 1, 2 HAVING count(*) = 100
)
SELECT "partition", max(end_offset) + 1 AS next_offset
FROM chunks GROUP BY "partition" ORDER BY "partition"
"""
