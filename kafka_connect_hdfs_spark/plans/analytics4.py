"""Fourth tranche of the query surface: time-range window frames.

The reference delegates relational queries to Hive over its landed tables
(docs/hdfs_connector.rst:192-200, SURVEY.md §2.9); rolling *time-interval*
aggregation is the canonical shape Hive users run on event-partitioned
landings (a moving 7-day revenue view), so it belongs in the same surface.

Scale stance (100 TB): a RANGE-interval window shuffles once on its
partition key (customer) and sorts within partitions — no self-join
(the naive rolling-window formulation is an O(n·w) range self-join; the
window-frame formulation is O(n log n) with a single exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_hdfs_spark.functions import dec_as_double, dec_sum_double

from kafka_connect_hdfs_spark.plans.analytics import _t


def q_rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order: the customer's order count and revenue over the 7 days up
    to and including that order's date (RANGE BETWEEN INTERVAL frame).

    Scale: one exchange on o_custkey (uniform key), one sort per partition;
    the frame is evaluated in a single Window operator — no self-join, no
    re-shuffle for the second aggregate (both share the frame). Sums run in
    DECIMAL(18,2) so the result is order-independent (bitwise reproducible
    across partitionings), then surface as DOUBLE.
    """
    orders = _t(spark, sf_dir, "orders")
    frame = (
        "PARTITION BY o_custkey ORDER BY o_orderdate "
        "RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW"
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            dec_as_double(
                F.expr(f"sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER ({frame})")
            ).alias("revenue_7d"),
            F.expr(f"count(*) OVER ({frame})").alias("n_orders_7d"),
        )
        .orderBy("o_orderkey")
    )


Q_ROLLING_7D_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate,
       (CASE WHEN (sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)) < 0 THEN -1.0 ELSE 1.0 END * (CAST(abs(CAST(CAST((sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 + CAST(abs(CAST(CAST((sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) % 1125899906842624 AS DOUBLE)) / 1000000.0) AS revenue_7d,
       count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                      RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
         AS n_orders_7d
FROM orders ORDER BY o_orderkey
"""


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event value per event type (width_bucket
    over [0, 500) in 10 bins, plus under/overflow bins) — the profiling
    query behind dashboards and data-quality monitors.

    Scale: one map-side bucket expression + one two-key groupBy with
    map-side combine; output is bins × types rows. No sort, no join.
    """
    ev = _t(spark, sf_dir, "events")
    bucket = F.expr("width_bucket(value, 0.0, 500.0, 10)")
    return (
        ev.groupBy(F.col("event_type"), bucket.alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
        .orderBy("event_type", "bin")
    )


#: DuckDB has no width_bucket — the CASE replicates Spark's semantics
#: (0 = underflow, n+1 = overflow, else floor((v-lo)/width)+1)
Q_VALUE_HISTOGRAM_SQL = """
SELECT event_type,
       (CASE WHEN value < 0.0 THEN 0
             WHEN value >= 500.0 THEN 11
             ELSE CAST(floor(value / 50.0) AS BIGINT) + 1 END) AS bin,
       count(*) AS n,
       round(min(value), 6) AS lo,
       round(max(value), 6) AS hi
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_rate_cap_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window frequency capping: per user, the count of events in
    the hour up to and including each event; summarize flagged events
    (count > cap) per user — the abuse/rate-limit detector shape.

    Scale: one exchange on user_id + one per-partition sort; the RANGE
    interval frame is the O(n log n) formulation of the naive
    O(n·w) self-join "count my neighbors in the last hour".
    """
    ev = _t(spark, sf_dir, "events")
    frame = (
        "PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW"
    )
    cap = 1
    flagged = ev.select(
        "user_id",
        F.expr(f"count(*) OVER ({frame})").alias("n_last_hour"),
    ).filter(F.col("n_last_hour") > cap)
    return (
        flagged.groupBy("user_id")
        .agg(
            F.count("*").alias("n_flagged"),
            F.max("n_last_hour").alias("peak_rate"),
        )
        .orderBy("user_id")
    )


Q_RATE_CAP_SQL = """
WITH windowed AS (
  SELECT user_id,
         count(*) OVER (PARTITION BY user_id ORDER BY ts
                        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
           AS n_last_hour
  FROM events
)
SELECT user_id, count(*) AS n_flagged, max(n_last_hour)::BIGINT AS peak_rate
FROM windowed WHERE n_last_hour > 1
GROUP BY 1 ORDER BY 1
"""


def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier summary per event type: events whose value sits more
    than 2 sample standard deviations from the type mean — the monitoring
    query behind metric-anomaly alerts.

    Scale: pass 1 computes per-type (mean, stddev) — 5 rows — and pass 2
    re-scans with the tiny stats table BROADCAST back on; no window over
    the fact table, both aggregations combine map-side.
    """
    ev = _t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("z", F.round(z, 6))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.abs(F.col("z")) > 2).cast("long")).alias("n_outliers"),
            F.round(F.max(F.abs(F.col("z"))), 6).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


Q_VALUE_OUTLIERS_SQL = """
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
  FROM events GROUP BY 1
),
scored AS (
  SELECT e.event_type, round((e.value - s.mu) / s.sigma, 6) AS z
  FROM events e JOIN stats s USING (event_type)
)
SELECT event_type, count(*) AS n_events,
       sum((abs(z) > 2)::INT)::BIGINT AS n_outliers,
       round(max(abs(z)), 6) AS max_abs_z
FROM scored GROUP BY 1 ORDER BY 1
"""


def q_event_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: for every unordered pair of event
    types, how many users performed both — the support table behind
    cross-feature analysis and recommendation baselines.

    Scale: ONE shuffle on user_id builds each user's distinct-type basket;
    pair expansion happens inside the row over the (≤ #types) array — the
    classic trick that avoids the O(events²) self-join on user_id. The
    final pair count aggregates over at most C(#types, 2) keys.
    """
    ev = _t(spark, sf_dir, "events")
    baskets = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    )
    pairs = F.filter(
        F.flatten(
            F.transform(
                F.col("types"),
                lambda a: F.transform(
                    F.col("types"), lambda b: F.struct(a.alias("t1"), b.alias("t2"))
                ),
            )
        ),
        lambda p: p["t1"] < p["t2"],
    )
    return (
        baskets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.t1").alias("type_a"), F.col("p.t2").alias("type_b"))
        .agg(F.count("*").alias("n_users"))
        .orderBy("type_a", "type_b")
    )


Q_COOCCURRENCE_SQL = """
WITH baskets AS (
  SELECT user_id, list_sort(list(DISTINCT event_type)) AS types
  FROM events GROUP BY 1
),
pairs AS (
  SELECT a.t AS type_a, b.t AS type_b
  FROM (SELECT user_id, unnest(types) AS t FROM baskets) a
  JOIN (SELECT user_id, unnest(types) AS t FROM baskets) b
    ON a.user_id = b.user_id AND a.t < b.t
)
SELECT type_a, type_b, count(*) AS n_users
FROM pairs GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval overlap: treating each event as active for 5
    minutes, the peak number of simultaneously-active events per type per
    day — the classic concurrency/occupancy query (max concurrent sessions,
    peak connections) that a naive range self-join makes O(n²).

    Sweep-line shape: every interval contributes (+1 at start, −1 at end)
    points; a running sum over the time-ordered points is the concurrency
    curve, and the per-day max is one more aggregate. Ties order ends
    before starts (a session ending exactly when another starts never
    counts as overlap) — deterministic in both engines.

    Scale: ONE shuffle on event_type for the running-sum window, then a
    map-side day rollup. A hot type concentrates its sort in one task —
    at 100 TB partition the sweep by (type, day) and carry the previous
    day's closing concurrency forward as an offset (documented; the
    single-window form is the oracle-checkable reference).
    """
    ev = _t(spark, sf_dir, "events")
    starts = ev.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")
    )
    ends = ev.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    points = starts.unionByName(ends)
    running = F.expr(
        "sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta "
        "ROWS UNBOUNDED PRECEDING)"
    )
    curve = points.select(
        "event_type",
        F.date_format("t", "yyyy-MM-dd").alias("day"),
        running.cast("bigint").alias("concurrency"),
    )
    return (
        curve.groupBy("event_type", "day")
        .agg(F.max("concurrency").alias("peak_concurrency"))
        .orderBy("event_type", "day")
    )


Q_PEAK_CONCURRENCY_SQL = """
WITH points AS (
  SELECT event_type, ts AS t, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL 5 MINUTE AS t, -1 AS delta FROM events
),
curve AS (
  SELECT event_type, strftime(t, '%Y-%m-%d') AS day,
         (sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                           ROWS UNBOUNDED PRECEDING))::BIGINT AS concurrency
  FROM points
)
SELECT event_type, day, max(concurrency) AS peak_concurrency
FROM curve GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime spend bucketed into global deciles (ntile) with
    per-decile totals — the spend-distribution report behind quota/quality
    tiering (and the quality-quantile filtering pattern training pipelines
    apply per-language to documents).

    Scale: the per-customer aggregate shuffles on o_custkey (uniform);
    ntile(10) needs a single global ordering of the ~customer-count rows —
    fine at any corpus scale because it runs on the *aggregated* table
    (customers, not orders). Totals run in DECIMAL for reproducibility.
    """
    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend_d"),
        F.count("*").alias("n_orders"),
    )
    decile = F.expr("ntile(10) OVER (ORDER BY spend_d DESC, o_custkey)")
    return (
        spend.select("o_custkey", "spend_d", "n_orders", decile.alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("n_orders").alias("n_orders"),
            dec_sum_double(F.col("spend_d")).alias("decile_spend"),
        )
        .orderBy("decile")
    )


Q_DECILES_SQL = """
WITH spend AS (
  SELECT o_custkey,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_d,
         count(*) AS n_orders
  FROM orders GROUP BY 1
),
tiled AS (
  SELECT *, ntile(10) OVER (ORDER BY spend_d DESC, o_custkey) AS decile
  FROM spend
)
SELECT decile::INT AS decile, count(*) AS n_customers,
       sum(n_orders)::BIGINT AS n_orders,
       (CASE WHEN (sum(spend_d)) < 0 THEN -1.0 ELSE 1.0 END * (CAST(abs(CAST(CAST((sum(spend_d)) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 + CAST(abs(CAST(CAST((sum(spend_d)) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) % 1125899906842624 AS DOUBLE)) / 1000000.0) AS decile_spend
FROM tiled GROUP BY 1 ORDER BY 1
"""


def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary, each
    ntile(5), 5 = best) with the composite segment code — the classic
    marketing-analytics tiering, and structurally the multi-signal
    quantile bucketing a corpus pipeline applies to sources.

    Scale: one o_custkey aggregation over orders (uniform key), then three
    ntile windows over the CUSTOMER-sized table (not the fact table) —
    same justification as q_customer_value_deciles. Monetary runs in
    DECIMAL so Spark and any SQL replayer bucket identically (double sums
    differ in the last ulp, which flips ntile boundaries).
    """
    orders = _t(spark, sf_dir, "orders")
    maxd = F.broadcast(
        orders.agg(F.max(F.to_date("o_orderdate")).alias("_maxd"))
    )
    cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("_last"),
            F.count("*").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_mon"),
        )
        .crossJoin(maxd)
        .select(
            "o_custkey",
            F.datediff(F.col("_maxd"), F.col("_last")).alias("recency_days"),
            "frequency",
            dec_as_double(F.col("_mon")).alias("monetary"),
            F.col("_mon").alias("_mon_d"),
        )
    )
    r_score = F.expr("ntile(5) OVER (ORDER BY recency_days DESC, o_custkey)")
    f_score = F.expr("ntile(5) OVER (ORDER BY frequency ASC, o_custkey)")
    m_score = F.expr("ntile(5) OVER (ORDER BY _mon_d ASC, o_custkey)")
    return (
        cust.select(
            "o_custkey",
            "recency_days",
            "frequency",
            "monetary",
            r_score.alias("r_score"),
            f_score.alias("f_score"),
            m_score.alias("m_score"),
        )
        .withColumn(
            "segment",
            (
                F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
            ).cast("int"),
        )
        .orderBy("o_custkey")
    )


Q_RFM_SQL = """
WITH maxd AS (SELECT max(o_orderdate::DATE) AS md FROM orders),
cust AS (
  SELECT o_custkey,
         max(o_orderdate::DATE) AS last_d,
         count(*)::BIGINT AS frequency,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS mon_d
  FROM orders GROUP BY 1
),
scored AS (
  SELECT o_custkey,
         date_diff('day', last_d, maxd.md)::INT AS recency_days,
         frequency,
         (CASE WHEN (mon_d) < 0 THEN -1.0 ELSE 1.0 END * (CAST(abs(CAST(CAST((mon_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 + CAST(abs(CAST(CAST((mon_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) % 1125899906842624 AS DOUBLE)) / 1000000.0) AS monetary,
         ntile(5) OVER (ORDER BY date_diff('day', last_d, maxd.md) DESC,
                        o_custkey) AS r_score,
         ntile(5) OVER (ORDER BY frequency ASC, o_custkey) AS f_score,
         ntile(5) OVER (ORDER BY mon_d ASC, o_custkey) AS m_score
  FROM cust CROSS JOIN maxd
)
SELECT o_custkey, recency_days, frequency, monetary,
       r_score::INT AS r_score, f_score::INT AS f_score,
       m_score::INT AS m_score,
       (r_score * 100 + f_score * 10 + m_score)::INT AS segment
FROM scored ORDER BY o_custkey
"""


def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining over order lines: for part pairs
    co-occurring in >= 3 orders, support, confidence(a→b) and lift —
    association-rule analytics (and structurally the same capped pair
    machinery as shingle co-occurrence). Top-20 by lift.

    Scale: pairs form only WITHIN an order (per-order line counts are
    bounded — ~7 avg, 13 max here; cap via min-support keeps the output
    association-grade); the per-part order counts join back by part key.
    One fact shuffle on l_orderkey, pair agg on (a, b).
    """
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = F.broadcast(
        li.agg(F.countDistinct("l_orderkey").alias("_n"))
    )
    part_n = li.groupBy("l_partkey").agg(F.count("*").alias("_np"))
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= 3)
    )
    na = part_n.select(
        F.col("l_partkey").alias("part_a"), F.col("_np").alias("_na")
    )
    nb = part_n.select(
        F.col("l_partkey").alias("part_b"), F.col("_np").alias("_nb")
    )
    return (
        pairs.join(na, "part_a")
        .join(nb, "part_b")
        .crossJoin(n_orders)
        .select(
            "part_a",
            "part_b",
            "n_both",
            F.round(F.col("n_both") / F.col("_n"), 6).alias("support"),
            F.round(F.col("n_both") / F.col("_na"), 6).alias("confidence_a_b"),
            F.round(
                F.col("n_both") * F.col("_n") / (F.col("_na") * F.col("_nb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(20)
    )


Q_BASKET_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n_orders FROM li),
pn AS (SELECT l_partkey, count(*)::BIGINT AS np FROM li GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*)::BIGINT AS n_both
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 3
)
SELECT part_a, part_b, n_both,
       round(n_both::DOUBLE / n.n_orders, 6) AS support,
       round(n_both::DOUBLE / na.np, 6) AS confidence_a_b,
       round(n_both::DOUBLE * n.n_orders / (na.np * nb.np), 6) AS lift
FROM pairs
JOIN pn na ON pairs.part_a = na.l_partkey
JOIN pn nb ON pairs.part_b = nb.l_partkey
CROSS JOIN n
ORDER BY lift DESC, part_a, part_b LIMIT 20
"""


def q_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event-volume anomaly detection: per (event_type, hour)
    counts z-scored against that type's own hourly distribution; returns
    the hours with |z| >= 2 — the volume-spike/outage monitor of an
    ingest pipeline.

    Scale: one (type, hour) aggregation (map-side combine), then a
    type-keyed mean/std over the HOURLY table (hours × types rows, not
    events) joined back by type. Deterministic: counts are integers,
    mean/std in double rounded at the end.
    """
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.col("event_type"), F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").alias("n_events"))
    stats = hourly.groupBy("event_type").agg(
        F.avg("n_events").alias("_mu"),
        F.stddev_pop("n_events").alias("_sd"),
    )
    return (
        hourly.join(stats, "event_type")
        .withColumn(
            "z",
            F.round(
                F.when(
                    F.col("_sd") > 0,
                    (F.col("n_events") - F.col("_mu")) / F.col("_sd"),
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
        .filter(F.abs(F.col("z")) >= 2.0)
        .select("event_type", "hour", "n_events", "z")
        .orderBy("event_type", "hour")
    )


Q_HOURLY_ANOMALY_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         count(*)::BIGINT AS n_events
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, avg(n_events) AS mu, stddev_pop(n_events) AS sd
  FROM hourly GROUP BY 1
)
SELECT h.event_type, h.hour, h.n_events,
       round(CASE WHEN st.sd > 0 THEN (h.n_events - st.mu) / st.sd
             ELSE 0.0 END, 6) AS z
FROM hourly h JOIN st USING (event_type)
WHERE abs(round(CASE WHEN st.sd > 0 THEN (h.n_events - st.mu) / st.sd
                ELSE 0.0 END, 6)) >= 2.0
ORDER BY event_type, hour
"""
