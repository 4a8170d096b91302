"""Third tranche of the query surface: the remaining TPC-H query shapes
adapted to the testdata star schema (which has no partsupp table and no
commit/receipt dates — adaptations noted per query).

The reference delegates all of these to Hive over its landed tables
(docs/hdfs_connector.rst:192-200, SURVEY.md §2.9); here they run natively on
Spark SQL with Catalyst doing join reordering / pushdown, and each carries a
DuckDB oracle in __spark_entry__.oracle_sql().

Scale stance (100 TB): dimension tables (region/nation/supplier/part/
customer) are broadcast — lineitem/orders never shuffle for a dim join; the
only shuffles are the final groupBys on low-cardinality keys. Every date
filter pushes to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_connect_hdfs_spark.functions import dec_as_double

from kafka_connect_hdfs_spark.plans.analytics import _dec, _dsum, _t


def _ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp")


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.

    lineitem joins supplier-nation and (via orders) customer-nation; keeps
    the two (supp, cust) nation pairs and aggregates revenue per year.

    Scale: supplier/customer/nation are broadcast (no shuffle on lineitem);
    the nation-pair filter applies before the final 3-key groupBy.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")

    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .withColumn("l_year", F.date_format("l_shipdate", "yyyy"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            _dsum(_dec("l_extendedprice") * (1 - _dec("l_discount"))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume) AS DOUBLE) AS revenue, count(*) AS n_items
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         strftime(l_shipdate, '%Y') AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of PROMO-part revenue delivered into
    region ASIA, by order year. (Adapted: p_type = 'PROMO' instead of the
    TPC-H type string; share by supplier nation.)

    Scale: ratio of two decimal sums per year — numerator via a conditional
    aggregate so a single pass/shuffle computes both.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    part = _t(spark, sf_dir, "part")

    cust_nat = (
        cust.join(
            F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nat = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    vol = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_type") == "PROMO").select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_nat, F.col("o_custkey") == F.col("c_custkey"), "semi")
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("o_year", F.date_format("o_orderdate", "yyyy"))
        .groupBy("o_year")
        .agg(
            _dsum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0)))
            .alias("nation_rev"),
            _dsum(vol).alias("total_rev"),
        )
        .withColumn(
            "mkt_share", F.round(F.col("nation_rev") / F.col("total_rev"), 6)
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT o_year,
       (CASE WHEN (nation_rev_d) < 0 THEN -1.0 ELSE 1.0 END * (CAST(abs(CAST(CAST((nation_rev_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 + CAST(abs(CAST(CAST((nation_rev_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) % 1125899906842624 AS DOUBLE)) / 1000000.0) AS nation_rev,
       (CASE WHEN (total_rev_d) < 0 THEN -1.0 ELSE 1.0 END * (CAST(abs(CAST(CAST((total_rev_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 + CAST(abs(CAST(CAST((total_rev_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) % 1125899906842624 AS DOUBLE)) / 1000000.0) AS total_rev,
       round((CASE WHEN (nation_rev_d) < 0 THEN -1.0 ELSE 1.0 END * (CAST(abs(CAST(CAST((nation_rev_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 + CAST(abs(CAST(CAST((nation_rev_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) % 1125899906842624 AS DOUBLE)) / 1000000.0) / (CASE WHEN (total_rev_d) < 0 THEN -1.0 ELSE 1.0 END * (CAST(abs(CAST(CAST((total_rev_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 + CAST(abs(CAST(CAST((total_rev_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) % 1125899906842624 AS DOUBLE)) / 1000000.0), 6) AS mkt_share
FROM (
  SELECT strftime(o_orderdate, '%Y') AS o_year,
         sum(CASE WHEN n_s.n_name = 'NATION_3' THEN volume ELSE 0 END) AS nation_rev_d,
         sum(volume) AS total_rev_d
  FROM (
    SELECT l_orderkey, l_suppkey,
           CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
  ) l
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n_s ON s_nationkey = n_s.n_nationkey
  WHERE o_custkey IN (
    SELECT c_custkey FROM customer
    JOIN nation n_c ON c_nationkey = n_c.n_nationkey
    JOIN region ON n_c.n_regionkey = r_regionkey
    WHERE r_name = 'ASIA')
  GROUP BY 1
)
ORDER BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × year for a part family.
    Adapted (no partsupp.ps_supplycost): cost modeled as 50% of
    p_retailprice per unit.

    Scale: part/supplier/nation broadcast; lineitem→orders is the one big
    join (both huge) — co-partitioned on orderkey; see plans/bucketing.py
    for the bucketed variant of exactly this join.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part")

    profit = _dec("l_extendedprice") * (1 - _dec("l_discount")) - _dec(
        "p_retailprice"
    ) * F.lit(0.5).cast("decimal(18,2)") * _dec("l_quantity")
    return (
        li.join(
            F.broadcast(
                part.filter(F.col("p_name").contains("widget")).select(
                    "p_partkey", "p_retailprice"
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("o_year", F.date_format("o_orderdate", "yyyy"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(_dsum(profit).alias("sum_profit"), F.count("*").alias("n_items"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_SQL = """
SELECT n_name AS nation, strftime(o_orderdate, '%Y') AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
              - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(0.5 AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top 20 customers by revenue lost to returns in one
    quarter.

    Scale: orders is date-filtered before the lineitem join (pushdown);
    customer+nation broadcast; top-k via orderBy+limit = TakeOrdered, no
    full sort.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")

    return (
        orders.filter(
            (F.col("o_orderdate") >= _ts("1996-01-01"))
            & (F.col("o_orderdate") < _ts("1996-04-01"))
        )
        .join(
            li.filter(F.col("l_returnflag") == "R"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(
            _dsum(_dec("l_extendedprice") * (1 - _dec("l_discount"))).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name AS nation,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count, including
    zero-order customers (left outer join), excluding one priority class.

    Scale: two shuffles by construction (count per custkey, then histogram
    on the count) — the second input is one row per customer, tiny.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT").select(
                "o_custkey", "o_orderkey"
            ),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: PROMO-part revenue share in one month (conditional
    aggregate over a broadcast part join).
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    vol = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-06-01"))
            & (F.col("l_shipdate") < _ts("1996-07-01"))
        )
        .join(F.broadcast(part.select("p_partkey", "p_type")), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            _dsum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0))).alias(
                "promo_rev"
            ),
            _dsum(vol).alias("total_rev"),
            F.count("*").alias("n_items"),
        )
        .withColumn(
            "promo_pct",
            F.round(F.lit(100.0) * F.col("promo_rev") / F.col("total_rev"), 6),
        )
    )


Q14_SQL = """
SELECT (CASE WHEN (promo_d) < 0 THEN -1.0 ELSE 1.0 END * (CAST(abs(CAST(CAST((promo_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 + CAST(abs(CAST(CAST((promo_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) % 1125899906842624 AS DOUBLE)) / 1000000.0) AS promo_rev, (CASE WHEN (total_d) < 0 THEN -1.0 ELSE 1.0 END * (CAST(abs(CAST(CAST((total_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 + CAST(abs(CAST(CAST((total_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) % 1125899906842624 AS DOUBLE)) / 1000000.0) AS total_rev,
       n_items,
       round(100.0 * (CASE WHEN (promo_d) < 0 THEN -1.0 ELSE 1.0 END * (CAST(abs(CAST(CAST((promo_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 + CAST(abs(CAST(CAST((promo_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) % 1125899906842624 AS DOUBLE)) / 1000000.0) / (CASE WHEN (total_d) < 0 THEN -1.0 ELSE 1.0 END * (CAST(abs(CAST(CAST((total_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 + CAST(abs(CAST(CAST((total_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) % 1125899906842624 AS DOUBLE)) / 1000000.0), 6) AS promo_pct
FROM (
  SELECT sum(CASE WHEN p_type = 'PROMO' THEN volume ELSE 0 END) AS promo_d,
         sum(volume) AS total_d, count(*) AS n_items
  FROM (
    SELECT l_partkey,
           CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-06-01' AND l_shipdate < TIMESTAMP '1996-07-01'
  ) JOIN part ON l_partkey = p_partkey
)
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with maximum revenue in a quarter —
    aggregate, then keep rows equal to the max (scalar subquery).

    Scale: the revenue view is one row per supplier (tiny); the max is a
    broadcast scalar. Equality is decided on the exact DECIMAL sum, cast to
    double only for output.
    """
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))).alias("rev_d")
        )
    )
    max_rev = rev.agg(F.max("rev_d").alias("max_d"))
    return (
        rev.join(F.broadcast(max_rev), F.col("rev_d") == F.col("max_d"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey"),
            F.col("s_name"),
            dec_as_double(F.col("rev_d")).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev_d
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, (CASE WHEN (rev_d) < 0 THEN -1.0 ELSE 1.0 END * (CAST(abs(CAST(CAST((rev_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 + CAST(abs(CAST(CAST((rev_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) % 1125899906842624 AS DOUBLE)) / 1000000.0) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_d = (SELECT max(rev_d) FROM revenue)
ORDER BY s_suppkey
"""


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape adapted (no partsupp): distinct suppliers who shipped
    each (brand, type, size-bucket) part family, excluding one brand and
    excluding negative-balance suppliers (NOT IN subquery).

    Scale: part broadcast into lineitem; distinct-count shuffles once on the
    3-part key with map-side partial distinct.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    bad_supp = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(
            F.broadcast(
                part.filter(F.col("p_brand") != "Brand#13").select(
                    "p_partkey", "p_brand", "p_type", "p_size"
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "anti")
        .withColumn("size_bucket", F.floor(F.col("p_size") / F.lit(10)).cast("int"))
        .groupBy("p_brand", "p_type", "size_bucket")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "size_bucket"
        )
    )


Q16_SQL = """
SELECT p_brand, p_type, CAST(floor(CAST(p_size AS DOUBLE) / 10) AS INTEGER) AS size_bucket,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, size_bucket
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with any order whose total quantity
    exceeds 250 (GROUP BY + HAVING subquery feeding a join).

    Scale: the HAVING aggregate runs on lineitem alone (one shuffle on
    orderkey); survivors are few, so the join back to orders/customer
    broadcasts the survivor set.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_d"))
        .filter(F.col("qty_d") > 250)
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_day"),
            F.col("o_totalprice"),
            dec_as_double(F.col("qty_d")).alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_day,
       o_totalprice, (CASE WHEN (qty_d) < 0 THEN -1.0 ELSE 1.0 END * (CAST(abs(CAST(CAST((qty_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 + CAST(abs(CAST(CAST((qty_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) % 1125899906842624 AS DOUBLE)) / 1000000.0) AS total_qty
FROM orders
JOIN (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_d
  FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a disjunction of (brand,
    quantity-range, size-range) predicate triplets.

    Scale: Catalyst pushes the common l_quantity bounds to the scan and
    evaluates the OR post-join; part is broadcast.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("l_quantity").between(1, 11))
            & (F.col("p_size").between(1, 5))
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("l_quantity").between(10, 20))
            & (F.col("p_size").between(1, 10))
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & (F.col("l_quantity").between(20, 30))
            & (F.col("p_size").between(1, 15))
        )
    )
    return joined.filter(cond).agg(
        _dsum(_dec("l_extendedprice") * (1 - _dec("l_discount"))).alias("revenue"),
        F.count("*").alias("n_items"),
    )


Q19_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
"""


def q21_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape adapted (no commit/receipt dates — "late" means
    l_shipdate > o_orderdate + 90 days): suppliers who were the ONLY late
    supplier on a multi-supplier order.

    EXISTS (another supplier on the order) + NOT EXISTS (another LATE
    supplier) — phrased as per-order aggregates to keep it one shuffle.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")

    lo = li.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderstatus"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).filter(F.col("o_orderstatus") == "F")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    per_order = (
        lo.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        per_order.join(F.broadcast(supp), F.col("late_supp") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("s_name"), F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


Q21_SQL = """
SELECT s_name, n_name AS nation, count(*) AS numwait
FROM (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN l_suppkey END) AS n_late_supp,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN l_suppkey END) AS late_supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey
  HAVING count(DISTINCT l_suppkey) > 1
     AND count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN l_suppkey END) = 1
)
JOIN supplier ON late_supp = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY s_name, n_name
ORDER BY numwait DESC, s_name
"""


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape adapted (no phone country codes; every customer has
    at least one order in this dataset): per nation, count and balance of
    customers with above-global-average positive balance and no RECENT
    order (none since 1999-01-01) — scalar AVG subquery + anti join.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            / F.count("*")
        ).alias("avg_d")
    )
    recent = orders.filter(F.col("o_orderdate") >= _ts("1999-01-01")).select(
        "o_custkey"
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal").cast("decimal(18,2)") > F.col("avg_d"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("numcust"),
            _dsum(_dec("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("nation")
    )


Q22_SQL = """
SELECT n_name AS nation, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(c_acctbal AS DECIMAL(18,2)) > (
        SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) / count(*)
        FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY n_name
ORDER BY nation
"""


def q2_min_balance_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape adapted (no partsupp): for each EUROPE-shipped part of
    size ≥ 45, the minimum-acctbal supplier among those who actually shipped
    it (correlated MIN subquery → groupBy + self-join on the min).

    Scale: the supplier-per-part set comes from lineitem distinct pairs (one
    shuffle); min-per-part is a tiny aggregate joined back broadcast.
    """
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    part = _t(spark, sf_dir, "part")

    eur_supp = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    pairs = (
        li.join(
            F.broadcast(part.filter(F.col("p_size") >= 45).select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(eur_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "nation")
        .distinct()
    )
    min_bal = pairs.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        pairs.join(
            F.broadcast(min_bal),
            (F.col("p_partkey") == F.col("mk"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "nation")
        .orderBy("p_partkey", "s_suppkey")
    )


Q2_SQL = """
WITH pairs AS (
  SELECT DISTINCT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name AS nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size >= 45 AND r_name = 'EUROPE'
)
SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, nation
FROM pairs p
WHERE s_acctbal = (SELECT min(s_acctbal) FROM pairs m WHERE m.p_partkey = p.p_partkey)
ORDER BY p_partkey, s_suppkey
"""


def q11_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape adapted (no partsupp value): parts whose revenue from
    ASIA-nation suppliers exceeds 2x the average per-part value (HAVING
    against a scalar subquery; the 2x-average form stays selective at every
    scale factor, unlike a fraction-of-total cutoff).
    """
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    asia_supp = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    base = li.join(asia_supp, F.col("l_suppkey") == F.col("s_suppkey"), "semi")
    per_part = base.groupBy("l_partkey").agg(
        F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))).alias("val_d")
    )
    total = per_part.agg((F.sum("val_d") / F.count("*")).alias("avg_d"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("val_d") > F.col("avg_d") * 2)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            dec_as_double(F.col("val_d")).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


Q11_SQL = """
WITH base AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS val_d
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA')
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, (CASE WHEN (val_d) < 0 THEN -1.0 ELSE 1.0 END * (CAST(abs(CAST(CAST((val_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 + CAST(abs(CAST(CAST((val_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) % 1125899906842624 AS DOUBLE)) / 1000000.0) AS part_value
FROM base
WHERE val_d > (SELECT sum(val_d) / count(*) FROM base) * 2
ORDER BY part_value DESC, p_partkey
"""


def q_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth in one query: per event_type daily revenue
    with lag, 7-day moving average, running cumulative sum, and rank of the
    day within its type.

    Scale: one shuffle on event_type (the window partition key); all four
    window functions share the same sorted partition — Spark evaluates them
    in a single Window physical operator pair.
    """
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("event_type", "day")
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("rev_d"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    w7 = w.rowsBetween(-6, 0)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.select(
            "event_type",
            "day",
            dec_as_double(F.col("rev_d")).alias("revenue"),
            F.lag(dec_as_double(F.col("rev_d")), 1).over(w).alias("prev_revenue"),
            F.round(
                dec_as_double(F.sum("rev_d").over(w7)) / F.count("*").over(w7), 6
            ).alias("ma7"),
            dec_as_double(F.sum("rev_d").over(wcum)).alias("cum_revenue"),
            F.row_number().over(w).alias("day_seq"),
        )
        .orderBy("event_type", "day")
    )


Q_WINDOW_SQL = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         sum(CAST(value AS DECIMAL(18,2))) AS rev_d
  FROM events GROUP BY 1, 2
)
SELECT event_type, day,
       (CASE WHEN (rev_d) < 0 THEN -1.0 ELSE 1.0 END * (CAST(abs(CAST(CAST((rev_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 + CAST(abs(CAST(CAST((rev_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) % 1125899906842624 AS DOUBLE)) / 1000000.0) AS revenue,
       lag((CASE WHEN (rev_d) < 0 THEN -1.0 ELSE 1.0 END * (CAST(abs(CAST(CAST((rev_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 + CAST(abs(CAST(CAST((rev_d) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) % 1125899906842624 AS DOUBLE)) / 1000000.0), 1) OVER w AS prev_revenue,
       round((CASE WHEN (sum(rev_d) OVER w7) < 0 THEN -1.0 ELSE 1.0 END * (CAST(abs(CAST(CAST((sum(rev_d) OVER w7) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 + CAST(abs(CAST(CAST((sum(rev_d) OVER w7) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) % 1125899906842624 AS DOUBLE)) / 1000000.0) / count(*) OVER w7, 6) AS ma7,
       (CASE WHEN (sum(rev_d) OVER wcum) < 0 THEN -1.0 ELSE 1.0 END * (CAST(abs(CAST(CAST((sum(rev_d) OVER wcum) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) // 1125899906842624 AS DOUBLE) * 1125899906842624.0 + CAST(abs(CAST(CAST((sum(rev_d) OVER wcum) AS DECIMAL(38,6)) * 1000000 AS HUGEINT)) % 1125899906842624 AS DOUBLE)) / 1000000.0) AS cum_revenue,
       row_number() OVER w AS day_seq
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day),
       w7 AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
       wcum AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY event_type, day
"""


def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape adapted (no partsupp.availqty): suppliers who shipped
    more than half of some widget-family part's total 1996 volume — the
    nested-IN + correlated-quantity-threshold shape, with "availqty > ½
    shipped" replaced by "supplier's share > ½ of part total".

    Scale: the inner aggregate runs once over the date+part-filtered
    lineitem slice (part filter broadcast-semi); part totals join back on
    l_partkey (tiny, broadcast); supplier/nation dims broadcast.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")

    per = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .join(
            F.broadcast(
                part.filter(F.col("p_name").contains("widget")).select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
            "semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("q_d"))
    )
    tot = per.groupBy(F.col("l_partkey").alias("tk")).agg(
        F.sum("q_d").alias("tq_d")
    )
    dominant = (
        per.join(F.broadcast(tot), F.col("l_partkey") == F.col("tk"))
        .filter(F.col("q_d") > F.col("tq_d") * 0.5)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )


Q20_SQL = """
WITH per AS (
  SELECT l_suppkey, l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS q_d
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
),
tot AS (SELECT l_partkey, sum(q_d) AS tq_d FROM per GROUP BY 1)
SELECT s_suppkey, s_name, n_name AS nation
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT DISTINCT l_suppkey FROM per JOIN tot USING (l_partkey)
  WHERE q_d > tq_d * 0.5)
ORDER BY s_suppkey
"""


def q_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, weekday): all four grouping-set combinations in
    one pass — with ROLLUP (analytics.q_event_type_rollup) and the explicit
    GROUPING SETS below this completes the multi-level aggregation surface.

    Scale: one shuffle; the expand operator multiplies rows by the number of
    grouping sets BEFORE partial aggregation, so map-side combine still
    collapses per set.
    """
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("weekday", F.date_format("ts", "E"))
        .cube("event_type", "weekday")
        .agg(F.count("*").alias("n_events"))
        .orderBy(
            F.col("event_type").asc_nulls_first(),
            F.col("weekday").asc_nulls_first(),
        )
    )


Q_CUBE_SQL = """
SELECT event_type, strftime(ts, '%a') AS weekday, count(*) AS n_events
FROM events
GROUP BY CUBE (event_type, strftime(ts, '%a'))
ORDER BY event_type NULLS FIRST, weekday NULLS FIRST
"""


def q_grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((event_type), (lang-of-user bucket), ()) —
    the irregular-set case neither ROLLUP nor CUBE express."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "user_bucket", (F.col("user_id") % 10).cast("int")
    )
    ev.createOrReplaceTempView("ev_gs")
    return ev.sparkSession.sql(
        """
        SELECT event_type, user_bucket, count(*) AS n_events
        FROM ev_gs
        GROUP BY GROUPING SETS ((event_type), (user_bucket), ())
        ORDER BY event_type NULLS FIRST, user_bucket NULLS FIRST
        """
    )


Q_GROUPING_SETS_SQL = """
SELECT event_type, CAST(user_id % 10 AS INTEGER) AS user_bucket, count(*) AS n_events
FROM events
GROUP BY GROUPING SETS ((event_type), (CAST(user_id % 10 AS INTEGER)), ())
ORDER BY event_type NULLS FIRST, user_bucket NULLS FIRST
"""
