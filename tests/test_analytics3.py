"""Tranche-4 query shapes (remaining TPC-H adaptations, analytics3.py):
smoke at sf0.001 + the physical-plan properties that make them scale.
"""

from __future__ import annotations

import pytest

from kafka_connect_hdfs_spark.plans import analytics3 as A3


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture(scope="module")
def sf(sf_dir):
    return sf_dir


ALL = [
    A3.q2_min_balance_supplier,
    A3.q7_volume_shipping,
    A3.q8_market_share,
    A3.q9_product_profit,
    A3.q10_returned_items,
    A3.q11_revenue_concentration,
    A3.q13_order_count_distribution,
    A3.q14_promo_revenue,
    A3.q15_top_supplier,
    A3.q16_supplier_variety,
    A3.q18_large_orders,
    A3.q19_disjunctive_revenue,
    A3.q20_dominant_suppliers,
    A3.q21_late_suppliers,
    A3.q22_dormant_customers,
    A3.q_window_suite,
    A3.q_cube_events,
    A3.q_grouping_sets_events,
]


@pytest.mark.parametrize("fn", ALL, ids=lambda f: f.__name__)
def test_runs_and_has_rows_column_contract(spark, sf, fn):
    df = fn(spark, sf)
    rows = df.collect()
    assert df.columns == sorted(set(df.columns), key=df.columns.index)  # unique
    # deterministic output ordering is part of the oracle contract for the
    # multi-row queries
    assert rows is not None


def test_q7_dims_broadcast(spark, sf):
    plan = _plan(A3.q7_volume_shipping(spark, sf))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]


def test_q10_topk_not_global_sort(spark, sf):
    plan = _plan(A3.q10_returned_items(spark, sf))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_q14_single_pass_conditional_agg(spark, sf):
    plan = _plan(A3.q14_promo_revenue(spark, sf))
    # numerator + denominator computed in ONE aggregation, not two scans
    # (formatted explain prints each scan twice: tree node + detail section)
    assert plan.count("Scan parquet  (") == 2  # lineitem + part, once each


def test_q19_quantity_bounds_pushed(spark, sf):
    plan = _plan(A3.q19_disjunctive_revenue(spark, sf))
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "l_quantity" in pushed  # common bounds of the OR pushed to scan


def test_q21_single_shuffle_before_dims(spark, sf):
    plan = _plan(A3.q21_late_suppliers(spark, sf))
    # per-order aggregate phrasing: no row-exploding self-joins of lineitem
    assert plan.count("Scan parquet  (") <= 4  # lineitem, orders, supplier, nation


def test_window_suite_one_window_partition(spark, sf):
    df = A3.q_window_suite(spark, sf)
    plan = _plan(df)
    # all four window functions share one Window operator chain (same spec)
    assert plan.count("Window") <= 4
    rows = df.limit(5).collect()
    assert {"event_type", "day", "revenue", "prev_revenue", "ma7", "cum_revenue", "day_seq"} <= set(df.columns)


def test_customer_rfm_scores_well_formed(spark, sf_dir):
    from kafka_connect_hdfs_spark.plans.analytics4 import q_customer_rfm

    rows = q_customer_rfm(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5
        assert r["segment"] == r["r_score"] * 100 + r["f_score"] * 10 + r["m_score"]
        assert r["recency_days"] >= 0
    # the most recent buyers carry the highest r_score
    by_r = sorted(rows, key=lambda r: r["recency_days"])
    assert by_r[0]["r_score"] == 5 and by_r[-1]["r_score"] == 1


def test_basket_lift_bounds(spark, sf_dir):
    from kafka_connect_hdfs_spark.plans.analytics4 import q_basket_lift

    rows = q_basket_lift(spark, sf_dir).collect()
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert 0 < r["support"] <= 1
        assert 0 < r["confidence_a_b"] <= 1
        assert r["lift"] > 0
