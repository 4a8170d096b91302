"""Decontamination and deterministic stratified sampling unit goldens."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_connect_hdfs_spark.operators.text import (
    decontaminate_against, stratified_sample,
)


def test_decontaminate_finds_only_real_overlap(spark):
    bench = spark.createDataFrame(
        [Row(doc_id=1, text="the quick brown fox jumps over the lazy dog")]
    )
    train = spark.createDataFrame(
        [
            # contains "quick brown fox" → one shared 3-gram
            Row(doc_id=100, text="a quick brown fox appeared in town"),
            Row(doc_id=101, text="completely unrelated words only here"),
        ]
    )
    hits = {r.doc_id: r.n_hits for r in decontaminate_against(train, bench, n=3).collect()}
    assert hits == {100: 1}


def test_stratified_sample_deterministic_and_monotone(spark):
    rows = [Row(doc_id=i, source="a" if i % 2 else "b") for i in range(1000)]
    df = spark.createDataFrame(rows)
    k1 = stratified_sample(df, {"a": 0.3, "b": 0.7}).select("doc_id")
    k2 = stratified_sample(df, {"a": 0.3, "b": 0.7}).select("doc_id")
    ids1 = {r.doc_id for r in k1.collect()}
    ids2 = {r.doc_id for r in k2.collect()}
    assert ids1 == ids2  # reproducible, partition-layout independent

    # rate=1.0 keeps everything; higher rate is a superset of lower rate
    all_a = stratified_sample(df, {"a": 1.0}, default_rate=0.0)
    assert all_a.count() == 500
    lo = {r.doc_id for r in stratified_sample(df, {"a": 0.2}).collect()}
    hi = {r.doc_id for r in stratified_sample(df, {"a": 0.6}).collect()}
    assert lo <= hi
    # realized rate lands near the nominal one
    assert 0.1 < len(lo) / 500 < 0.3


def test_duplicate_clusters_components(spark):
    """Connected components over candidate pairs: transitive chains collapse
    to min-id cluster, disjoint components stay separate, and a long chain
    (diameter 10) converges within max_iter."""
    from kafka_connect_hdfs_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    got = {
        r.node: r.cluster_id for r in duplicate_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 23: 20}

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 110)], "id_a long, id_b long"
    )
    got2 = {r.node: r.cluster_id for r in duplicate_clusters(chain).collect()}
    assert set(got2.values()) == {100}
    assert len(got2) == 11


def test_incremental_dedup_drops_seen_fingerprints(spark):
    from kafka_connect_hdfs_spark.operators.dedup import incremental_dedup

    seen = spark.createDataFrame(
        [Row(doc_id=1, text="alpha  beta"), Row(doc_id=2, text="gamma")]
    )
    batch = spark.createDataFrame(
        [
            Row(doc_id=10, text="Alpha Beta"),   # normalized dup of seen #1
            Row(doc_id=11, text="gamma"),        # exact dup of seen #2
            Row(doc_id=12, text="delta"),        # new
            Row(doc_id=13, text="DELTA"),        # dup of 12 but NOT of seen
        ]
    )
    got = incremental_dedup(batch, seen)
    ids = sorted(r.doc_id for r in got.collect())
    # within-batch dups are NOT this operator's job — both deltas survive
    assert ids == [12, 13]
    assert "fingerprint" in got.columns


def test_incremental_dedup_prunes_snapshot_to_fingerprints(spark):
    from kafka_connect_hdfs_spark.operators.dedup import incremental_dedup

    seen = spark.createDataFrame([Row(doc_id=1, text="a", extra="payload")])
    batch = spark.createDataFrame([Row(doc_id=2, text="b", extra="payload")])
    plan = (
        incremental_dedup(batch, seen)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # the snapshot side must be pruned to a fingerprint-only projection
    # (the anti-join build input is `Project [md5(...) AS fingerprint]`,
    # never the snapshot's payload columns) and deduplicated before the join
    assert "Project [md5(" in plan
    assert "Aggregate [fingerprint" in plan


def test_cdc_latest_state_tiebreak_and_tombstone_resurrect(spark):
    from kafka_connect_hdfs_spark.operators.cdc import compact_changelog, latest_state
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # key 1: same-ts tie → event_id 7 wins deterministically
        (1, t0, 6, "view", 1.0),
        (1, t0, 7, "click", 2.0),
        # key 2: deleted then re-created → survives compaction
        (2, t0, 1, "error", 0.0),
        (2, t0 + dt.timedelta(hours=1), 2, "signup", 3.0),
        # key 3: final record is a tombstone → dropped
        (3, t0, 3, "signup", 1.0),
        (3, t0 + dt.timedelta(hours=1), 4, "error", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string, value double"
    )
    state = {r.user_id: r for r in latest_state(df).collect()}
    assert state[1].last_event_id == 7 and state[1].last_event_type == "click"
    assert state[2].last_event_type == "signup"
    compacted = sorted(
        r.user_id for r in compact_changelog(df, tombstone_types=["error"]).collect()
    )
    assert compacted == [1, 2]


def test_cdc_latest_state_plan_has_no_sort_or_window(spark):
    from kafka_connect_hdfs_spark.operators.cdc import latest_state
    import datetime as dt

    df = spark.createDataFrame(
        [(1, dt.datetime(2026, 1, 1), 1, "view", 1.0)],
        "user_id long, ts timestamp, event_id long, event_type string, value double",
    )
    plan = latest_state(df)._jdf.queryExecution().executedPlan().toString()
    # the whole point: a partial-aggregable max(struct), not a windowed sort
    assert "HashAggregate" in plan or "SortAggregate" in plan or "ObjectHashAggregate" in plan
    assert "Window" not in plan
    assert "partial_max" in plan


def test_funnel_strict_order_horizon_and_plan(spark):
    import datetime as dt

    from kafka_connect_hdfs_spark.operators.funnel import (
        funnel_counts, funnel_times,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0)
    h = dt.timedelta(hours=1)
    rows = [
        # u1 completes all three in order
        (1, t0, 1, "signup"), (1, t0 + h, 2, "view"), (1, t0 + 2 * h, 3, "purchase"),
        # u2: view BEFORE signup and another AT the signup instant — neither
        # counts (strictly-after semantics); no purchase stage
        (2, t0 - h, 4, "view"), (2, t0, 5, "view"), (2, t0, 6, "signup"),
        # u3: view arrives past the 6h horizon → funnel stalls at stage 1
        (3, t0, 7, "signup"), (3, t0 + dt.timedelta(hours=7), 8, "view"),
        # u4: purchase before its view → only stages 1-2
        (4, t0, 9, "signup"), (4, t0 + h, 10, "purchase"), (4, t0 + 2 * h, 11, "view"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    times = {
        r.user_id: r
        for r in funnel_times(
            df, ("signup", "view", "purchase"), horizon_hours=6
        ).collect()
    }
    assert times[1].t2 == t0 + 2 * h
    assert times[2].t1 is None
    assert times[3].t1 is None and times[3].t0 == t0
    assert times[4].t1 == t0 + 2 * h and times[4].t2 is None

    counts = {
        r.stage: r.n_users
        for r in funnel_counts(
            df, ("signup", "view", "purchase"), horizon_hours=6
        ).collect()
    }
    assert counts == {1: 4, 2: 2, 3: 1}

    plan = (
        funnel_times(df, ("signup", "view", "purchase"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one keyed aggregate, no window functions, no Python evaluation
    assert "Window" not in plan
    assert "EvalPython" not in plan
    assert plan.count("Exchange") == 1


def test_cohort_retention_matrix(spark):
    import datetime as dt

    from kafka_connect_hdfs_spark.operators.funnel import cohort_retention

    mon = dt.datetime(2026, 1, 5, 10, 0)  # a Monday
    wk = dt.timedelta(days=7)
    rows = [
        # u1 signs up week 0, active weeks 0 and 2
        (1, mon, 1, "signup"), (1, mon + 2 * wk, 2, "view"),
        # u2 signs up week 0, active week 0 only; a pre-signup event is
        # excluded from the matrix
        (2, mon - wk, 3, "view"), (2, mon + dt.timedelta(days=2), 4, "signup"),
        # u3 never signs up → not in any cohort
        (3, mon, 5, "view"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {
        (r.cohort_week, r.week_n): r.n_active
        for r in cohort_retention(df).collect()
    }
    assert got == {("2026-01-05", 0): 2, ("2026-01-05", 2): 1}


def test_snapshot_diff_classification_and_pruned_join(spark):
    from kafka_connect_hdfs_spark.operators.dedup import snapshot_diff

    v1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    v2 = spark.createDataFrame(
        [(2, "beta"), (3, "GAMMA  edited"), (4, "delta")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in snapshot_diff(v1, v2).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}
    # text must be pruned out before the join: only fingerprints travel
    plan = snapshot_diff(v1, v2)._jdf.queryExecution().optimizedPlan().toString()
    join_part = plan.split("Join FullOuter")[1]
    assert "text" not in join_part.split("LogicalRDD")[0].replace(
        "md5(cast(trim(regexp_replace(lower(text", ""
    )
