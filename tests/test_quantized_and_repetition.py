"""Unit goldens for int8-quantized ANN and repetition quality signals."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_quantize_int8_golden(spark):
    from kafka_connect_hdfs_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [Row(v=[0.0, 1.0, -1.0, 0.5, -0.5, 2.0, -2.0, 0.999])]
    )
    got = df.select(quantize_int8(F.col("v")).alias("q")).first().q
    # floor(clip(x)*127): 0, 127, -127, floor(63.5)=63, floor(-63.5)=-64,
    # clip→127, clip→-127, floor(126.873)=126
    assert got == [0, 127, -127, 63, -64, 127, -127, 126]


def test_quantized_topk_matches_bruteforce_neighbors(spark, sf_dir):
    """With a generous rerank factor the two-stage retriever recovers the
    exact top-k (the standard recall check for quantized retrieval)."""
    from kafka_connect_hdfs_spark.operators.similarity import (
        brute_force_topk, quantized_topk,
    )
    from kafka_connect_hdfs_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in brute_force_topk(emb, queries, k=3).collect()
    }
    quant = {
        (r.query_id, r.rank): r.neighbor_id
        for r in quantized_topk(emb, queries, k=3, rerank_factor=10).collect()
    }
    overlap = sum(1 for k in exact if quant.get(k) == exact[k])
    assert overlap / len(exact) >= 0.8  # int8 coarse pass rarely misses at 10x


def test_repetition_signals_golden(spark):
    from kafka_connect_hdfs_spark.operators.text import with_repetition_signals

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a a a a"),          # one token repeated 4x
            Row(doc_id=2, text="w x y z"),          # all distinct
        ]
    )
    rows = {r.doc_id: r for r in with_repetition_signals(df).collect()}
    r1 = rows[1]
    assert r1.top_token_ratio == 1.0
    assert r1.distinct_token_ratio == 0.25
    assert r1.top_bigram_ratio == 1.0  # "a a" is every bigram
    r2 = rows[2]
    assert r2.top_token_ratio == 0.25
    assert r2.distinct_token_ratio == 1.0
    assert r2.top_bigram_ratio == pytest.approx(1 / 3)  # 3 distinct bigrams


class TestDimStats:
    def test_stats_exact_and_standardize_normalizes(self, spark):
        import math

        from kafka_connect_hdfs_spark.operators.similarity import (
            dim_stats, standardize,
        )

        rows = [(i, [float(i), 10.0, -i / 4.0]) for i in range(1, 9)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        stats = {r.dim: r for r in dim_stats(df, dim=3).collect()}
        # dim 0: values 1..8 → sum 36e6, mean 4.5e6 exact in fixed point
        assert stats[0].sum_scaled == 36_000_000
        assert stats[0].mean_scaled == 4_500_000.0
        assert math.isclose(stats[0].std_scaled / 1e6, 2.29128784747792, rel_tol=1e-9)
        # dim 1 is constant → zero variance
        assert stats[1].std_scaled == 0.0

        std_df = standardize(df, dim_stats(df, dim=3))
        vecs = [r.embedding for r in std_df.collect()]
        for d in range(3):
            vals = [v[d] for v in vecs]
            m = sum(vals) / len(vals)
            s2 = sum(x * x for x in vals) / len(vals) - m * m
            if d == 1:
                assert vals == [0.0] * 8  # zero-variance dim maps to 0
            else:
                assert abs(m) < 1e-6 and abs(s2 - 1.0) < 1e-6

    def test_plan_aggregates_before_explode(self, spark):
        from kafka_connect_hdfs_spark.operators.similarity import dim_stats

        df = spark.createDataFrame(
            [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
        )
        plan = dim_stats(df, dim=2)._jdf.queryExecution().executedPlan().toString()
        # the corpus is aggregated FIRST (map-side partials); the generator
        # reshapes the single result row, never the input rows
        assert plan.index("Generate") < plan.index("HashAggregate")
        assert "partial_sum" in plan or "partial_count" in plan


class TestSketches:
    def test_hll_exact_at_small_cardinality_and_merge_lossless(self, spark):
        import datetime as dt

        from kafka_connect_hdfs_spark.operators.sketches import (
            daily_sketch_rollup, distinct_with_sketch,
        )

        rows = [
            (i % 5, i % 937, dt.datetime(2026, 1, 1 + i % 20)) for i in range(5000)
        ]
        df = spark.createDataFrame(rows, "g int, u long, ts timestamp")
        direct = {r.g: r for r in distinct_with_sketch(df, "g", "u").collect()}
        merged = {r.g: r for r in daily_sketch_rollup(df, "g", "u").collect()}
        for g, r in direct.items():
            assert abs(r.n_est - r.n_exact) <= 0.02 * r.n_exact
            # union of per-day sketches == single-pass sketch (mergeability)
            assert merged[g].n_union == r.n_est

    def test_sketch_agg_is_partial_map_side(self, spark):
        from kafka_connect_hdfs_spark.operators.sketches import distinct_with_sketch

        df = spark.createDataFrame([(1, 2)], "g int, u long")
        plan = (
            distinct_with_sketch(df, "g", "u")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the sketch must partial-aggregate before the shuffle — fixed-size
        # registers cross the wire, not values
        assert "partial_hll_sketch_agg" in plan

    def test_approx_quantile_check_and_partial_agg(self, spark):
        from kafka_connect_hdfs_spark.operators.sketches import (
            quantiles_with_approx_check,
        )

        df = spark.createDataFrame(
            [(i % 3, float(i)) for i in range(3000)], "g int, v double"
        )
        rows = {r.g: r for r in quantiles_with_approx_check(df, "g", "v").collect()}
        for r in rows.values():
            assert r.approx_ok
        # group 0: values 0,3,...,2997 → median 1498.5 (interpolated)
        assert rows[0].p50 == 1498.5
        plan = (
            quantiles_with_approx_check(df, "g", "v")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "partial_percentile_approx" in plan

    def test_cms_upper_bounds_and_merges(self, spark):
        from kafka_connect_hdfs_spark.operators.sketches import (
            cms_estimate, count_min_table,
        )

        df = spark.createDataFrame(
            [(i % 50,) for i in range(2000)], "k long"
        )
        items = df.groupBy("k").agg(F.count("*").alias("true_n"))
        cms = count_min_table(df, "k", depth=4, width=64)
        est = {
            r.k: r.est_n
            for r in cms_estimate(cms, items, "k", depth=4, width=64).collect()
        }
        for r in items.collect():
            assert est[r.k] >= r.true_n  # CMS never undercounts
        # a wide sketch has no collisions over 50 keys → exact
        wide = count_min_table(df, "k", depth=4, width=4096)
        est_w = {
            r.k: r.est_n
            for r in cms_estimate(wide, items, "k", depth=4, width=4096).collect()
        }
        assert all(est_w[r.k] == r.true_n for r in items.collect())
        # mergeability: sketch(a) + sketch(b) == sketch(a ∪ b), cell-wise
        a, b = df.filter(F.col("k") < 25), df.filter(F.col("k") >= 25)
        merged = (
            count_min_table(a, "k", width=64)
            .unionByName(count_min_table(b, "k", width=64))
            .groupBy("r", "bucket").agg(F.sum("c").alias("c"))
        )
        whole = count_min_table(df, "k", width=64)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )

    def test_cms_shuffle_is_bounded_by_cells(self, spark):
        from kafka_connect_hdfs_spark.operators.sketches import count_min_table

        df = spark.createDataFrame([(1,)], "k long")
        plan = (
            count_min_table(df, "k")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # partial agg before the exchange: per-partition shuffle volume is
        # depth x width cells, never the key stream
        assert "partial_count" in plan


class TestZOrder:
    def test_zvalue_interleave_known_pairs(self, spark):
        from kafka_connect_hdfs_spark.operators.layout import zvalue

        df = spark.createDataFrame([(3, 5), (0, 0), (7, 1)], "x long, y long")
        got = {
            (r.x, r.y): r.z
            for r in df.select("x", "y", zvalue(["x", "y"], bits=3).alias("z")).collect()
        }
        # x bits land at even positions, y bits at odd
        assert got == {(3, 5): 39, (0, 0): 0, (7, 1): 23}

    def test_zvalue_rejects_overflow_and_stays_codegen(self, spark):
        import pytest as _pytest

        from kafka_connect_hdfs_spark.operators.layout import zvalue

        with _pytest.raises(ValueError):
            zvalue(["a", "b"], bits=32)
        df = spark.createDataFrame([(1, 2)], "x long, y long")
        plan = (
            df.select(zvalue(["x", "y"]).alias("z"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_zorder_layout_ranges_disjoint_and_locality(self, spark):
        from kafka_connect_hdfs_spark.operators.layout import zorder_layout, zvalue

        df = spark.createDataFrame(
            [(x, y) for x in range(32) for y in range(32)], "x long, y long"
        )
        laid = zorder_layout(df, ["x", "y"], bits=5, n_files=8)
        ranges = (
            laid.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.min("_z").alias("lo"), F.max("_z").alias("hi"))
            .orderBy("lo")
            .collect()
        )
        # every output split covers a contiguous, non-overlapping z-range —
        # the precondition for min/max file skipping
        for prev, cur in zip(ranges, ranges[1:]):
            assert prev.hi < cur.lo
        # locality: an equality predicate on EITHER column touches few
        # splits (here: at most half), though neither is the sort prefix
        with_p = laid.withColumn("p", F.spark_partition_id())
        for col in ("x", "y"):
            n_touched = with_p.filter(F.col(col) == 7).select("p").distinct().count()
            assert n_touched <= 4

    def test_file_stats_prune_is_sound(self, spark, tmp_path):
        from kafka_connect_hdfs_spark.operators.layout import (
            file_stats, prune_files, zorder_layout,
        )

        df = spark.createDataFrame(
            [(i, i % 97, (i * 7) % 211) for i in range(5000)],
            "rid long, x long, y long",
        )
        path = str(tmp_path / "laid")
        zorder_layout(df, ["x", "y"], bits=8, n_files=8).write.parquet(path)
        stats = file_stats(spark, path, ["x", "y"])
        assert stats.count() == 8
        for col, lo, hi in (("x", 10, 20), ("y", 100, 120)):
            files = [r.file for r in prune_files(stats, col, lo, hi).collect()]
            got = (
                spark.read.parquet(*files)
                .filter(F.col(col).between(lo, hi))
                .select("rid")
            )
            want = df.filter(F.col(col).between(lo, hi)).select("rid")
            # soundness: the pruned read loses no matching rows
            assert sorted(r.rid for r in got.collect()) == sorted(
                r.rid for r in want.collect()
            )
