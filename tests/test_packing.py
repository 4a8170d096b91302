"""Sequence packing, PII scrubbing, deterministic splits, Lloyd refinement."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kafka_connect_hdfs_spark.operators.packing import (
    scrub_pii,
    split_corpus,
    with_sequence_packing,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"word {'x ' * (i % 7)}doc{i}", 10 + i % 5) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string, n_chars int")


def _tokens(df):
    t = F.trim(F.col("text"))
    return df.select(
        "doc_id",
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .alias("n_tokens"),
    )


class TestSequencePacking:
    def test_offsets_within_budget_and_contiguous(self, docs):
        packed = with_sequence_packing(_tokens(docs), budget=16, shards=4)
        rows = sorted(packed.collect(), key=lambda r: (r.shard, r.doc_id))
        assert all(0 <= r.offset_in_seq < 16 for r in rows)
        # within a shard, start positions are the running total of tokens:
        # seq * budget + offset reconstructs the concatenation order exactly
        by_shard: dict[int, int] = {}
        for r in rows:
            start = r.seq * 16 + r.offset_in_seq
            assert start == by_shard.get(r.shard, 0)
            by_shard[r.shard] = start + r.n_tokens

    def test_deterministic_across_partitionings(self, docs):
        base = _tokens(docs)
        a = with_sequence_packing(base.repartition(1), budget=32, shards=4)
        b = with_sequence_packing(base.repartition(13), budget=32, shards=4)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_long_doc_spans_sequences(self, spark):
        df = spark.createDataFrame(
            [(1, 100), (2, 5)], "doc_id long, n_tokens long"
        )
        packed = {r.doc_id: r for r in with_sequence_packing(
            df, budget=16, shards=1
        ).collect()}
        # doc 1 starts at 0; doc 2 starts at token 100 → sequence 6, offset 4
        assert (packed[2].seq, packed[2].offset_in_seq) == (6, 4)


class TestScrubPii:
    def test_redacts_and_counts(self, spark):
        df = spark.createDataFrame(
            [
                (1, "mail a@b.com and c.d@e.org, ip 10.0.0.1, id 123-45-6789"),
                (2, "clean text with no pii at all"),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in scrub_pii(df).collect()}
        assert (out[1].n_email, out[1].n_ipv4, out[1].n_id_number) == (2, 1, 1)
        assert (out[2].n_email, out[2].n_ipv4, out[2].n_id_number) == (0, 0, 0)

    def test_fingerprint_of_clean_text_is_md5_of_original(self, spark):
        import hashlib

        df = spark.createDataFrame([(1, "nothing here")], "doc_id long, text string")
        row = scrub_pii(df).first()
        assert row.scrubbed_fp == hashlib.md5(b"nothing here").hexdigest()


class TestSplitCorpus:
    def test_partition_of_unity_and_rough_weights(self, docs):
        out = split_corpus(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
        counts = {r.split: r.n for r in out.groupBy("split").agg(
            F.count("*").alias("n")).collect()}
        assert sum(counts.values()) == 200
        assert counts["train"] > counts.get("val", 0)
        assert counts["train"] > counts.get("test", 0)

    def test_assignment_stable_under_corpus_growth(self, docs):
        full = split_corpus(docs).select("doc_id", "split").collect()
        half = split_corpus(docs.filter(F.col("doc_id") < 100)).select(
            "doc_id", "split"
        ).collect()
        full_map = {r.doc_id: r.split for r in full}
        assert all(full_map[r.doc_id] == r.split for r in half)


class TestLloydRefine:
    def test_membership_totals_and_centroid_of_singleton(self, spark):
        from kafka_connect_hdfs_spark.operators.similarity import lloyd_refine

        emb = spark.createDataFrame(
            [
                (0, [1.0, 0.0]),
                (1, [0.0, 1.0]),
                (2, [0.9, 0.1]),
                (3, [0.05, 0.99]),
            ],
            "vec_id long, embedding array<double>",
        )
        seeds = emb.filter(F.col("vec_id") < 2)
        out = lloyd_refine(emb, seeds)
        rows = {(r.cell, r.dim): r for r in out.collect()}
        # vectors 0,2 → cell 0; vectors 1,3 → cell 1; dims both present
        assert rows[(0, 0)].n_members == 2 and rows[(1, 0)].n_members == 2
        assert rows[(0, 0)].centroid_val == pytest.approx(0.95)
        assert rows[(1, 1)].centroid_val == pytest.approx(0.995)


class TestTfidf:
    def test_top_terms_rank_and_smoothed_idf(self, spark):
        import math

        from kafka_connect_hdfs_spark.operators.text import tfidf_top_terms

        df = spark.createDataFrame(
            [
                (1, "apple apple banana common"),
                (2, "banana cherry common"),
                (3, "cherry cherry cherry common"),
            ],
            "doc_id long, text string",
        )
        out = tfidf_top_terms(df, top_n=2)
        rows = {(r.doc_id, r.rank): r for r in out.collect()}
        # doc 1: apple tf=2 df=1 beats banana tf=1 df=2
        assert rows[(1, 1)].term == "apple"
        exp = round(2 * (math.log(4 / 2) + 1.0), 6)
        assert rows[(1, 1)].tfidf == pytest.approx(exp)
        # doc 2: banana/cherry (df=2) outrank 'common' (df=3, idf=1.0);
        # equal scores break ties alphabetically
        assert rows[(2, 1)].term == "banana" and rows[(2, 2)].term == "cherry"
        # doc 3: cherry tf=3 dominates
        assert rows[(3, 1)].term == "cherry"


class TestShuffleOrder:
    def test_positions_dense_per_shard_and_seed_changes_order(self, docs):
        from kafka_connect_hdfs_spark.operators.packing import shuffle_order

        a = shuffle_order(docs, shards=4, seed="epoch0")
        rows = a.select("doc_id", "shard", "position").collect()
        by_shard: dict[int, list[int]] = {}
        for r in rows:
            by_shard.setdefault(r.shard, []).append(r.position)
        for shard, ps in by_shard.items():
            assert sorted(ps) == list(range(1, len(ps) + 1)), shard
        # a different seed permutes assignments
        b = shuffle_order(docs, shards=4, seed="epoch1")
        a_map = {r.doc_id: (r.shard, r.position) for r in rows}
        b_map = {r.doc_id: (r.shard, r.position) for r in b.collect()}
        assert any(a_map[i] != b_map[i] for i in a_map)
        # same seed is reproducible regardless of partitioning
        c = shuffle_order(docs.repartition(13), shards=4, seed="epoch0")
        assert {r.doc_id: (r.shard, r.position) for r in c.collect()} == a_map


class TestBestfitPacking:
    def test_bins_within_budget_and_all_docs_assigned(self, docs):
        from kafka_connect_hdfs_spark.operators.packing import pack_sequences_bestfit

        packed = pack_sequences_bestfit(_tokens(docs), budget=16, shards=4)
        rows = packed.collect()
        assert {r.doc_id for r in rows} == set(range(200))
        loads: dict[tuple[int, int], int] = {}
        for r in rows:
            loads[(r.shard, r.seq)] = loads.get((r.shard, r.seq), 0) + r.n_tokens
        # every doc here fits the budget, so no bin may exceed it
        assert all(v <= 16 for v in loads.values()), loads

    def test_oversized_doc_gets_own_overflow_bin(self, spark):
        from kafka_connect_hdfs_spark.operators.packing import pack_sequences_bestfit

        df = spark.createDataFrame(
            [(1, 100), (2, 10), (3, 10)], "doc_id long, n_tokens long"
        )
        rows = {r.doc_id: r for r in pack_sequences_bestfit(
            df, budget=16, shards=1
        ).collect()}
        # doc 1 (oversized) is alone in its bin; docs 2,3 share or split bins
        big_bin = rows[1].seq
        assert all(r.seq != big_bin for i, r in rows.items() if i != 1)

    def test_deterministic_across_partitionings(self, docs):
        from kafka_connect_hdfs_spark.operators.packing import pack_sequences_bestfit

        base = _tokens(docs)
        a = pack_sequences_bestfit(base.repartition(1), budget=32, shards=4)
        b = pack_sequences_bestfit(base.repartition(13), budget=32, shards=4)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestWeightedSample:
    def test_k_rows_deterministic_and_partition_invariant(self, docs):
        from kafka_connect_hdfs_spark.operators.packing import weighted_sample

        a = weighted_sample(docs, k=25, weight_col="n_chars")
        b = weighted_sample(docs.repartition(13), k=25, weight_col="n_chars")
        ra = sorted(map(tuple, a.collect()))
        assert len(ra) == 25
        assert ra == sorted(map(tuple, b.collect()))

    def test_nonpositive_weights_never_sampled(self, spark):
        from kafka_connect_hdfs_spark.operators.packing import weighted_sample

        df = spark.createDataFrame(
            [(i, "t", 0 if i % 2 else 5) for i in range(40)],
            "doc_id long, text string, n_chars int",
        )
        got = weighted_sample(df, k=40, weight_col="n_chars").collect()
        assert {r.doc_id % 2 for r in got} == {0}  # only positive-weight rows
        assert len(got) == 20

    def test_heavier_rows_win_proportionally(self, spark):
        from kafka_connect_hdfs_spark.operators.packing import weighted_sample

        # 1000 rows: ids < 100 carry 50x the weight of the rest. Expected
        # heavy share of a k=100 A-ES sample is >> the 10% population share;
        # seeded hash keys make the outcome exact and stable, not flaky.
        df = spark.createDataFrame(
            [(i, 50 if i < 100 else 1) for i in range(1000)],
            "doc_id long, w int",
        )
        got = weighted_sample(df, k=100, weight_col="w")
        n_heavy = got.filter(F.col("doc_id") < 100).count()
        assert n_heavy > 50

    def test_plan_is_take_ordered_no_shuffle(self, docs):
        from kafka_connect_hdfs_spark.operators.packing import weighted_sample

        plan = weighted_sample(docs, k=10, weight_col="n_chars")._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "Exchange" not in plan
