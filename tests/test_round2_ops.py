"""Unit tests for the round-2 operator batch: chunk-level dedup with
reassembly, Levenshtein fuzzy-prefix pairs, unigram log-prob scoring,
pHash near-dup pairs, and the time-range window queries."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_chunk_dedup_removes_repeats_and_reassembles(spark):
    from kafka_connect_hdfs_spark.operators.dedup import chunk_dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),      # chunks (2-tok): "a b" "c d" "e f"
            (2, "a b x y"),           # "a b" duplicates doc 1's first chunk
            (3, "c d e f"),           # both chunks already seen in doc 1
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in chunk_dedup(docs, chunk_tokens=2).collect()}
    assert out[1]["n_chunks"] == 3 and out[1]["n_kept"] == 3
    assert out[1]["clean_text"] == "a b c d e f"
    assert out[2]["n_chunks"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["clean_text"] == "x y"
    # doc 3 fully duplicated: survives as a row with empty text
    assert out[3]["n_kept"] == 0 and out[3]["clean_text"] == ""


def test_chunk_dedup_keeps_first_occurrence_order(spark):
    from kafka_connect_hdfs_spark.operators.dedup import chunk_dedup

    docs = spark.createDataFrame(
        [(10, "p q r s"), (2, "p q")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in chunk_dedup(docs, chunk_tokens=2).collect()}
    # lowest doc_id wins the shared chunk
    assert out[2]["n_kept"] == 1
    assert out[10]["n_kept"] == 1 and out[10]["clean_text"] == "r s"


def test_fuzzy_prefix_pairs_blocks_and_thresholds(spark):
    from kafka_connect_hdfs_spark.operators.dedup import fuzzy_prefix_pairs

    docs = spark.createDataFrame(
        [
            (1, "breaking news: markets rally on cpi data today"),
            (2, "breaking news: markets rally on cpi data tonite"),
            (3, "breaking news: something entirely different happened here now"),
            (4, "completely unrelated document text goes here"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in fuzzy_prefix_pairs(
            docs, block_chars=8, prefix_chars=48, max_dist=12
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6
    assert (1, 4) not in pairs and (2, 4) not in pairs  # different block
    # 1 vs 3 share the block but diverge past the threshold
    assert (1, 3) not in pairs


def test_fuzzy_prefix_block_cap_drops_hot_blocks(spark):
    from kafka_connect_hdfs_spark.operators.dedup import fuzzy_prefix_pairs

    docs = spark.createDataFrame(
        [(i, "same-head different tail %d" % i) for i in range(6)],
        "doc_id long, text string",
    )
    capped = fuzzy_prefix_pairs(docs, max_block_size=2).count()
    assert capped == 0  # block of 6 > cap 2 → dropped entirely


def test_unigram_logprob_hand_computed(spark):
    from kafka_connect_hdfs_spark.operators.text import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b")], "doc_id long, text string"
    )
    # corpus counts: a=2, b=2, total=4 → logp(a)=logp(b)=ln(0.5)
    out = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 1
    expected = round(math.log(0.5), 6)
    assert abs(out[1]["avg_logprob"] - expected) < 1e-9
    assert abs(out[2]["avg_logprob"] - expected) < 1e-9


def test_phash_near_dup_identical_payloads(spark):
    from kafka_connect_hdfs_spark.operators.multimodal import phash_near_dup_pairs

    media = spark.createDataFrame(
        [
            (1, "image", bytearray(b"same-bytes")),
            (2, "image", bytearray(b"same-bytes")),
            (3, "image", bytearray(b"other-bytes")),
        ],
        "media_id long, media_type string, payload binary",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_dup_pairs(media, hamming_max=0).collect()
    }
    assert pairs == {(1, 2): 0}


def test_rolling_7d_revenue_frame_bounds(spark, sf_dir):
    from kafka_connect_hdfs_spark.plans.analytics4 import q_rolling_7d_revenue
    from kafka_connect_hdfs_spark.session import load_table

    out = q_rolling_7d_revenue(spark, sf_dir)
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert out.count() == n_orders
    # every row's rolling revenue includes at least its own order
    bad = out.filter(
        (F.col("n_orders_7d") < 1) | (F.col("revenue_7d") <= 0)
    ).count()
    assert bad == 0


def test_customer_deciles_partition_customers(spark, sf_dir):
    from kafka_connect_hdfs_spark.plans.analytics4 import q_customer_value_deciles
    from kafka_connect_hdfs_spark.session import load_table

    rows = q_customer_value_deciles(spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n_cust = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    # deciles are ordered by spend: first decile outearns the last
    assert rows[0]["decile_spend"] > rows[-1]["decile_spend"]


def test_quality_percentile_filter_keeps_top_share(spark):
    from kafka_connect_hdfs_spark.operators.text import quality_percentile_filter

    docs = spark.createDataFrame(
        [
            (1, "en", "the cat sat on the mat and it is nice"),
            (2, "en", "zzzz zzzz zzzz zzzz"),
            (3, "en", "a clean readable sentence with the usual words in it"),
            (4, "de", "der hund ist nicht da und das ist gut"),
        ],
        "doc_id long, lang string, text string",
    )
    kept = quality_percentile_filter(docs, min_percentile=0.5).collect()
    ids = {r["doc_id"] for r in kept}
    # the repetitive no-stopword doc ranks lowest among "en" and is cut
    assert 2 not in ids
    # the lone "de" doc is percentile 0 of its own language -> cut at 0.5...
    # percent_rank of a single-row partition is 0, which is < 0.5
    assert 4 not in ids
    assert {1, 3} & ids


def test_unk_replace_positions_and_counts(spark):
    from kafka_connect_hdfs_spark.operators.text import unk_replace

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta gamma")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unk_replace(docs, min_count=2).collect()}
    # alpha(2) and beta(2) survive; gamma(1) -> <unk>
    assert out[1]["pruned_text"] == "alpha beta alpha" and out[1]["n_unk"] == 0
    assert out[2]["pruned_text"] == "beta <unk>" and out[2]["n_unk"] == 1
    assert out[2]["n_tokens"] == 2


def test_quality_percentile_approx_matches_exact(spark):
    """The scale path (per-language percentile_approx threshold, no
    per-language sort) must keep the same documents as the exact
    percent_rank window form to within sketch error."""
    from kafka_connect_hdfs_spark.operators.text import quality_percentile_filter
    from kafka_connect_hdfs_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    exact = {
        r["doc_id"]
        for r in quality_percentile_filter(docs, min_percentile=0.3).collect()
    }
    approx = {
        r["doc_id"]
        for r in quality_percentile_filter(
            docs, min_percentile=0.3, exact=False
        ).collect()
    }
    assert exact and approx
    sym = exact ^ approx
    assert len(sym) <= max(2, 0.05 * len(exact)), (
        f"approx/exact kept-sets diverge: {len(sym)} of {len(exact)}"
    )


def test_unk_replace_join_path_matches_literal_path(spark):
    """Above the vocab-literal threshold unk_replace switches to
    posexplode → broadcast-join → position-preserving reassembly; both
    strategies must produce identical output."""
    from kafka_connect_hdfs_spark.operators.text import unk_replace
    from kafka_connect_hdfs_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    lit_rows = sorted(
        tuple(r) for r in unk_replace(docs, min_count=3).collect()
    )
    join_rows = sorted(
        tuple(r)
        for r in unk_replace(docs, min_count=3, vocab_literal_max=0).collect()
    )
    assert lit_rows == join_rows


def test_unk_replace_empty_vocab_is_all_unk(spark):
    """A min_count nothing reaches must not break plan resolution (the old
    zero-element F.array literal had void element type): every token
    becomes <unk> on both strategies."""
    from kafka_connect_hdfs_spark.operators.text import unk_replace

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id long, text string"
    )
    for kw in ({}, {"vocab_literal_max": 0}):
        out = {r["doc_id"]: r for r in unk_replace(docs, min_count=99, **kw).collect()}
        assert out[1]["pruned_text"] == "<unk> <unk>" and out[1]["n_unk"] == 2
        assert out[2]["pruned_text"] == "<unk>" and out[2]["n_unk"] == 1


def test_bloom_filter_write_lands_blooms(spark, tmp_path):
    import glob
    import os

    from kafka_connect_hdfs_spark.operators.layout import write_with_bloom_filters
    from kafka_connect_hdfs_spark.session import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").limit(2000).coalesce(1)
    plain, bloomed = f"{tmp_path}/plain", f"{tmp_path}/bloomed"
    write_with_bloom_filters(ev, plain, bloom_cols=[])
    # small write: the dictionary would swallow the bloom (see docstring),
    # so force dictionary off for the bloomed column
    write_with_bloom_filters(
        ev, bloomed, bloom_cols=["user_id"], ndv=50_000, disable_dictionary=True
    )

    def total(p):
        return sum(os.path.getsize(f) for f in glob.glob(f"{p}/*.parquet"))

    # this pyarrow can't read bloom offsets, so verify behaviorally: the
    # bloom filter is extra file payload (ndv=50k ⇒ tens of KB) on an
    # otherwise byte-identical write
    assert total(bloomed) - total(plain) > 10_000
    # data survives the round trip
    assert spark.read.parquet(bloomed).count() == ev.count()


def test_partition_profile_reports_skew(spark):
    from kafka_connect_hdfs_spark.operators.layout import partition_profile

    df = spark.range(1000).repartition(4, "id")
    prof = partition_profile(df).collect()
    assert sum(r["n_rows"] for r in prof) == 1000
    assert max(r["share_of_max"] for r in prof) == 1.0
    # a single-partition frame is maximally skewed: one row, share 1.0
    one = partition_profile(spark.range(10).coalesce(1)).collect()
    assert len(one) == 1 and one[0]["share_of_max"] == 1.0


def test_pq_topk_recall_against_exact(spark):
    from kafka_connect_hdfs_spark.operators.similarity import (
        brute_force_topk, pq_topk,
    )
    from kafka_connect_hdfs_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    approx = pq_topk(emb, queries, k=10, m=4, n_codes=16).collect()
    assert len(approx) == 5 * 10
    hits = sum(1 for r in approx if (r["query_id"], r["neighbor_id"]) in exact)
    # compressed-domain search is approximate; deterministic fixture makes
    # this a stable regression bound rather than a flaky recall target
    assert hits / len(approx) >= 0.3


def test_pq_codes_shape_and_range(spark):
    from kafka_connect_hdfs_spark.operators.similarity import pq_codebook, pq_encode
    from kafka_connect_hdfs_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    book = pq_codebook(emb, m=4, n_codes=8)
    assert len(book) == 4 and all(len(bj) == 8 for bj in book)
    rows = pq_encode(emb, book).collect()
    assert len(rows) == emb.count()
    for r in rows[:50]:
        assert len(r["codes"]) == 4
        assert all(0 <= c < 8 for c in r["codes"])
    # a codebook member encodes (in its own subspaces) to itself: vec 3's
    # subvector distance to centroid 3 is 0 in every subspace
    own = next(r for r in rows if r["vec_id"] == 3)
    assert own["codes"] == [3, 3, 3, 3]


def test_ivfpq_candidates_respect_cells(spark):
    from kafka_connect_hdfs_spark.operators.similarity import (
        assign_ivf_cells, ivfpq_topk,
    )
    from kafka_connect_hdfs_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    out = ivfpq_topk(emb, queries, k=5, n_seeds=8, n_probe=2).collect()
    assert len(out) == 3 * 5
    # every returned neighbor must live in one of its query's 2 probed cells
    cells = {
        r["vec_id"]: r["cell"]
        for r in assign_ivf_cells(emb, emb.filter(F.col("vec_id") < 8)).collect()
    }
    from kafka_connect_hdfs_spark.operators.similarity import assign_ivf_probe_cells

    probes = {
        r["vec_id"]: set(r["cells"])
        for r in assign_ivf_probe_cells(
            emb.filter(F.col("vec_id") < 3), emb.filter(F.col("vec_id") < 8), 2
        ).collect()
    }
    for r in out:
        assert cells[r["neighbor_id"]] in probes[r["query_id"]], r


def test_salted_join_matches_plain_join(spark, sf_dir):
    from kafka_connect_hdfs_spark.functions import salted_join
    from kafka_connect_hdfs_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    dim = (
        ev.select("user_id").distinct().withColumn(
            "tier", (F.col("user_id") % 3).cast("int")
        )
    )
    plain = ev.join(dim, "user_id").select("event_id", "tier")
    salted = salted_join(ev, dim, "user_id", salt_buckets=8).select(
        "event_id", "tier"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # left join keeps unmatched big-side rows exactly once
    dim_half = dim.filter(F.col("user_id") % 2 == 0)
    left = salted_join(ev, dim_half, "user_id", salt_buckets=8, how="left")
    assert left.count() == ev.count()
    assert left.filter(F.col("tier").isNull()).count() == ev.join(
        dim_half, "user_id", "left_anti"
    ).count()
    # rows of one key spread across several salt buckets (the point)
    import pyspark.sql.functions as SF
    salt = (SF.abs(SF.xxhash64(*[SF.col(c) for c in ev.columns])) % 8).cast("int")
    n_buckets = (
        ev.withColumn("_s", salt)
        .groupBy("user_id")
        .agg(SF.countDistinct("_s").alias("nb"))
        .agg(SF.max("nb"))
        .first()[0]
    )
    assert n_buckets > 1


def test_ngram_counts_hand_checked(spark):
    from kafka_connect_hdfs_spark.operators.text import ngram_counts

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x")], "doc_id long, text string"
    )
    out = {r["gram"]: r["n_occurrences"] for r in ngram_counts(docs, n=2).collect()}
    # "a b" in doc1 (x2) + doc2; "b a" once; single-token doc contributes none
    assert out == {"a b": 3, "b a": 1}
    tri = {r["gram"]: r["n_occurrences"] for r in ngram_counts(docs, n=3).collect()}
    assert tri == {"a b a": 1, "b a b": 1}


def test_incremental_neardup_catches_edited_recrawls(spark):
    from kafka_connect_hdfs_spark.operators.dedup import (
        incremental_dedup, incremental_near_dup_candidates,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    snapshot = spark.createDataFrame(
        [(1, base), (2, "completely different content here entirely now")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100, base + " extra"), (101, "nothing in common with anything x y z")],
        "doc_id long, text string",
    )
    pairs = {
        (r["batch_id"], r["snapshot_id"])
        for r in incremental_near_dup_candidates(batch, snapshot).collect()
    }
    assert (100, 1) in pairs          # edited re-crawl caught
    assert all(b != 101 for b, _ in pairs)  # novel doc untouched
    # exact incremental dedup misses the edited re-crawl — the gap this op closes
    assert incremental_dedup(batch, snapshot).count() == 2


def test_parse_with_quarantine_splits_and_preserves_raw(spark):
    from kafka_connect_hdfs_spark.sources import parse_with_quarantine

    df = spark.createDataFrame(
        [
            (1, '{"k": 10, "s": "ok"}'),
            (2, "not json at all"),
            (3, '{"k": 20}'),
            (4, None),
        ],
        "id long, value string",
    )
    good, bad = parse_with_quarantine(df, "k bigint, s string")
    g = {r["id"]: (r["k"], r["s"]) for r in good.collect()}
    assert g == {1: (10, "ok"), 3: (20, None)}
    # bad keeps the ORIGINAL columns for quarantine landing + replay
    b = {r["id"]: r["value"] for r in bad.collect()}
    assert set(b) == {2, 4} and b[2] == "not json at all"
    assert bad.columns == df.columns


def test_parse_with_quarantine_field_named_like_payload_survives(spark):
    """A parsed field sharing the payload column's name must not be dropped
    (the old '_p.*' + drop-by-name form silently removed it); a parsed field
    colliding with any OTHER raw column is rejected up front."""
    import pytest

    from kafka_connect_hdfs_spark.sources import parse_with_quarantine

    df = spark.createDataFrame(
        [(1, '{"value": 7, "k": 10}')], "id long, value string"
    )
    good, _ = parse_with_quarantine(df, "value bigint, k bigint")
    row = good.collect()[0]
    assert row["value"] == 7 and row["k"] == 10 and row["id"] == 1

    with pytest.raises(ValueError, match="collide"):
        parse_with_quarantine(df, "id bigint, k bigint")


def test_profile_table_counts_and_nulls(spark):
    from kafka_connect_hdfs_spark.operators.quality import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")], "k long, s string"
    )
    prof = {r["column"]: r for r in profile_table(df, exact_distinct=True).collect()}
    assert prof["k"]["n_rows"] == 4 and prof["k"]["n_null"] == 1
    assert prof["k"]["n_distinct"] == 3 and prof["k"]["min_value"] == "1"
    assert prof["s"]["n_distinct"] == 2 and prof["s"]["null_ratio"] == 0.25


def test_referential_integrity_finds_orphans(spark):
    from kafka_connect_hdfs_spark.operators.quality import referential_integrity

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    row = referential_integrity(child, parent, "fk", "pk", "c_p").first()
    assert row["relation"] == "c_p"
    assert row["n_orphan_rows"] == 1 and row["n_orphan_keys"] == 1
    assert row["n_null_keys"] == 1


def test_rebalance_for_write_plans_rebalance_exchange(spark):
    from kafka_connect_hdfs_spark.operators.layout import rebalance_for_write
    from kafka_connect_hdfs_spark.session import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    df = rebalance_for_write(ev, "event_type")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "RebalancePartitions" in plan or "rebalance" in plan.lower(), plan
    # semantics unchanged
    assert df.count() == ev.count()


def test_streaming_progress_metrics(spark, sf_dir, tmp_path):
    from kafka_connect_hdfs_spark.session import load_table
    from kafka_connect_hdfs_spark.streaming.pipeline import progress_metrics

    ev = load_table(spark, sf_dir, "events").limit(200)
    src = f"{tmp_path}/src"
    ev.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        stream.groupBy("event_type").count()
        .writeStream.format("memory").queryName("pm_out")
        .outputMode("complete")
        .option("checkpointLocation", f"{tmp_path}/chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    m = progress_metrics(q)
    assert m["batch_id"] >= 0
    assert m["batch_duration_ms"] > 0
    assert m["state_rows"] >= 0


def test_scd2_intervals_chain_without_gaps(spark):
    from kafka_connect_hdfs_spark.operators.cdc import scd2_intervals

    import datetime as dt
    rows = [
        (7, dt.datetime(2020, 1, i + 1), i, "t", float(i)) for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string, value double"
    )
    out = sorted(scd2_intervals(df).collect(), key=lambda r: r["valid_from"])
    # each version ends exactly where the next begins; only the last is open
    for a, b in zip(out, out[1:]):
        assert a["valid_to"] == b["valid_from"] and not a["is_current"]
    assert out[-1]["valid_to"] is None and out[-1]["is_current"]


def test_table_checksum_order_independent_and_sensitive(spark):
    from kafka_connect_hdfs_spark.operators.quality import table_checksum

    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, None)], "k long, s string")
    base = table_checksum(df).first()
    shuffled = table_checksum(df.repartition(7).sortWithinPartitions("s")).first()
    assert (base["n_rows"], base["checksum"]) == (shuffled["n_rows"], shuffled["checksum"])
    changed = table_checksum(
        df.withColumn("s", F.when(F.col("k") == 2, "B").otherwise(F.col("s")))
    ).first()
    assert changed["checksum"] != base["checksum"]
