"""Round-3 batch B operators: SemDeDup semantic dedup, sliding-window
chunking with overlap, markup stripping, metadata-filtered ANN."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# semantic_dedup


def test_semantic_dedup_flags_identical_vectors(spark):
    from kafka_connect_hdfs_spark.operators.similarity import semantic_dedup

    # 0 and 3 identical; 1 orthogonal-ish; 2 identical to 0 as well
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [1.0, 0.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in semantic_dedup(emb, n_seeds=2, threshold=0.95).collect()}
    assert out[0]["keep"] and out[0]["dup_of"] is None  # lowest id survives
    assert out[1]["keep"]                               # dissimilar survives
    assert not out[2]["keep"] and out[2]["dup_of"] == 0
    assert not out[3]["keep"] and out[3]["dup_of"] == 0  # min lower-id match


def test_semantic_dedup_cross_cell_pairs_never_compared(spark):
    from kafka_connect_hdfs_spark.operators.similarity import semantic_dedup

    # seeds = vecs 0,1 (orthogonal): 2 lands in 0's cell, 3 in 1's cell.
    # 2 and 3 are identical to their cell seeds but in different cells —
    # each is a dup of its seed, not of each other.
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.9, 0.1]),
        (3, [0.1, 0.9]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in semantic_dedup(emb, n_seeds=2, threshold=0.9).collect()}
    assert out[2]["dup_of"] == 0 and out[2]["cell"] == 0
    assert out[3]["dup_of"] == 1 and out[3]["cell"] == 1


# ---------------------------------------------------------------------------
# chunk_with_overlap


def _chunks(spark, text, window, stride):
    from kafka_connect_hdfs_spark.operators.packing import chunk_with_overlap

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return sorted(
        chunk_with_overlap(df, window=window, stride=stride).collect(),
        key=lambda r: r["chunk_idx"],
    )


def test_chunk_short_doc_single_chunk(spark):
    rows = _chunks(spark, "a b c", window=8, stride=4)
    assert len(rows) == 1
    assert rows[0]["start_token"] == 0 and rows[0]["n_chunk_tokens"] == 3
    assert rows[0]["chunk_text"] == "a b c"


def test_chunk_exact_window_no_extra_chunk(spark):
    rows = _chunks(spark, "a b c d", window=4, stride=2)
    assert [r["start_token"] for r in rows] == [0]


def test_chunk_overlap_covers_every_boundary(spark):
    toks = " ".join(f"t{i}" for i in range(10))
    rows = _chunks(spark, toks, window=4, stride=2)
    # starts 0,2,4,6: last window reaches token 9 (6+4)
    assert [r["start_token"] for r in rows] == [0, 2, 4, 6]
    assert rows[-1]["n_chunk_tokens"] == 4
    # consecutive chunks share window-stride tokens
    assert rows[0]["chunk_text"].split()[2:] == rows[1]["chunk_text"].split()[:2]


def test_chunk_trailing_partial_kept(spark):
    toks = " ".join(f"t{i}" for i in range(9))
    rows = _chunks(spark, toks, window=4, stride=4)
    assert [r["start_token"] for r in rows] == [0, 4, 8]
    assert rows[-1]["n_chunk_tokens"] == 1 and rows[-1]["chunk_text"] == "t8"


def test_chunk_empty_doc_dropped_and_bad_stride_raises(spark):
    from kafka_connect_hdfs_spark.operators.packing import chunk_with_overlap

    df = spark.createDataFrame([(1, "   ")], "doc_id long, text string")
    assert chunk_with_overlap(df, window=4, stride=2).count() == 0
    with pytest.raises(ValueError):
        chunk_with_overlap(df, window=4, stride=5)
    with pytest.raises(ValueError):
        chunk_with_overlap(df, window=4, stride=0)


# ---------------------------------------------------------------------------
# strip_markup


def _strip_one(spark, html):
    from kafka_connect_hdfs_spark.operators.text import strip_markup

    df = spark.createDataFrame([(1, html)], "doc_id long, text string")
    return strip_markup(df).collect()[0]["clean_text"]


def test_strip_markup_tags_and_entities(spark):
    got = _strip_one(spark, '<p class="x">Tom &amp; Jerry &lt;3</p>')
    assert got == "Tom & Jerry <3"


def test_strip_markup_removes_script_and_style_content(spark):
    got = _strip_one(
        spark,
        "<style>p { color: red }</style>before"
        '<script type="text/javascript">var a = "<b>not text</b>";</script>after',
    )
    assert got == "before after"


def test_strip_markup_comments_and_whitespace_squeeze(spark):
    got = _strip_one(spark, "a <!-- hidden\nlines --> b\n\n  <br/>   c")
    assert got == "a b c"


def test_strip_markup_double_escaped_entity_single_decode(spark):
    # "&amp;lt;" is the ESCAPED text "&lt;" — one decode pass, not two
    assert _strip_one(spark, "x &amp;lt; y") == "x &lt; y"


# ---------------------------------------------------------------------------
# filtered_topk


def test_filtered_topk_respects_metadata_filter(spark):
    from kafka_connect_hdfs_spark.operators.similarity import filtered_topk
    from kafka_connect_hdfs_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = filtered_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)
    rows = out.collect()
    assert rows and all(r["rank"] <= 3 for r in rows)
    # every neighbor shares the query's label (pre-filter semantics)
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    for r in rows:
        assert labels[r["neighbor_id"]] == r["label"] == labels[r["query_id"]]
        assert r["neighbor_id"] != r["query_id"]


def test_filtered_topk_prefilter_returns_k_within_group(spark):
    from kafka_connect_hdfs_spark.operators.similarity import filtered_topk

    rows = [
        (0, [1.0, 0.0], "a"),
        (1, [0.9, 0.1], "a"),
        (2, [0.8, 0.2], "a"),
        (3, [0.0, 1.0], "b"),
        (4, [0.1, 0.9], "b"),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    out = filtered_topk(emb, emb.filter(F.col("vec_id") == 0), k=2)
    got = sorted((r["neighbor_id"] for r in out.collect()))
    assert got == [1, 2]  # never the cosine-lower but other-label 3/4


# ---------------------------------------------------------------------------
# temperature_sample


def test_temperature_sample_rates_flatten_toward_low_resource(spark):
    from kafka_connect_hdfs_spark.operators.packing import temperature_sample

    # 'big' has 16x the tokens of 'small' → alpha=.5 gives it only 4x the
    # weight; rate_small / rate_big = sqrt(16) = 4
    rows = [(i, "big", 100) for i in range(160)] + [
        (1000 + i, "small", 100) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = temperature_sample(df, budget_tokens=4000, alpha=0.5)
    rates = {
        r["lang"]: r["keep_rate"]
        for r in out.select("lang", "keep_rate").distinct().collect()
    }
    assert abs(rates["small"] / rates["big"] - 4.0) < 1e-3
    # deterministic: same inputs → same kept set
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in temperature_sample(df, 4000, 0.5).collect())
    assert a == b and 0 < len(a) < len(rows)


def test_temperature_sample_rate_clips_at_one(spark):
    from kafka_connect_hdfs_spark.operators.packing import temperature_sample

    # budget far above the corpus: every rate clips to 1.0, everything kept
    rows = [(1, "a", 10), (2, "a", 10), (3, "b", 5)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = temperature_sample(df, budget_tokens=10_000, alpha=0.5).collect()
    assert len(out) == 3 and all(r["keep_rate"] == 1.0 for r in out)


def test_temperature_sample_empty_input(spark):
    from kafka_connect_hdfs_spark.operators.packing import temperature_sample

    df = spark.createDataFrame([], "doc_id long, lang string, n_tokens long")
    assert temperature_sample(df, budget_tokens=100).count() == 0


# ---------------------------------------------------------------------------
# source_report


def test_source_report_counts_exact_dups(spark):
    from kafka_connect_hdfs_spark.operators.quality import source_report

    rows = [
        (1, "s1", "en", "same text here"),
        (2, "s1", "en", "same text here"),
        (3, "s1", "de", "other text"),
        (4, "s2", "en", "unique a"),
        (5, "s2", "en", "unique b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string, text string")
    out = {r["source"]: r for r in source_report(df).collect()}
    s1 = out["s1"]
    assert s1["n_docs"] == 3 and s1["n_distinct_texts"] == 2
    assert s1["n_dup_docs"] == 1 and s1["n_langs"] == 2
    assert s1["total_tokens"] == 3 + 3 + 2
    s2 = out["s2"]
    assert s2["n_dup_docs"] == 0 and s2["dup_ratio"] == 0.0
    assert s2["mean_tokens_per_doc"] == 2.0


def test_source_report_approx_mode_runs_without_expand(spark):
    from kafka_connect_hdfs_spark.operators.quality import source_report
    from kafka_connect_hdfs_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    exact = {r["source"]: r for r in source_report(docs).collect()}
    approx = {r["source"]: r for r in source_report(docs, exact_distinct=False).collect()}
    assert set(exact) == set(approx)
    for s in exact:  # HLL within its error bound on these cardinalities
        assert abs(approx[s]["n_distinct_texts"] - exact[s]["n_distinct_texts"]) <= max(
            2, 0.05 * exact[s]["n_distinct_texts"]
        )
        # integer-exact columns agree regardless of distinct mode
        assert approx[s]["total_tokens"] == exact[s]["total_tokens"]


# ---------------------------------------------------------------------------
# persisted IVF index


def test_ivf_index_roundtrip_matches_in_memory(spark, tmp_path):
    from kafka_connect_hdfs_spark.operators.similarity import (
        build_ivf_index, ivf_topk, query_ivf_index,
    )
    from kafka_connect_hdfs_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    path = f"{tmp_path}/idx"
    build_ivf_index(emb, path, n_seeds=8)
    served = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
        for r in query_ivf_index(spark, path, list(range(10)), k=5).collect()
    )
    mem = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
        for r in ivf_topk(
            emb, emb.filter(F.col("vec_id") < 10), k=5, n_seeds=8
        ).collect()
    )
    assert served == mem


def test_ivf_index_multiprobe_superset_recall(spark, tmp_path):
    from kafka_connect_hdfs_spark.operators.similarity import (
        build_ivf_index, query_ivf_index,
    )
    from kafka_connect_hdfs_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    path = f"{tmp_path}/idx"
    build_ivf_index(emb, path, n_seeds=8)
    one = query_ivf_index(spark, path, [0, 1, 2], k=3, n_probe=1)
    two = query_ivf_index(spark, path, [0, 1, 2], k=3, n_probe=2)
    # more probes → per-query best cosine can only improve or tie
    best1 = {r["query_id"]: r["cosine"] for r in one.filter(F.col("rank") == 1).collect()}
    best2 = {r["query_id"]: r["cosine"] for r in two.filter(F.col("rank") == 1).collect()}
    assert all(best2[q] >= best1[q] for q in best1)


def test_semantic_dedup_cell_cap_skips_oversize_cells(spark):
    from kafka_connect_hdfs_spark.operators.similarity import semantic_dedup

    rows = [(i, [1.0, 0.0]) for i in range(4)] + [(10, [0.0, 1.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    capped = semantic_dedup(emb, n_seeds=2, threshold=0.9, max_cell_size=3).collect()
    # the 4-member cell exceeds the cap: no pairs generated, all kept
    assert all(r["keep"] for r in capped)
    uncapped = semantic_dedup(emb, n_seeds=2, threshold=0.9).collect()
    assert sum(not r["keep"] for r in uncapped) == 3


# ---------------------------------------------------------------------------
# hard negatives / cell stats / label MRR


def test_hard_negatives_never_same_label(spark):
    from kafka_connect_hdfs_spark.operators.similarity import hard_negative_topk
    from kafka_connect_hdfs_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = hard_negative_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    rows = out.collect()
    assert rows and all(r["rank"] <= 3 for r in rows)
    for r in rows:
        assert r["neg_label"] != labels[r["query_id"]]
        assert labels[r["neighbor_id"]] == r["neg_label"]


def test_ivf_cell_stats_fracs_sum_to_one(spark):
    from kafka_connect_hdfs_spark.operators.similarity import ivf_cell_stats
    from kafka_connect_hdfs_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = ivf_cell_stats(emb, n_seeds=8).collect()
    assert sum(r["n_vectors"] for r in rows) == emb.count()
    assert abs(sum(r["frac"] for r in rows) - 1.0) < 1e-4
    assert all(0 <= r["cell"] < 8 for r in rows)


def test_label_mrr_rewards_matching_first_hit(spark):
    from kafka_connect_hdfs_spark.operators.similarity import label_mrr

    topk = spark.createDataFrame(
        [(0, 100, 1), (0, 101, 2), (1, 102, 1), (1, 103, 2)],
        "query_id long, neighbor_id long, rank long",
    )
    labels = spark.createDataFrame(
        # query 0 label a: first hit at rank 2; query 1 label b: no hit
        [(0, "a"), (1, "b"), (100, "x"), (101, "a"), (102, "c"), (103, "d")],
        "vec_id long, label string",
    )
    out = {r["query_id"]: r for r in label_mrr(topk, labels).collect()}
    assert out[0]["first_hit_rank"] == 2 and out[0]["reciprocal_rank"] == 0.5
    assert out[1]["first_hit_rank"] is None and out[1]["reciprocal_rank"] == 0.0


def test_pair_candidate_eval_counts(spark):
    from kafka_connect_hdfs_spark.operators.dedup import pair_candidate_eval

    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    truth = spark.createDataFrame([(1, 2), (4, 5), (6, 7)], "id_a long, id_b long")
    r = pair_candidate_eval(cand, truth).collect()[0]
    assert (r["n_truth"], r["n_candidates"], r["n_hits"]) == (3, 4, 2)
    assert r["recall"] == round(2 / 3, 6) and r["precision"] == 0.5


def test_pair_candidate_eval_empty_truth_null_recall(spark):
    from kafka_connect_hdfs_spark.operators.dedup import pair_candidate_eval

    cand = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    truth = spark.createDataFrame([], "id_a long, id_b long")
    r = pair_candidate_eval(cand, truth).collect()[0]
    assert r["n_hits"] == 0 and r["recall"] is None and r["precision"] == 0.0


def test_assemble_sessions_gap_cut_and_ordering(spark):
    from datetime import datetime

    from kafka_connect_hdfs_spark.operators.funnel import assemble_sessions

    T = lambda m, s=0: datetime(2024, 1, 1, 10, m, s)
    rows = [
        # user 1, session 1: three events inside 30-min gaps
        (1, T(0), 100, "open"),
        (1, T(10), 101, "click"),
        (1, T(20), 102, "buy"),
        # gap of 40 min → session 2
        (1, T(0).replace(hour=11), 103, "open"),
        # user 2: same-timestamp tie broken by event_id
        (2, T(0), 201, "b_event"),
        (2, T(0), 200, "a_event"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {
        (r["user_id"], r["session_id"]): r
        for r in assemble_sessions(df, gap_minutes=30).collect()
    }
    assert out[(1, 1)]["n_events"] == 3 and out[(1, 1)]["duration_sec"] == 1200
    assert out[(1, 2)]["n_events"] == 1 and out[(1, 2)]["duration_sec"] == 0
    import hashlib

    assert out[(1, 1)]["sequence_fp"] == hashlib.md5(b"open click buy").hexdigest()
    # tie at identical ts orders by event_id: 200 before 201
    assert out[(2, 1)]["sequence_fp"] == hashlib.md5(b"a_event b_event").hexdigest()


def test_pack_manifest_spans_ordered_and_complete(spark):
    from kafka_connect_hdfs_spark.operators.packing import (
        pack_manifest, with_sequence_packing,
    )

    rows = [(i, 100) for i in range(1, 11)]  # 10 docs x 100 tokens
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    assignment = with_sequence_packing(df, budget=250, shards=1)
    out = pack_manifest(assignment).collect()
    assert sum(r["n_docs"] for r in out) == 10
    assert sum(r["tokens_started"] for r in out) == 1000
    import hashlib

    a_rows = sorted(
        assignment.collect(), key=lambda r: (r["shard"], r["seq"], r["offset_in_seq"])
    )
    by_seq = {}
    for r in a_rows:
        by_seq.setdefault((r["shard"], r["seq"]), []).append(
            f"{r['doc_id']}:{r['offset_in_seq']}:{r['n_tokens']}"
        )
    for m in out:
        want = hashlib.md5(" ".join(by_seq[(m["shard"], m["seq"])]).encode()).hexdigest()
        assert m["spans_fp"] == want


def test_prefix_filtered_jaccard_equals_plain_operator(spark):
    from kafka_connect_hdfs_spark.operators.dedup import (
        ngram_jaccard_pairs, prefix_filtered_jaccard_pairs,
    )
    from kafka_connect_hdfs_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    for t in (0.1, 0.3, 0.6):
        plain = sorted(
            (r["id_a"], r["id_b"], r["n_common"], r["jaccard"])
            for r in ngram_jaccard_pairs(
                docs, n=3, threshold=t, max_shingle_freq=200
            ).collect()
        )
        pref = sorted(
            (r["id_a"], r["id_b"], r["n_common"], r["jaccard"])
            for r in prefix_filtered_jaccard_pairs(
                docs, n=3, threshold=t, max_shingle_freq=200
            ).collect()
        )
        assert pref == plain, f"threshold {t}"
        if t == 0.1:
            assert plain  # the loosest threshold must be a non-trivial check


def test_prefix_filtering_prunes_candidate_space(spark):
    """The point of the technique: the prefix index generates strictly
    fewer candidate pairs than the full inverted index on a corpus with
    shared boilerplate, while (above) missing nothing."""
    import pyspark.sql.functions as F

    from kafka_connect_hdfs_spark.operators.dedup import with_shingles
    from kafka_connect_hdfs_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    sh = with_shingles(docs, 3)
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df_"))
    sh_f = sh.join(freq.filter(F.col("df_") <= 200), "shingle")
    full_cand = (
        sh_f.select(F.col("doc_id").alias("a"), "shingle")
        .join(sh_f.select(F.col("doc_id").alias("b"), "shingle"), "shingle")
        .filter(F.col("a") < F.col("b")).select("a", "b").distinct().count()
    )
    sizes = sh_f.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    ordered = sh_f.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("df_", "shingle"))).alias("o")
    ).join(sizes, "doc_id")
    plen = F.floor(F.lit(1.0 - 0.6) * F.col("set_size")).cast("int") + 1
    prefix = ordered.select(
        "doc_id",
        F.explode(F.transform(F.slice("o", 1, plen), lambda s: s["shingle"])).alias("shingle"),
    )
    pref_cand = (
        prefix.select(F.col("doc_id").alias("a"), "shingle")
        .join(prefix.select(F.col("doc_id").alias("b"), "shingle"), "shingle")
        .filter(F.col("a") < F.col("b")).select("a", "b").distinct().count()
    )
    assert pref_cand < full_cand


def test_ivf_index_append_matches_full_build(spark, tmp_path):
    """Build on half the corpus, append the other half: serving must equal
    the index built on everything at once (same persisted seeds == same
    quantizer, so assignments are identical)."""
    from kafka_connect_hdfs_spark.operators.similarity import (
        append_to_ivf_index, build_ivf_index, query_ivf_index,
    )
    from kafka_connect_hdfs_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    full_path = f"{tmp_path}/full"
    build_ivf_index(emb, full_path, n_seeds=8)

    inc_path = f"{tmp_path}/inc"
    # the initial build must contain the seed ids (vec_id < 8) so both
    # indexes train the SAME coarse quantizer
    build_ivf_index(emb.filter(F.col("vec_id") < 250), inc_path, n_seeds=8)
    append_to_ivf_index(spark, emb.filter(F.col("vec_id") >= 250), inc_path)

    key = lambda df: sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
        for r in df.collect()
    )
    got = key(query_ivf_index(spark, inc_path, list(range(10)), k=5))
    want = key(query_ivf_index(spark, full_path, list(range(10)), k=5))
    assert got == want


def test_embed_text_deterministic_and_dup_sensitive(spark):
    from kafka_connect_hdfs_spark.operators.text import embed_text
    from kafka_connect_hdfs_spark.operators.similarity import cosine_similarity

    rows = [
        (1, "the quick brown fox jumps"),
        (2, "the quick brown fox jumps"),       # exact dup
        (3, "THE  quick   brown fox JUMPS "),   # case/space variant
        (4, "entirely different words appear here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["embedding"] for r in embed_text(df, dim=8).collect()}
    assert out[1] == out[2] == out[3]  # normalization + determinism
    assert out[1] != out[4]
    assert all(-1.0 <= x < 1.0 for x in out[4])
    with pytest.raises(ValueError):
        embed_text(df, dim=11)
    # empty docs are dropped
    empty = spark.createDataFrame([(9, "  ")], "doc_id long, text string")
    assert embed_text(empty).count() == 0


def test_bm25_ranks_term_dense_docs_first(spark):
    from kafka_connect_hdfs_spark.operators.text import bm25_search

    rows = [
        (1, "spark spark spark query engine"),
        (2, "spark appears once in this considerably longer document text here"),
        (3, "no relevant words at all"),
        (4, "spark query"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_search(df, ["spark", "query"], k=10).collect()
    got = [r["doc_id"] for r in out]
    assert 3 not in got                       # no match → absent
    assert set(got) == {1, 2, 4}
    matched = {r["doc_id"]: r["n_matched_terms"] for r in out}
    assert matched[1] == 2 and matched[2] == 1 and matched[4] == 2
    # both-term short doc beats one-term long doc
    assert got.index(4) < got.index(2)


def test_bm25_rare_term_outweighs_common(spark):
    from kafka_connect_hdfs_spark.operators.text import bm25_search

    # 'rare' in 1 doc, 'common' in all 5 docs of equal length
    rows = [(i, ("rare pad" if i == 0 else "common pad") + " filler words x") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["bm25"] for r in bm25_search(df, ["rare", "common"], k=5).collect()}
    assert out[0] > max(v for k, v in out.items() if k != 0)


def test_hybrid_search_fuses_both_arms(spark):
    from kafka_connect_hdfs_spark.operators.text import hybrid_search
    from kafka_connect_hdfs_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = hybrid_search(docs, "spark table merge window", k=10, pool=20).collect()
    assert len(out) == 10
    # fused score equals the RRF of the exposed ranks
    for r in out:
        want = 0.0
        if r["rank_lex"] is not None:
            want += 1.0 / (60 + r["rank_lex"])
        if r["rank_sem"] is not None:
            want += 1.0 / (60 + r["rank_sem"])
        assert abs(r["rrf_score"] - round(want, 6)) < 1e-9
    # a doc ranked by BOTH arms must outscore one ranked by a single arm
    # at similar rank depth (1/(60+r) + 1/(60+r') > 1/(60+r))
    both = [r for r in out if r["rank_lex"] and r["rank_sem"]]
    if both:
        single = [r for r in out if (r["rank_lex"] is None) != (r["rank_sem"] is None)]
        for s in single:
            arm = s["rank_lex"] or s["rank_sem"]
            for m in both:
                if (m["rank_lex"] or 99) <= arm and (m["rank_sem"] or 99) <= arm:
                    assert m["rrf_score"] > s["rrf_score"]


def test_vocab_drift_flags_shifted_terms(spark):
    from kafka_connect_hdfs_spark.operators.text import vocab_drift

    a = spark.createDataFrame(
        [(i, "common words here plus newterm") for i in range(10)],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(i, "common words here") for i in range(10)], "doc_id long, text string"
    )
    rows = vocab_drift(a, b, top_k=10).collect()
    by_term = {r["term"]: r for r in rows}
    # the A-only term is the top |contribution| driver, positive (over-represented in A)
    assert rows[0]["term"] == "newterm" and rows[0]["kl_contrib"] > 0
    assert by_term["newterm"]["n_b"] == 0
    # shared terms have near-zero but defined contributions
    assert all(abs(by_term[t]["kl_contrib"]) < rows[0]["kl_contrib"]
               for t in ("common", "words", "here"))


def test_contrastive_triplets_labels_and_fanout(spark):
    from kafka_connect_hdfs_spark.operators.similarity import contrastive_triplets
    from kafka_connect_hdfs_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = contrastive_triplets(emb, emb.filter(F.col("vec_id") < 5), n_pos=1, n_neg=3)
    rows = out.collect()
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
        assert labels[r["positive_id"]] == labels[r["query_id"]]
        assert labels[r["negative_id"]] != labels[r["query_id"]]
    assert all(len(v) == 3 for v in per_q.values())  # 1 pos x 3 neg
