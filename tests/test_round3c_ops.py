"""Round-3 batch C operators: corpus graph construction + PageRank, BPE
pair counting, margin-based bitext mining, curriculum ordering, event
transition matrices, embedding covariance/PCA."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# pagerank


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "src_a string, src_b string, n_shared long"
    )


def test_pagerank_uniform_on_symmetric_complete_graph(spark):
    from kafka_connect_hdfs_spark.operators.graph import pagerank

    e = _edges(
        spark, [("a", "b", 1), ("a", "c", 1), ("b", "c", 1)]
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(e).collect()}
    assert ranks == pytest.approx({"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}, abs=1e-6)


def test_pagerank_sums_to_one_and_favors_hub(spark):
    from kafka_connect_hdfs_spark.operators.graph import pagerank

    # star: hub h connected to 4 spokes — hub must out-rank every spoke
    e = _edges(spark, [("h", f"s{i}", 1) for i in range(4)])
    rows = pagerank(e, iterations=5).collect()
    ranks = {r["node"]: r["rank"] for r in rows}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-5)
    assert all(ranks["h"] > ranks[f"s{i}"] for i in range(4))
    # spokes are symmetric
    assert len({ranks[f"s{i}"] for i in range(4)}) == 1


def test_pagerank_weights_shift_rank(spark):
    from kafka_connect_hdfs_spark.operators.graph import pagerank

    # path a-b-c with a heavy a-b edge: b routes 90% of its mass to a, so
    # the heavy-edge neighbor a must out-rank the light-edge neighbor c
    e = _edges(spark, [("a", "b", 9), ("b", "c", 1)])
    ranks = {r["node"]: r["rank"] for r in pagerank(e, iterations=4).collect()}
    assert ranks["a"] > ranks["c"]
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-5)


def test_pagerank_directed_respects_orientation(spark):
    from kafka_connect_hdfs_spark.operators.graph import pagerank

    # directed 3-cycle: perfectly symmetric under rotation → uniform ranks
    e = _edges(spark, [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)])
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(e, iterations=7, directed=True).collect()
    }
    assert ranks == pytest.approx({"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}, abs=1e-6)


# ---------------------------------------------------------------------------
# shingle_share_edges


def test_shingle_share_edges_counts_distinct_shared_shingles(spark):
    from kafka_connect_hdfs_spark.operators.graph import shingle_share_edges

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox", "s1"),
            (1, "the quick brown cat", "s2"),
            (2, "entirely different words here", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    edges = {
        (r["src_a"], r["src_b"]): r["n_shared"]
        for r in shingle_share_edges(docs, n=3).collect()
    }
    # s1/s2 share exactly the shingle "the quick brown"; s3 shares nothing
    assert edges == {("s1", "s2"): 1}


def test_shingle_share_edges_stop_shingle_cap(spark):
    from kafka_connect_hdfs_spark.operators.graph import shingle_share_edges

    # one shingle present in ALL 3 sources + one shared by only two:
    # cap=2 drops the ubiquitous shingle, keeping only the rare edge
    docs = spark.createDataFrame(
        [
            (0, "common shingle here rare pair one", "s1"),
            (1, "common shingle here rare pair one", "s2"),
            (2, "common shingle here", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    edges = {
        (r["src_a"], r["src_b"]): r["n_shared"]
        for r in shingle_share_edges(docs, n=3, max_groups_per_shingle=2).collect()
    }
    assert ("s1", "s3") not in edges and ("s2", "s3") not in edges
    assert edges[("s1", "s2")] >= 1


def test_covisit_edges_same_bucket_only_and_cap(spark):
    from kafka_connect_hdfs_spark.operators.graph import covisit_edges

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:05:00", 1, "click"),
            (2, "2024-01-01 10:55:00", 2, "click"),   # same hour as user 1
            (3, "2024-01-01 11:05:00", 3, "click"),   # next hour — no pair
            (4, "2024-01-01 10:10:00", 1, "view"),    # different item
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    edges = {
        (r["user_a"], r["user_b"]): r["n_covisits"]
        for r in covisit_edges(ev).collect()
    }
    assert edges == {(1, 2): 1}
    # cap=1: every cell with 2+ users dropped → no edges at all
    assert covisit_edges(ev, max_users_per_bucket=1).count() == 0


# ---------------------------------------------------------------------------
# bpe_pair_counts


def test_bpe_pair_counts_known_counts(spark):
    from kafka_connect_hdfs_spark.operators.text import bpe_pair_counts

    docs = spark.createDataFrame(
        [(0, "aaab ab"), (1, "AB x")],  # 'x' is length-1 → no pairs; case-folded
        "doc_id long, text string",
    )
    got = {
        r["pair"]: r["n_occurrences"]
        for r in bpe_pair_counts(docs, top_k=10).collect()
    }
    # "aaab" → aa, aa, ab; "ab" → ab; "AB"→"ab" → ab
    assert got == {"aa": 2, "ab": 3}


def test_bpe_pair_counts_topk_orders_by_count_then_pair(spark):
    from kafka_connect_hdfs_spark.operators.text import bpe_pair_counts

    docs = spark.createDataFrame(
        [(0, "zz aa zz")], "doc_id long, text string"
    )
    rows = bpe_pair_counts(docs, top_k=1).collect()
    assert [(r["pair"], r["n_occurrences"]) for r in rows] == [("zz", 2)]


# ---------------------------------------------------------------------------
# curriculum_order


def test_curriculum_buckets_are_quality_ordered(spark):
    from kafka_connect_hdfs_spark.operators.packing import curriculum_order

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and it is fine"),   # clean English
            (1, "!!! ??? ;;; ::: ,,,"),                      # punctuation soup
            (2, "the dog ran to the park and it is good"),
            (3, "@@@@ #### %%%% &&&&"),
        ],
        "doc_id long, text string",
    )
    rows = curriculum_order(docs, buckets=2).collect()
    by_id = {r["doc_id"]: r for r in rows}
    # clean docs land in bucket 1 (trained first), junk in bucket 2
    assert by_id[0]["bucket"] == 1 and by_id[2]["bucket"] == 1
    assert by_id[1]["bucket"] == 2 and by_id[3]["bucket"] == 2
    # output is sorted by (bucket, shuffle_key, id)
    keys = [(r["bucket"], r["shuffle_key"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)


def test_curriculum_threshold_banding_matches_exact_cuts(spark):
    from kafka_connect_hdfs_spark.operators.packing import curriculum_order

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and it is fine"),
            (1, "!!! ??? ;;; ::: ,,,"),
            (2, "the dog ran to the park and it is good"),
            (3, "@@@@ #### %%%% &&&&"),
        ],
        "doc_id long, text string",
    )
    exact = {
        r["doc_id"]: r["bucket"] for r in curriculum_order(docs, buckets=2).collect()
    }
    # a threshold between the two score clusters reproduces the exact tiers
    banded = {
        r["doc_id"]: r["bucket"]
        for r in curriculum_order(docs, thresholds=[0.6]).collect()
    }
    assert banded == exact


# ---------------------------------------------------------------------------
# event_transitions


def test_event_transitions_probabilities(spark):
    from kafka_connect_hdfs_spark.operators.funnel import event_transitions

    ev = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 10:00:00", "a"),
            (2, 1, "2024-01-01 10:01:00", "b"),
            (3, 1, "2024-01-01 10:02:00", "a"),
            (4, 1, "2024-01-01 10:03:00", "c"),
            (5, 2, "2024-01-01 10:00:00", "a"),
            (6, 2, "2024-01-01 10:01:00", "b"),
        ],
        "event_id long, user_id long, ts string, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r["prev_type"], r["next_type"]): (r["n_transitions"], r["p"])
        for r in event_transitions(ev).collect()
    }
    # a→b twice, b→a once, a→c once: P(b|a)=2/3? no — a appears as prev 3x:
    # user1: a→b, b→a, a→c; user2: a→b. prev=a: {b:2, c:1}; prev=b: {a:1}
    assert got[("a", "b")] == (2, pytest.approx(2 / 3, abs=1e-6))
    assert got[("a", "c")] == (1, pytest.approx(1 / 3, abs=1e-6))
    assert got[("b", "a")] == (1, 1.0)
    # no cross-user transition (user2's 'b' ends the sequence)
    assert ("b", "b") not in got and len(got) == 3


# ---------------------------------------------------------------------------
# bitext_mine


def test_bitext_mine_finds_translation_pairs(spark):
    from kafka_connect_hdfs_spark.operators.similarity import bitext_mine

    # two clean "translation" pairs + one distractor per side
    a = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.1, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.1]),
            (2, [0.5, 0.5, 0.5, 0.5]),
        ],
        "vec_id long, embedding array<float>",
    )
    b = spark.createDataFrame(
        [
            (10, [1.0, 0.05, 0.1, 0.0]),
            (11, [0.05, 1.0, 0.0, 0.1]),
            (12, [-0.5, -0.5, 0.5, 0.5]),
        ],
        "vec_id long, embedding array<float>",
    )
    pairs = {
        (r["a_id"], r["b_id"]): r["margin"]
        for r in bitext_mine(a, b, knn=2, margin_threshold=1.0).collect()
    }
    assert (0, 10) in pairs and (1, 11) in pairs
    assert all(m >= 1.0 for m in pairs.values())
    # mutual-best: at most one pair per side
    a_ids = [k[0] for k in pairs]
    b_ids = [k[1] for k in pairs]
    assert len(a_ids) == len(set(a_ids)) and len(b_ids) == len(set(b_ids))


def test_bitext_mine_candidates_restricts_pair_space(spark):
    from kafka_connect_hdfs_spark.operators.similarity import bitext_mine

    a = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    b = spark.createDataFrame(
        [(10, [1.0, 0.1]), (11, [0.1, 1.0])],
        "vec_id long, embedding array<float>",
    )
    cand = spark.createDataFrame(
        [(0, 10)], "a_id long, b_id long"
    )
    got = bitext_mine(a, b, knn=1, candidates=cand).collect()
    assert [(r["a_id"], r["b_id"]) for r in got] == [(0, 10)]


# ---------------------------------------------------------------------------
# embedding covariance / PCA


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np

    from kafka_connect_hdfs_spark.operators.similarity import (
        embedding_covariance,
    )

    rng = np.random.RandomState(7)
    X = rng.randn(40, 3).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["i"], r["j"]): r["cov"] for r in embedding_covariance(emb).collect()
    }
    C = np.cov(X.astype("float64").T, bias=True)
    for i in range(3):
        for j in range(i, 3):
            assert got[(i, j)] == pytest.approx(C[i, j], abs=1e-5)


def test_pca_top_component_matches_numpy_eig(spark):
    import numpy as np

    from kafka_connect_hdfs_spark.operators.similarity import pca_top_component

    rng = np.random.RandomState(11)
    # strongly anisotropic: dim 0 dominates
    X = rng.randn(60, 3) * np.array([5.0, 1.0, 0.2])
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    comp, eig = pca_top_component(emb, iterations=30)
    C = np.cov(X.T, bias=True)
    w, v = np.linalg.eigh(C)
    top = v[:, -1] if v[0, -1] >= 0 else -v[:, -1]
    assert eig == pytest.approx(float(w[-1]), rel=1e-3)
    assert np.allclose(comp, top, atol=1e-2)


# ---------------------------------------------------------------------------
# bpe_learn


def test_bpe_learn_toy_corpus_merge_order(spark):
    from kafka_connect_hdfs_spark.operators.text import bpe_learn

    # classic toy: {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    docs = spark.createDataFrame(
        [(0, " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3))],
        "doc_id long, text string",
    )
    merges = bpe_learn(docs, n_merges=4)
    # first merges: ("e","s") 9, then ("es","t") 9, then ("est" joins) —
    # ("l","o") has 7; exact Sennrich example ordering
    assert merges[0] == ("e", "s", 9)
    assert merges[1] == ("es", "t", 9)
    assert merges[2][2] >= merges[3][2] or merges[2][:2] < merges[3][:2]


def test_bpe_learn_first_merge_matches_pair_counts(spark):
    from kafka_connect_hdfs_spark.operators.text import (
        bpe_learn, bpe_pair_counts,
    )

    docs = spark.createDataFrame(
        [(0, "banana bandana"), (1, "cabana banana")],
        "doc_id long, text string",
    )
    top = bpe_pair_counts(docs, top_k=1).collect()[0]
    first = bpe_learn(docs, n_merges=1)[0]
    assert (first[0] + first[1], first[2]) == (top["pair"], top["n_occurrences"])


def test_bpe_learn_merges_apply_nonoverlapping(spark):
    from kafka_connect_hdfs_spark.operators.text import bpe_learn

    # "aaaa" x3: round 1 pair ("a","a") count = 9 (3 positions x 3);
    # after merge words become (aa, aa): round 2 ("aa","aa") count 3
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aaaa")], "doc_id long, text string"
    )
    merges = bpe_learn(docs, n_merges=2)
    assert merges[0] == ("a", "a", 9)
    assert merges[1] == ("aa", "aa", 3)


# ---------------------------------------------------------------------------
# mmr_rerank


def test_mmr_lambda_one_equals_relevance_order(spark):
    from kafka_connect_hdfs_spark.operators.similarity import (
        brute_force_topk, mmr_rerank,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 7 + 1), float((3 * i) % 5 + 1), 1.0]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    q = emb.filter("vec_id = 0")
    plain = brute_force_topk(emb, q, k=4).orderBy("rank").collect()
    mmr = mmr_rerank(emb, q, k=4, pool=10, lam=1.0).orderBy("mmr_rank").collect()
    assert [r["neighbor_id"] for r in mmr] == [r["neighbor_id"] for r in plain]
    for r in mmr:
        assert r["mmr_score"] == pytest.approx(r["relevance"], abs=1e-6)


def test_mmr_demotes_near_duplicate(spark):
    from kafka_connect_hdfs_spark.operators.similarity import mmr_rerank

    # q = e1; a and b near-identical high-relevance, c orthogonal-ish lower
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),          # the query itself
            (1, [0.99, 0.14, 0.0]),        # a: top relevance
            (2, [0.99, 0.141, 0.0]),       # b: near-dup of a
            (3, [0.7, 0.0, 0.71]),         # c: diverse, lower relevance
        ],
        "vec_id long, embedding array<float>",
    )
    q = emb.filter("vec_id = 0")
    picks = [
        r["neighbor_id"]
        for r in mmr_rerank(emb, q, k=3, pool=3, lam=0.5)
        .orderBy("mmr_rank")
        .collect()
    ]
    # relevance order would be [1, 2, 3]; MMR must pick the diverse c second
    assert picks[0] == 1 and picks[1] == 3 and picks[2] == 2


# ---------------------------------------------------------------------------
# pca_project


def test_pca_project_matches_manual_dot(spark):
    from kafka_connect_hdfs_spark.operators.similarity import pca_project

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [0.0, -1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    comps = [[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]]
    got = {
        r["vec_id"]: r["projected"]
        for r in pca_project(emb, comps).collect()
    }
    assert got[0] == pytest.approx([1.0, 5.0])
    assert got[1] == pytest.approx([0.0, 0.0])
    # centering subtracts the mean before projecting
    cent = {
        r["vec_id"]: r["projected"]
        for r in pca_project(emb, comps, means=[0.5, 0.5, 2.0]).collect()
    }
    assert cent[0] == pytest.approx([0.5, 2.5])


def test_pca_project_variance_matches_eigenvalue(spark):
    import numpy as np

    from kafka_connect_hdfs_spark.operators.similarity import (
        pca_project, pca_top_component,
    )

    rng = np.random.RandomState(3)
    X = rng.randn(80, 4) * np.array([4.0, 1.0, 0.5, 0.1])
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(80)],
        "vec_id long, embedding array<float>",
    )
    comp, eig = pca_top_component(emb, iterations=40)
    mean = [round(float(m), 6) for m in X.mean(axis=0)]
    proj = pca_project(emb, [comp], means=mean)
    vals = np.array([r["projected"][0] for r in proj.collect()])
    assert vals.var() == pytest.approx(eig, rel=5e-2)


# ---------------------------------------------------------------------------
# hll_set_overlap


def test_hll_set_overlap_exact_counts_and_gates(spark):
    from kafka_connect_hdfs_spark.operators.sketches import hll_set_overlap

    a = spark.createDataFrame([(i,) for i in range(100)], "uid long")
    b = spark.createDataFrame([(i,) for i in range(60, 160)], "uid long")
    row = hll_set_overlap(a, b, "uid").collect()[0]
    assert (row["n_a"], row["n_b"], row["n_union"], row["n_intersect"]) == (
        100, 100, 160, 40,
    )
    assert row["union_est_ok"] and row["intersect_est_ok"]


def test_hll_set_overlap_disjoint(spark):
    from kafka_connect_hdfs_spark.operators.sketches import hll_set_overlap

    a = spark.createDataFrame([(i,) for i in range(50)], "uid long")
    b = spark.createDataFrame([(i,) for i in range(1000, 1050)], "uid long")
    row = hll_set_overlap(a, b, "uid").collect()[0]
    assert row["n_intersect"] == 0 and row["n_union"] == 100
    assert row["union_est_ok"] and row["intersect_est_ok"]


# ---------------------------------------------------------------------------
# gopher_rules


def test_gopher_rules_reasons_fire_in_order(spark):
    from kafka_connect_hdfs_spark.operators.text import gopher_rules

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),  # keep
            (1, "hi"),                                   # too_few_tokens
            (2, "a b c d e f g h i j"),                  # short_words (len 1)
            (3, "extraordinarily incomprehensible bureaucratically "
                "internationalization antidisestablishmentarian "
                "overcapitalization discombobulated hippopotomonstrous "
                "floccinaucinihilipilification pseudopseudohypopara"),  # long_words
            (4, "one ### two ### three ### four ### five ### six ### "
                "seven ### eight ### nine ### ten ###"),  # symbol_heavy
            (5, "111 222 333 444 555 666 777 888 999 000"),  # non_alpha_words
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in gopher_rules(
            docs, min_tokens=5, min_word_len=2.0, max_word_len=12.0
        ).collect()
    }
    assert out[0]["keep"] and out[0]["drop_reason"] is None
    assert out[1]["drop_reason"] == "too_few_tokens"
    assert out[2]["drop_reason"] == "short_words"
    assert out[3]["drop_reason"] == "long_words"
    assert out[4]["drop_reason"] == "symbol_heavy"
    assert out[5]["drop_reason"] == "non_alpha_words"
    # first-failing-rule order: doc 4 also fails non_alpha partially but
    # symbol_heavy is checked first
    assert not out[4]["keep"]


def test_gopher_rules_empty_text(spark):
    from kafka_connect_hdfs_spark.operators.text import gopher_rules

    docs = spark.createDataFrame([(0, "")], "doc_id long, text string")
    row = gopher_rules(docs).collect()[0]
    assert row["n_tokens"] == 0 and row["drop_reason"] == "too_few_tokens"


# ---------------------------------------------------------------------------
# connected_components_star (large-star/small-star)


def _cc_pairs(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_star_cc_matches_label_propagation_random(spark):
    import random

    from kafka_connect_hdfs_spark.operators.dedup import duplicate_clusters
    from kafka_connect_hdfs_spark.operators.graph import (
        connected_components_star,
    )

    rng = random.Random(42)
    pairs = list(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(60), rng.randrange(60)) for _ in range(80)
            )
            if a != b
        }
    )
    df = _cc_pairs(spark, pairs)
    star = {
        r["node"]: r["cluster_id"]
        for r in connected_components_star(df).collect()
    }
    prop = {
        r["node"]: r["cluster_id"] for r in duplicate_clusters(df).collect()
    }
    assert star == prop


def test_star_cc_long_chain_converges_in_log_rounds(spark):
    from kafka_connect_hdfs_spark.operators.graph import (
        connected_components_star,
    )

    # a 64-node chain: label propagation needs ~64 rounds; star contraction
    # must finish inside max_rounds=8 (O(log n))
    chain = [(i, i + 1) for i in range(63)]
    labels = {
        r["node"]: r["cluster_id"]
        for r in connected_components_star(
            _cc_pairs(spark, chain), max_rounds=8
        ).collect()
    }
    assert set(labels) == set(range(64))
    assert set(labels.values()) == {0}


def test_star_cc_multiple_components_and_singleton_pair(spark):
    from kafka_connect_hdfs_spark.operators.graph import (
        connected_components_star,
    )

    pairs = [(10, 11), (11, 12), (30, 31), (50, 51), (51, 52), (52, 50)]
    labels = {
        r["node"]: r["cluster_id"]
        for r in connected_components_star(_cc_pairs(spark, pairs)).collect()
    }
    assert labels == {
        10: 10, 11: 10, 12: 10, 30: 30, 31: 30, 50: 50, 51: 50, 52: 50,
    }


# ---------------------------------------------------------------------------
# triangle_count / group_jaccard_edges


def test_triangle_count_known_graphs(spark):
    from kafka_connect_hdfs_spark.operators.graph import triangle_count

    def count(pairs):
        df = spark.createDataFrame(pairs, "id_a long, id_b long")
        return triangle_count(df).collect()[0]["n_triangles"]

    # K4: C(4,3) = 4 triangles
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert count(k4) == 4
    # star graph: no triangles
    assert count([(0, i) for i in range(1, 6)]) == 0
    # one triangle + pendant edge; duplicate/reversed edges must not double
    assert count([(1, 2), (2, 3), (3, 1), (1, 3), (3, 4)]) == 1


def test_group_jaccard_edges_values(spark):
    from kafka_connect_hdfs_spark.operators.graph import group_jaccard_edges

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta", "s1"),   # shingles: {abg, bgd}
            (1, "alpha beta gamma other", "s2"),   # shingles: {abg, bgo}
            (2, "unrelated text entirely here", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    edges = {
        (r["src_a"], r["src_b"]): (r["n_shared"], r["jaccard"])
        for r in group_jaccard_edges(docs, n=3).collect()
    }
    # s1∩s2 = {"alpha beta gamma"}; union = 3 shingles → jaccard 1/3
    assert edges == {("s1", "s2"): (1, pytest.approx(1 / 3, abs=1e-6))}


def test_mmr_accepts_ann_shortlist(spark):
    from kafka_connect_hdfs_spark.operators.similarity import (
        brute_force_topk, mmr_rerank,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 5 + 1), float((2 * i) % 7 + 1)]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    q = emb.filter("vec_id = 0")
    shortlist = brute_force_topk(emb, q, k=8)
    via_candidates = mmr_rerank(
        emb, q, k=3, lam=0.6, candidates=shortlist
    ).orderBy("mmr_rank").collect()
    direct = mmr_rerank(emb, q, k=3, pool=8, lam=0.6).orderBy(
        "mmr_rank"
    ).collect()
    assert [r["neighbor_id"] for r in via_candidates] == [
        r["neighbor_id"] for r in direct
    ]


# ---------------------------------------------------------------------------
# ngram_novelty / embedding_outlier_scores / containment_pairs


def test_ngram_novelty_unique_vs_shared(spark):
    from kafka_connect_hdfs_spark.operators.text import ngram_novelty

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),   # shares "alpha beta gamma" w/ 1
            (1, "alpha beta gamma other"),
            (2, "wholly unique trigram content here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs, n=3).collect()}
    # doc 2: all 3 shingles unique → novelty 1.0
    assert out[2]["novelty"] == 1.0
    # docs 0/1: one shared shingle of two each → novelty 0.5
    assert out[0]["novelty"] == 0.5 and out[1]["novelty"] == 0.5


def test_embedding_outlier_scores_flags_far_vector(spark):
    from kafka_connect_hdfs_spark.operators.similarity import (
        embedding_outlier_scores,
    )

    rows = [(i, [1.0 + 0.01 * i, 1.0]) for i in range(20)]
    rows.append((99, [50.0, -40.0]))  # the corrupt embedding
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sorted(
        embedding_outlier_scores(emb).collect(),
        key=lambda r: -r["z"],
    )
    assert out[0]["vec_id"] == 99 and out[0]["z"] > 3.0
    assert all(abs(r["z"]) < 1.5 for r in out[1:])


def test_containment_catches_wrapper_jaccard_misses(spark):
    from kafka_connect_hdfs_spark.operators.dedup import (
        containment_pairs, ngram_jaccard_pairs,
    )

    small = "the quick brown fox jumps over the lazy dog again"
    filler = " ".join(f"filler{i} pad{i} extra{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(0, small), (1, f"header {small} {filler}")],
        "doc_id long, text string",
    )
    cont = containment_pairs(docs, n=3, threshold=0.9).collect()
    assert len(cont) == 1
    row = cont[0]
    # the small doc is (almost) fully contained; the wrapper is diluted
    assert row["containment_a"] >= 0.9 and row["containment_b"] < 0.5
    # symmetric Jaccard at the same bar finds nothing — the point
    assert ngram_jaccard_pairs(docs, n=3, threshold=0.9).count() == 0


def test_pagerank_directed_sink_gets_rank_and_mass_conserved(spark):
    from kafka_connect_hdfs_spark.operators.graph import pagerank

    # a→b: b is a pure sink — it must appear in the output, receive more
    # rank than a, and total mass must stay 1 (dangling redistribution)
    e = _edges(spark, [("a", "b", 1)])
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(e, iterations=6, directed=True).collect()
    }
    assert set(ranks) == {"a", "b"}
    assert ranks["b"] > ranks["a"]
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-5)


def test_temperature_sample_all_empty_language_survives(spark):
    from kafka_connect_hdfs_spark.operators.packing import temperature_sample

    docs = spark.createDataFrame(
        [(0, "en", 10), (1, "xx", 0), (2, "en", 5)],
        "doc_id long, lang string, n_tokens long",
    )
    kept = temperature_sample(docs, budget_tokens=100).collect()
    # zero-token language contributes nothing and crashes nothing
    assert all(r["lang"] == "en" for r in kept)
    # all languages empty → empty result, no division by zero
    empty = docs.withColumn("n_tokens", docs.n_tokens * 0)
    assert temperature_sample(empty, budget_tokens=100).count() == 0


def test_chunk_with_overlap_preserve_case(spark):
    from kafka_connect_hdfs_spark.operators.packing import chunk_with_overlap

    docs = spark.createDataFrame(
        [(0, "The CEO of IBM said Hello")], "doc_id long, text string"
    )
    lower = chunk_with_overlap(docs, window=3, stride=3).collect()
    keep = chunk_with_overlap(
        docs, window=3, stride=3, lowercase=False
    ).collect()
    assert lower[0]["chunk_text"] == "the ceo of"
    assert keep[0]["chunk_text"] == "The CEO of"
    assert [r["n_chunk_tokens"] for r in lower] == [
        r["n_chunk_tokens"] for r in keep
    ]


def test_hybrid_search_empty_query_returns_empty(spark):
    from kafka_connect_hdfs_spark.operators.text import hybrid_search

    docs = spark.createDataFrame(
        [(0, "some document text")], "doc_id long, text string"
    )
    assert hybrid_search(docs, "   ").count() == 0


def test_empty_embedding_inputs_do_not_crash(spark):
    from kafka_connect_hdfs_spark.operators.similarity import (
        embedding_outlier_scores, pca_top_component,
    )

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert embedding_outlier_scores(emb).count() == 0
    comp, eig = pca_top_component(emb)
    assert comp == [] and eig == 0.0


def test_corpus_datacard_metrics_consistent(spark):
    from kafka_connect_hdfs_spark.operators.quality import corpus_datacard

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and it is fine today really", "en", "s1"),
            (1, "the cat sat on the mat and it is fine today really", "en", "s2"),
            (2, "short", "de", "s1"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    card = {r["metric"]: r["value"] for r in corpus_datacard(docs).collect()}
    assert card["n_docs"] == 3.0
    assert card["n_sources"] == 2.0 and card["n_langs"] == 2.0
    # docs 0/1 are exact duplicates → 2 distinct fingerprints of 3 docs
    assert card["exact_dup_rate"] == pytest.approx(1 / 3, abs=1e-6)
    assert card["total_ws_tokens"] == 25.0  # 12 + 12 + 1
    assert 0.0 <= card["gopher_keep_rate"] <= 1.0
    assert 0.0 < card["avg_quality"] <= 1.0


def test_duplicate_clusters_star_method_same_contract(spark):
    from kafka_connect_hdfs_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    prop = {
        r["node"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()
    }
    star = {
        r["node"]: r["cluster_id"]
        for r in duplicate_clusters(pairs, method="star").collect()
    }
    assert prop == star == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


# ---------------------------------------------------------------------------
# bm25_batch / kwic_snippets


def test_bm25_batch_matches_single_query(spark):
    from kafka_connect_hdfs_spark.operators.text import bm25_batch, bm25_search

    docs = spark.createDataFrame(
        [
            (0, "spark writes parquet tables to storage"),
            (1, "the quick brown fox"),
            (2, "spark reads avro and parquet"),
            (3, "storage costs and table compaction"),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [(7, "spark parquet"), (8, "storage table")],
        "query_id long, query_text string",
    )
    batch = bm25_batch(docs, qs, k=3).collect()
    for qid, qtext in ((7, "spark parquet"), (8, "storage table")):
        single = bm25_search(docs, qtext.split(), k=3).collect()
        got = sorted(
            ((r["doc_id"], r["bm25"]) for r in batch if r["query_id"] == qid),
        )
        want = sorted((r["doc_id"], r["bm25"]) for r in single)
        assert got == want, qid


def test_kwic_snippets_window_and_positions(spark):
    from kafka_connect_hdfs_spark.operators.text import kwic_snippets

    docs = spark.createDataFrame(
        [(0, "alpha data beta gamma data")], "doc_id long, text string"
    )
    rows = kwic_snippets(docs, "DATA", window=1).orderBy("position").collect()
    assert [(r["position"], r["snippet"]) for r in rows] == [
        (2, "alpha data beta"),
        (5, "gamma data"),   # window clipped at the document end
    ]


# ---------------------------------------------------------------------------
# label_ndcg / split_leakage / hourly anomalies


def test_label_ndcg_perfect_and_zero(spark):
    from kafka_connect_hdfs_spark.operators.similarity import label_ndcg

    labels = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "a"), (3, "b"), (4, "b")],
        "vec_id long, label string",
    )
    # query 0: both hits at the top → ndcg 1; query 3: no hit → 0
    topk = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 4, 3), (3, 1, 1), (3, 2, 2)],
        "query_id long, neighbor_id long, rank int",
    )
    out = {r["query_id"]: r for r in label_ndcg(topk, labels, k=3).collect()}
    assert out[0]["n_hits"] == 2 and out[0]["ndcg"] == 1.0
    assert out[3]["n_hits"] == 0 and out[3]["ndcg"] == 0.0
    # hit at rank 2 instead of rank 1 → dcg = 1/log2(3) < idcg = 1
    topk2 = spark.createDataFrame(
        [(0, 3, 1), (0, 1, 2)], "query_id long, neighbor_id long, rank int"
    )
    row = label_ndcg(topk2, labels, k=2).collect()[0]
    assert row["ndcg"] == pytest.approx(1 / math.log2(3), abs=1e-6)


def test_split_leakage_raw_leaks_dedup_does_not(spark):
    from kafka_connect_hdfs_spark.operators.packing import split_leakage_report

    # 40 copies of the same text under different ids: hash-by-id split
    # scatters copies across train/val/test — the raw stage must flag it
    docs = spark.createDataFrame(
        [(i, "identical duplicated document text") for i in range(40)]
        + [(100 + i, f"unique text number {i}") for i in range(10)],
        "doc_id long, text string",
    )
    rows = {r["stage"]: r for r in split_leakage_report(docs).collect()}
    assert rows["raw"]["n_leaked_fingerprints"] >= 1
    assert rows["raw"]["n_docs_affected"] >= 40
    assert rows["deduped"]["n_leaked_fingerprints"] == 0
    assert rows["deduped"]["n_docs_affected"] == 0


def test_hourly_anomalies_flags_spike(spark, sf_dir):
    from kafka_connect_hdfs_spark.plans.analytics4 import q_hourly_anomalies

    rows = q_hourly_anomalies(spark, sf_dir).collect()
    for r in rows:
        assert abs(r["z"]) >= 2.0


def test_semantic_threshold_sweep_monotone(spark):
    from kafka_connect_hdfs_spark.operators.similarity import (
        semantic_threshold_sweep,
    )

    # 0/1 orthogonal seeds; 2 duplicates 0 exactly; 3 is a 0.9-ish match
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (2, [1.0, 0.0]),
            (3, [1.0, 0.45]),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = semantic_threshold_sweep(
        emb, thresholds=[0.5, 0.95], n_seeds=2
    ).collect()
    by_t = {float(r["threshold"]): r for r in rows}
    assert by_t[0.5]["n_pairs"] >= by_t[0.95]["n_pairs"]
    assert by_t[0.95]["n_pairs"] == 1          # only the exact duplicate
    assert by_t[0.95]["n_docs_involved"] == 2


def test_conversion_attribution_buckets(spark, sf_dir):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_for_test", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    rows = m.queries()["q_conversion_attribution"](spark, sf_dir).collect()
    assert rows
    assert {r["attribution"] for r in rows} <= {
        "none", "within_1h", "within_24h", "older"
    }
    assert all(r["n_purchases"] > 0 for r in rows)


def test_bigram_logprob_prefers_coherent_text(spark):
    import math as _math

    from kafka_connect_hdfs_spark.operators.text import bigram_logprob

    # "a b" repeated gives high P(b|a); scrambled rare pairs score lower
    docs = spark.createDataFrame(
        [
            (0, "a b a b a b a b"),
            (1, "a b a b a b a b"),
            (2, "b b a a b a a b"),   # same unigrams, jumbled bigrams
            (3, "x"),                  # single token → no bigram rows
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_logprob(docs).collect()}
    assert 3 not in out
    assert out[0]["n_bigrams"] == 7
    assert out[0]["avg_logprob"] == out[1]["avg_logprob"]
    assert out[0]["avg_logprob"] > out[2]["avg_logprob"]
    assert all(r["avg_logprob"] < 0 or _math.isclose(r["avg_logprob"], 0)
               for r in out.values())


def test_first_touch_attribution_buckets(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_ft", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    rows = m.queries()["q_first_touch_attribution"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert sum(r["n_purchases"] for r in rows) > 0
    assert {r["attributed"] for r in rows} <= {True, False}


def test_reduction_report_monotone(spark, sf_dir):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_rr", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    rows = {
        r["stage"]: r
        for r in m.queries()["corpus_reduction_report"](spark, sf_dir).collect()
    }
    assert rows["1_raw"]["n_docs"] >= rows["2_exact_dedup"]["n_docs"]
    assert rows["2_exact_dedup"]["n_docs"] >= rows["3_gopher_keep"]["n_docs"]
    assert rows["1_raw"]["n_tokens"] >= rows["2_exact_dedup"]["n_tokens"]


def test_lang_confusion_matrix_semantics(spark, sf_dir):
    import importlib.util

    from kafka_connect_hdfs_spark.operators.text import with_lang_scores
    from pyspark.sql import functions as _F

    # crafted docs with real marker words: the diagonal dominates
    docs = spark.createDataFrame(
        [
            (0, "the cat and the dog of it", "en"),
            (1, "der hund und die katze ist", "de"),
            (2, "le chat et la maison est", "fr"),
            (3, "el perro y la casa es no", "es"),
        ],
        "doc_id long, text string, lang string",
    )
    conf = {
        (r["lang"], r["lang_pred"]): r["n"]
        for r in with_lang_scores(docs)
        .groupBy("lang", "lang_pred")
        .agg(_F.count("*").alias("n"))
        .collect()
    }
    assert conf == {("en", "en"): 1, ("de", "de"): 1, ("fr", "fr"): 1, ("es", "es"): 1}

    # on the fixture (synthetic English-ish vocabulary under all labels),
    # the matrix must still account for every document — the query's job
    # is to EXPOSE that the labels and the heuristic disagree there
    spec = importlib.util.spec_from_file_location(
        "entry_lc", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    rows = m.queries()["text_lang_confusion"](spark, sf_dir).collect()
    from kafka_connect_hdfs_spark.session import load_table

    assert sum(r["n"] for r in rows) == load_table(
        spark, sf_dir, "documents"
    ).count()


def test_cluster_sizes_and_split_balance(spark, sf_dir):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_cs", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    qs = m.queries()
    sizes = qs["dedup_cluster_sizes"](spark, sf_dir).collect()
    assert all(r["cluster_size"] >= 2 for r in sizes)  # singletons absent
    bal = qs["corpus_split_balance"](spark, sf_dir).collect()
    assert {r["split"] for r in bal} == {"train", "val", "test"}
    total = sum(r["n_docs"] for r in bal)
    train = next(r for r in bal if r["split"] == "train")
    assert train["n_docs"] / total > 0.8  # ~90% weight
    for r in bal:
        assert 0 < r["avg_quality"] <= 1
