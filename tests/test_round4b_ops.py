"""Round-4b operators: deterministic synchronous LPA communities, DSIR
importance selection, power-iteration PCA summary, truncated-dim recall."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# label_propagation_communities


def test_lpa_two_triangles_with_bridge(spark):
    from kafka_connect_hdfs_spark.operators.graph import (
        label_propagation_communities,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "id_a long, id_b long",
    )
    got = {
        r["node"]: (r["community"], r["n_members"])
        for r in label_propagation_communities(edges, iterations=4).collect()
    }
    # hand-replayed 4 sync sweeps (count DESC, label ASC tie-break):
    # triangle {1,2,3} settles on label 1, triangle {4,5,6} on label 3
    assert got == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        4: (3, 3), 5: (3, 3), 6: (3, 3),
    }


def test_lpa_drops_self_pairs_and_dedups_edges(spark):
    from kafka_connect_hdfs_spark.operators.graph import (
        label_propagation_communities,
    )

    edges = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (1, 2)], "id_a long, id_b long"
    )
    rows = label_propagation_communities(edges, iterations=2).collect()
    got = {r["node"]: r["community"] for r in rows}
    # self-pair contributes no edge; duplicate (1,2) counts once. Two sync
    # sweeps on a single edge return each node to its own label.
    assert got == {1: 1, 2: 2}


# ---------------------------------------------------------------------------
# dsir_importance_select


def test_dsir_prefers_target_like_documents(spark):
    from kafka_connect_hdfs_spark.operators.text import (
        dsir_importance_select,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta", "src0"),
            (2, "alpha beta gamma", "src0"),
            (10, "alpha beta alpha", "src1"),
            (11, "zeta eta theta", "src1"),
            (12, "alpha zeta", "src2"),
        ],
        "doc_id long, text string, source string",
    )
    out = dsir_importance_select(
        docs, target_source="src0", n_select=3, buckets=256
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    # target docs never appear in the selection
    assert set(by_id) == {10, 11, 12}
    # the doc sharing the target's vocabulary outranks the disjoint one
    assert by_id[10]["rank"] < by_id[11]["rank"]
    assert by_id[10]["dsir_score"] > by_id[11]["dsir_score"]
    # ranks are dense from 1 in score order
    assert sorted(r["rank"] for r in out) == [1, 2, 3]


def test_dsir_respects_n_select_and_empty_text(spark):
    from kafka_connect_hdfs_spark.operators.text import (
        dsir_importance_select,
    )

    rows = [(0, "alpha beta", "src0")] + [
        (i, "alpha" if i % 2 else "zeta", "src1") for i in range(1, 8)
    ] + [(99, "", "src1")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = dsir_importance_select(
        docs, target_source="src0", n_select=4, buckets=64
    ).collect()
    assert len(out) == 4
    # empty doc has zero features and cannot be selected over scored docs
    assert 99 not in {r["doc_id"] for r in out}


# ---------------------------------------------------------------------------
# pca_power_summary


def test_pca_power_summary_finds_dominant_axis(spark):
    from kafka_connect_hdfs_spark.operators.similarity import (
        pca_power_summary,
    )

    # dim 0 carries ~100x the variance of the rest: PC1 ~= e0
    rows = [
        (i, [float((-1) ** i * 10), float(i % 3) * 0.1, 0.05 * (i % 2), 0.0])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pca_power_summary(emb, iterations=20).orderBy("i").collect()
    assert [r["i"] for r in out] == [0, 1, 2, 3]
    comp = [r["component"] for r in out]
    assert abs(comp[0]) > 0.99
    # sign convention: first non-negligible coordinate positive
    assert comp[0] > 0
    assert abs(math.fsum(c * c for c in comp) - 1.0) < 1e-3
    assert out[0]["eigenvalue"] > 0
    assert 0.9 < out[0]["var_share"] <= 1.0
    # eigenvalue / var_share constant across rows
    assert len({r["eigenvalue"] for r in out}) == 1
    assert len({r["var_share"] for r in out}) == 1


def test_pca_power_summary_empty_input(spark):
    from kafka_connect_hdfs_spark.operators.similarity import (
        pca_power_summary,
    )

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert pca_power_summary(emb).count() == 0


def test_unigram_encode_budgets_and_empty_doc(spark):
    from kafka_connect_hdfs_spark.operators.text import unigram_encode

    docs = spark.createDataFrame(
        [(1, "abab abab cc"), (2, ""), (3, "abc")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unigram_encode(
        docs, vocab_size=4, max_piece_len=3, iterations=2
    ).collect()}
    assert set(out) == {1, 2, 3}
    # empty doc: zero tokens, undefined fertility
    assert (out[2]["n_ws_tokens"], out[2]["n_unigram_tokens"]) == (0, 0)
    assert out[2]["fertility"] is None
    for d in (1, 3):
        r = out[d]
        assert r["n_ws_tokens"] >= 1
        # pieces per word bounded by [1, len(word)]
        assert r["n_unigram_tokens"] >= r["n_ws_tokens"]
        assert r["fertility"] is not None and r["fertility"] >= 1.0
    assert out[1]["n_ws_tokens"] == 3


def test_validate_constraints_flags_false_and_null(spark):
    from kafka_connect_hdfs_spark.operators.quality import (
        constraint_report, validate_constraints,
    )

    rows = [(1, 10.0), (2, -3.0), (3, None), (4, 100.0)]
    df = spark.createDataFrame(rows, "id long, v double")
    rules = [
        ("v_nonneg", F.col("v") >= 0),
        ("v_cap", F.col("v") <= 50),
    ]
    ann = {r["id"]: r for r in validate_constraints(df, rules).collect()}
    assert ann[1]["valid"] and ann[1]["violations"] == []
    assert ann[2]["violations"] == ["v_nonneg"]
    # NULL fails BOTH predicates (a gate must flag unknowns)
    assert set(ann[3]["violations"]) == {"v_nonneg", "v_cap"}
    assert ann[4]["violations"] == ["v_cap"]
    rep = {r["rule"]: r for r in constraint_report(df, rules).collect()}
    assert rep["v_nonneg"]["n_violations"] == 2
    assert rep["v_cap"]["n_violations"] == 2
    assert rep["v_cap"]["n_checked"] == 4
    assert rep["v_cap"]["violation_rate"] == 0.5


def test_modularity_hand_computed(spark):
    from kafka_connect_hdfs_spark.operators.graph import modularity_report

    # two disjoint triangles: m=6, per community e_c=3, d_c=6
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)],
        "id_a long, id_b long",
    )
    good = spark.createDataFrame(
        [(n, 1 if n <= 3 else 4) for n in range(1, 7)],
        "node long, community long",
    )
    out = {r["community"]: r for r in modularity_report(edges, good).collect()}
    for c in (1, 4):
        assert out[c]["n_members"] == 3
        assert out[c]["intra_edges"] == 3
        assert out[c]["degree_sum"] == 6
        # 3/6 - (6/12)^2 = 0.25
        assert abs(out[c]["q_contrib"] - 0.25) < 1e-6
    # the trivial all-one-community partition scores Q = 0
    bad = spark.createDataFrame(
        [(n, 1) for n in range(1, 7)], "node long, community long"
    )
    total = sum(
        r["q_contrib"] for r in modularity_report(edges, bad).collect()
    )
    assert abs(total) < 1e-6


def test_centroid_drift_zero_for_identical_halves(spark):
    from kafka_connect_hdfs_spark.operators.similarity import centroid_drift

    rows = [(i, [1.0, 2.0], 1) for i in range(4)] + [
        (i, [0.0, 3.0], 2) for i in range(4, 8)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        r["label"]: r
        for r in centroid_drift(
            emb.filter(F.col("vec_id") % 2 == 0),
            emb.filter(F.col("vec_id") % 2 == 1),
        ).collect()
    }
    # old == new == the same constant vectors per label
    for lbl in (1, 2):
        assert out[lbl]["drift_l2"] == 0.0
        assert out[lbl]["centroid_cos"] == 1.0
        assert out[lbl]["n_old"] == 2 and out[lbl]["n_new"] == 2


def test_centroid_drift_measures_shift(spark):
    from kafka_connect_hdfs_spark.operators.similarity import centroid_drift

    old = spark.createDataFrame(
        [(1, [1.0, 0.0], 1)], "vec_id long, embedding array<float>, label int"
    )
    new = spark.createDataFrame(
        [(2, [0.0, 1.0], 1)], "vec_id long, embedding array<float>, label int"
    )
    r = centroid_drift(old, new).collect()[0]
    assert abs(r["drift_l2"] - math.sqrt(2)) < 1e-6
    assert r["centroid_cos"] == 0.0


def test_concentration_report_gini(spark):
    from kafka_connect_hdfs_spark.operators.quality import (
        concentration_report,
    )

    docs = spark.createDataFrame(
        [(i, "en" if i < 8 else "de", "s%d" % (i % 2)) for i in range(10)],
        "doc_id long, lang string, source string",
    )
    out = {r["dimension"]: r for r in concentration_report(docs).collect()}
    # lang counts [2, 8] ascending: gini = (2*(1*2+2*8))/(2*10) - 3/2 = 0.3
    assert out["lang"]["n_groups"] == 2
    assert abs(out["lang"]["gini"] - 0.3) < 1e-6
    assert out["lang"]["top_share"] == 0.8
    # source counts [5, 5]: perfectly even -> gini 0
    assert abs(out["source"]["gini"]) < 1e-6


# ---------------------------------------------------------------------------
# truncated-dim recall (matryoshka curve point)


def test_probe_sweep_monotonic_and_exhaustive_at_all_cells(spark):
    from kafka_connect_hdfs_spark.operators.similarity import ivf_probe_sweep

    rows = [
        (i, [math.sin(0.9 * i + j) for j in range(6)]) for i in range(24)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ivf_probe_sweep(
        emb, emb.filter(F.col("vec_id") < 3), k=4, n_seeds=4, probes=(1, 2, 4)
    ).collect()
    rec = {(r["query_id"], r["n_probe"]): r["recall"] for r in out}
    assert len(out) == 9  # 3 queries x 3 probe levels
    for q in range(3):
        # recall climbs (weakly) with probe count
        assert rec[(q, 1)] <= rec[(q, 2)] <= rec[(q, 4)]
        # probing every cell IS the exhaustive search
        assert rec[(q, 4)] == 1.0


def test_zipf_slope_matches_closed_form(spark):
    from kafka_connect_hdfs_spark.operators.text import zipf_slope

    docs = spark.createDataFrame(
        [(1, "a a a a b b c", "s1"), (2, "x y", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in zipf_slope(docs, top_n=10).collect()}
    # s1: freqs 4,2,1 at ranks 1,2,3
    xs = [math.log(r) for r in (1, 2, 3)]
    ys = [math.log(f) for f in (4, 2, 1)]
    n = 3.0
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert out["s1"]["n_terms"] == 3
    assert abs(out["s1"]["slope"] - slope) < 1e-6
    assert slope < -1.0  # steeper than Zipf's -1 for this skewed toy
    assert 0.9 < out["s1"]["r2"] <= 1.0
    # s2: two tokens with equal freq 1 -> flat fit, slope 0, r2 undefined
    assert out["s2"]["slope"] == 0.0
    assert out["s2"]["r2"] is None


# ---------------------------------------------------------------------------
# unigram_lm_learn


def test_viterbi_prefers_longer_piece_on_tie_and_score():
    from kafka_connect_hdfs_spark.operators.text import _viterbi_pieces

    lp = {"a": -100, "b": -100, "ab": -150, "ba": -190}
    # 'ab' (-150) beats 'a'+'b' (-200)
    assert _viterbi_pieces("ab", lp, 4) == ["ab"]
    # exact tie: 'ab'+'a' == 'a'+'ba' == -250 -> longest piece at the END
    # wins the backtrack choice
    lp2 = {"a": -100, "b": -100, "ab": -150, "ba": -150}
    assert _viterbi_pieces("aba", lp2, 4) == ["ba", "a"]
    # unreachable tail under missing pieces -> empty path guard
    assert _viterbi_pieces("zz", {"a": -1}, 4) == []


def test_unigram_lm_learn_small_corpus(spark):
    from kafka_connect_hdfs_spark.operators.text import (
        _half_up_scaled, _viterbi_pieces, unigram_lm_learn,
    )
    import collections
    import math

    texts = ["abab abc", "abab abab cc", "abc cc"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = unigram_lm_learn(
        docs, vocab_size=4, max_piece_len=3, iterations=2
    ).collect()
    # replay the spec in pure python
    freq = collections.Counter()
    for t in texts:
        for w in t.split():
            freq[w] += 1
    cand = collections.Counter()
    for w, f in freq.items():
        for s in range(len(w)):
            for l in range(1, min(3, len(w) - s) + 1):
                cand[w[s : s + l]] += f
    vocab = {p: c for p, c in cand.items() if len(p) == 1}
    vocab.update(
        dict(
            sorted(
                ((p, c) for p, c in cand.items() if len(p) > 1),
                key=lambda x: (-x[1], x[0]),
            )[:4]
        )
    )
    tot = float(sum(vocab.values()))
    lp = {p: _half_up_scaled(math.log(c / tot)) for p, c in vocab.items()}
    counts: dict = {}
    for _ in range(2):
        counts = collections.Counter()
        for w, f in freq.items():
            for piece in _viterbi_pieces(w, lp, 3):
                counts[piece] += f
        sm = {p: counts.get(p, 0) + 1 for p in vocab}
        tt = float(sum(sm.values()))
        lp = {p: _half_up_scaled(math.log(c / tt)) for p, c in sm.items()}
    expected = sorted(
        [
            (p, len(p), counts.get(p, 0), _half_up_scaled(sm[p] / tt) / 1e6)
            for p in vocab
        ],
        key=lambda r: (-r[2], r[0]),
    )
    got = [
        (r["piece"], r["piece_len"], r["viterbi_count"], r["prob"])
        for r in out
    ]
    assert got == expected
    # probabilities form a (smoothed) distribution
    assert abs(sum(r[3] for r in got) - 1.0) < 1e-3


def test_maxsim_scores_hand_checked(spark):
    from kafka_connect_hdfs_spark.operators.similarity import maxsim_topk

    # 2 tokens per doc; doc0 = query. doc1 shares token [1,0]; doc2 is
    # orthogonal on one token, opposite on the other.
    rows = [
        (0, [1.0, 0.0]), (1, [0.0, 1.0]),       # doc 0 (query)
        (2, [1.0, 0.0]), (3, [0.0, 1.0]),       # doc 1: perfect match
        (4, [0.0, -1.0]), (5, [-1.0, 0.0]),     # doc 2: worst case
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = maxsim_topk(emb, k=2, vecs_per_doc=2, n_query_docs=1).collect()
    got = {(r["query_doc"], r["doc"]): (r["maxsim"], r["rank"]) for r in out}
    # doc1: each query token finds cosine 1 -> maxsim 2; doc2: best per
    # query token is 0 (orthogonal beats the -1 match) -> maxsim 0
    assert got == {(0, 1): (2.0, 1), (0, 2): (0.0, 2)}


def test_trunc_recall_is_one_at_full_dim(spark):
    from kafka_connect_hdfs_spark.operators.similarity import (
        ann_recall, brute_force_topk,
    )

    rows = [
        (i, [math.cos(0.7 * i + j) for j in range(8)]) for i in range(20)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    full = emb.select("vec_id", F.slice("embedding", 1, 8).alias("embedding"))
    q = emb.filter(F.col("vec_id") < 4)
    qf = full.filter(F.col("vec_id") < 4)
    approx = brute_force_topk(full, qf, k=3)
    exact = brute_force_topk(emb, q, k=3)
    rec = ann_recall(approx, exact).collect()
    assert len(rec) == 4
    assert all(r["recall"] == 1.0 for r in rec)
