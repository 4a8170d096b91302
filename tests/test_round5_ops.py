"""Round-5 fixes: arrow top-k HALF_UP rounding + id-type derivation
(VERDICT r04 item 3 / ADVICE), exact-integer covariance/PCA replay
(VERDICT r04 item 1), LPA string-id tie-break (ADVICE), CDC state-swap
crash recovery (ADVICE), snapshot commit orphan recovery (ADVICE),
cluster-convergence witness gating (ADVICE)."""

import math

import pytest


# ---------------------------------------------------------------------------
# brute_force_topk_arrow: HALF_UP boundary + non-long ids


def test_arrow_topk_rounding_is_half_up(spark):
    """A cosine that is EXACTLY n+0.5 at 6 dp (in double) must round UP
    (HALF_UP, like F.round/DuckDB round) — np.round is half-even and
    rounds it DOWN to n, which flips the top-1 selection against the
    decoy. Fails on np.round, passes on _round6_half_up.

    Construction: q = [1, 0] so cosine == first coordinate; both
    candidate vectors are unit-norm EXACTLY in float64 (searched by ulp
    nudging), so normalization is the identity and the cosine is the
    literal coordinate. 0.1000005 * 1e6 == 100000.5 exactly, and its
    exact binary expansion is above the decimal boundary, so HALF_UP,
    F.round, and DuckDB round all give 0.100001 while np.round gives
    0.1 — tying it with the decoy and electing the lower id.
    """
    from kafka_connect_hdfs_spark.operators.similarity import (
        brute_force_topk_arrow,
    )

    x_boundary = (100000 + 0.5) / 1e6  # 0.1000005, round-trips *1e6 exactly
    assert x_boundary * 1e6 == 100000.5
    emb = spark.createDataFrame(
        [
            (2, [0.1, 0.99498743710662]),          # decoy: cosine 0.1 exact
            (3, [x_boundary, 0.9949873868546023]),  # boundary: 0.1000005
        ],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame(
        [(10, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    rows = brute_force_topk_arrow(emb, q, k=1).collect()
    assert len(rows) == 1
    # HALF_UP: boundary candidate scores 0.100001 > 0.1 and wins even
    # with the higher id; np.round would tie both at 0.1 -> id 2 wins
    assert rows[0]["neighbor_id"] == 3
    assert rows[0]["cosine"] == pytest.approx(0.100001, abs=1e-12)


def test_arrow_topk_derives_id_type_from_input(spark):
    """VERDICT r04: the mapInPandas schema hard-coded `long` ids; it must
    follow the input id column type like the rest of the file."""
    from kafka_connect_hdfs_spark.operators.similarity import (
        brute_force_topk_arrow,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.6, 0.8]), (3, [0.0, 1.0])],
        "vec_id int, embedding array<double>",
    )
    out = brute_force_topk_arrow(emb, emb.filter("vec_id = 1"), k=2)
    assert out.schema["query_id"].dataType.simpleString() == "int"
    assert out.schema["neighbor_id"].dataType.simpleString() == "int"
    got = [r["neighbor_id"] for r in out.orderBy("rank").collect()]
    assert got == [2, 3]


def test_arrow_topk_matches_column_variant(spark):
    """Equivalence on generic data: the BLAS path and the pure-column
    path must agree on ids, ranks, AND rounded cosines."""
    import random

    from kafka_connect_hdfs_spark.operators.similarity import (
        brute_force_topk, brute_force_topk_arrow,
    )

    rnd = random.Random(5)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id < 4")
    a = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in brute_force_topk_arrow(emb, q, k=5).collect()
    }
    b = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# exact-integer covariance / PCA replay


def test_big_to_double_equals_float_below_2_53(spark):
    from kafka_connect_hdfs_spark.operators.similarity import _big_to_double

    for v in (0, 1, -7, 2**52 + 12345, -(2**53 - 1)):
        assert _big_to_double(v) == float(v)
    # above 2^53 it is the documented hi/lo split, deterministic
    big = 31542303057697262321
    hi, lo = divmod(big, 1 << 50)
    assert _big_to_double(big) == float(hi) * float(1 << 50) + float(lo)
    assert _big_to_double(-big) == -_big_to_double(big)


def test_covariance_sums_are_exact_integers(spark):
    """The fixed-point covariance must be invariant to partition count /
    summation order — the r04 driver-red was an order-dependent float
    aggregate. Repartitioning must not change a single output bit."""
    import random

    from kafka_connect_hdfs_spark.operators.similarity import (
        embedding_covariance,
    )

    rnd = random.Random(11)
    rows = [
        (i, [rnd.uniform(-2, 2) for _ in range(5)]) for i in range(300)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(map(tuple, embedding_covariance(emb.coalesce(1)).collect()))
    b = sorted(
        map(tuple, embedding_covariance(emb.repartition(17)).collect())
    )
    assert a == b


def test_pca_power_int_replay_is_pure_integer(spark):
    """_pca_power_int must be reproducible from the covariance rows alone
    with arbitrary-precision arithmetic (the oracle-replay contract)."""
    from kafka_connect_hdfs_spark.operators.similarity import (
        _big_to_double, _pca_power_int, _scaled_int6, embedding_covariance,
    )

    rows = [
        (i, [float((-1) ** i * 3), 0.1 * (i % 4), 0.05 * (i % 2)])
        for i in range(50)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cov = embedding_covariance(emb).collect()
    X, E, TR, d = _pca_power_int(cov, 20)
    # replay independently
    C = [[0] * d for _ in range(d)]
    for r in cov:
        c6 = _scaled_int6(r["cov"])
        C[r["i"]][r["j"]] = c6
        C[r["j"]][r["i"]] = c6
    x = [_scaled_int6(1.0 / math.sqrt(d))] * d
    for _ in range(20):
        y = [sum(C[i][j] * x[j] for j in range(d)) for i in range(d)]
        n = math.sqrt(_big_to_double(sum(v * v for v in y)))
        x = [_scaled_int6(_big_to_double(v) / n) for v in y]
    e = sum(x[i] * C[i][j] * x[j] for i in range(d) for j in range(d))
    if next((v for v in x if v != 0), 0) < 0:
        x = [-v for v in x]
    assert (x, e, sum(C[i][i] for i in range(d))) == (X, E, TR)
    # dominant axis is dim 0 and the component is unit-ish
    assert abs(X[0]) > 990_000
    assert X[0] > 0


# ---------------------------------------------------------------------------
# LPA tie-break must be type-agnostic (ADVICE r04: unary minus on a
# string label fails under ANSI / silently corrupts communities)


def test_lpa_works_with_string_node_ids(spark):
    from kafka_connect_hdfs_spark.operators.graph import (
        label_propagation_communities,
    )

    # two 3-cliques joined by one bridge edge; string ids
    pairs = spark.createDataFrame(
        [
            ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
            ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
            ("a3", "b1"),
        ],
        "id_a string, id_b string",
    )
    rows = label_propagation_communities(pairs, iterations=4).collect()
    comm = {r["node"]: r["community"] for r in rows}
    assert set(comm) == {"a1", "a2", "a3", "b1", "b2", "b3"}
    # the two cliques must resolve to internally-consistent communities
    assert comm["a1"] == comm["a2"] == comm["a3"]
    assert comm["b1"] == comm["b2"] == comm["b3"]


def test_lpa_string_and_long_ids_agree(spark):
    """The same topology with string vs long ids must produce the same
    partition (communities compared as node-set partitions)."""
    from kafka_connect_hdfs_spark.operators.graph import (
        label_propagation_communities,
    )

    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4), (7, 8)]
    pl = spark.createDataFrame(edges, "id_a long, id_b long")
    ps = spark.createDataFrame(
        [(f"n{a:02d}", f"n{b:02d}") for a, b in edges],
        "id_a string, id_b string",
    )

    # normalize long ids to the same node names as the string run
    out_l = label_propagation_communities(pl, iterations=4).collect()
    out_s = label_propagation_communities(ps, iterations=4).collect()
    part_l = {}
    for r in out_l:
        part_l.setdefault(r["community"], set()).add(f"n{r['node']:02d}")
    part_s = {}
    for r in out_s:
        part_s.setdefault(r["community"], set()).add(r["node"])
    assert set(map(frozenset, part_l.values())) == set(
        map(frozenset, part_s.values())
    )


# ---------------------------------------------------------------------------
# CDC state-swap crash recovery (ADVICE r04)


def test_cdc_merge_recovers_state_from_backup(spark, tmp_path):
    """Simulate a crash between the swap's two renames: the state dir is
    gone and only the .__cdc_old backup exists. The next merge must
    restore the backup instead of silently rebuilding from the current
    micro-batch alone."""
    import shutil

    from kafka_connect_hdfs_spark.streaming.cdc import _merge_batch

    state = str(tmp_path / "state")
    prior = spark.createDataFrame(
        [(7, 1, "old7"), (8, 1, "old8")], "k long, v long, tag string"
    )
    _merge_batch(spark, prior, state, ["k"], ["v"])
    # crash simulation: state renamed to backup, publish never happened
    shutil.move(state, str(tmp_path / ".state__cdc_old"))
    batch2 = spark.createDataFrame([(8, 2, "new8")], "k long, v long, tag string")
    _merge_batch(spark, batch2, state, ["k"], ["v"])
    got = {r["k"]: r["tag"] for r in spark.read.parquet(state).collect()}
    # key 7 (only in the pre-crash state) must survive; 8 updated
    assert got == {7: "old7", 8: "new8"}


# ---------------------------------------------------------------------------
# snapshot commit must clear an orphaned data dir (ADVICE r04)


def test_snapshot_commit_recovers_from_orphaned_data_dir(spark, tmp_path):
    """A crash after the data write but before the manifest rename leaves
    data/v<N> with no manifest; the next commit recomputes the same N and
    must overwrite the orphan instead of wedging on mode('error')."""
    from kafka_connect_hdfs_spark.snapshots import (
        commit_snapshot, list_snapshots, read_snapshot,
    )

    table = str(tmp_path / "t")
    df1 = spark.createDataFrame([(1, "a")], "id long, s string")
    assert commit_snapshot(spark, df1, table) == 1
    # crash simulation: data/v2 written, manifest never landed
    orphan = spark.createDataFrame([(99, "orphan")], "id long, s string")
    orphan.write.parquet(f"{table}/data/v2")
    df2 = spark.createDataFrame([(2, "b")], "id long, s string")
    assert commit_snapshot(spark, df2, table) == 2
    assert list_snapshots(spark, table) == [1, 2]
    got = sorted(
        (r["id"], r["s"]) for r in read_snapshot(spark, table, 2).collect()
    )
    assert got == [(2, "b")]  # the orphan rows are gone, not merged


# ---------------------------------------------------------------------------
# duplicate_clusters convergence witness gating (ADVICE r04)


def test_duplicate_clusters_fractional_ids_use_hash_witness(spark):
    """double ids would round in the decimal(38,0) sum witness; they must
    route to the hash signature and still produce exact components."""
    from kafka_connect_hdfs_spark.operators.dedup import duplicate_clusters

    # ids differing only below the decimal(38,0) rounding precision
    pairs = spark.createDataFrame(
        [(1.25, 1.75), (1.75, 2.25), (9.5, 10.5)],
        "id_a double, id_b double",
    )
    rows = duplicate_clusters(pairs, max_iter=10).collect()
    comp = {}
    for r in rows:
        comp.setdefault(r["cluster_id"], set()).add(r["node"])
    assert sorted(comp.values(), key=len) == [
        {9.5, 10.5},
        {1.25, 1.75, 2.25},
    ]
    assert set(comp) == {1.25, 9.5}  # min-label convention


# ---------------------------------------------------------------------------
# new r05 operators


def test_heaps_law_separates_closed_and_open_vocab(spark):
    from kafka_connect_hdfs_spark.operators.text import heaps_law

    closed = [
        (i, "alpha beta gamma alpha beta", "closed") for i in range(20)
    ]
    open_v = [
        (100 + i, " ".join(f"tok{i}_{j}" for j in range(5)), "open")
        for i in range(20)
    ]
    docs = spark.createDataFrame(
        closed + open_v, "doc_id long, text string, source string"
    )
    out = {r["source"]: r for r in heaps_law(docs).collect()}
    # closed vocab: 3 types forever -> beta ~ 0; open: every doc adds 5
    assert out["closed"]["vocab_size"] == 3
    assert out["open"]["vocab_size"] == 100
    assert out["closed"]["total_tokens"] == 100
    assert abs(out["closed"]["beta"]) < 0.1
    assert out["open"]["beta"] > 0.9
    assert out["open"]["r2"] > 0.99


def test_length_buckets_pow2_and_waste(spark):
    from kafka_connect_hdfs_spark.operators.packing import length_buckets

    docs = spark.createDataFrame(
        [
            (0, "a"),                  # 1 tok -> cap 1
            (1, "a b"),                # 2 -> 2
            (2, "a b c"),              # 3 -> 4
            (3, "a b c d"),            # 4 -> 4
            (4, "a b c d e"),          # 5 -> 8
            (5, ""),                   # empty counts as 1 -> cap 1
        ],
        "doc_id long, text string",
    )
    out = {r["bucket_cap"]: r for r in length_buckets(docs).collect()}
    assert set(out) == {1, 2, 4, 8}
    assert out[1]["n_docs"] == 2 and out[1]["padded_tokens"] == 0
    assert out[4]["n_docs"] == 2
    assert out[4]["total_tokens"] == 7 and out[4]["padded_tokens"] == 1
    assert out[8]["pad_waste_ratio"] == pytest.approx(3 / 8, abs=1e-9)


def test_range_search_exact_set_and_self_exclusion(spark):
    from kafka_connect_hdfs_spark.operators.similarity import range_search

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.43589]),   # cos ~ 0.9
            (3, [0.0, 1.0]),       # cos 0
            (4, [0.6, 0.8]),       # cos 0.6
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in range_search(
            emb, emb.filter("vec_id = 1"), min_cosine=0.5
        ).collect()
    }
    assert got == {(1, 2), (1, 4)}  # 3 below radius, self excluded


def test_isotropy_collapsed_and_spread_labels(spark):
    from kafka_connect_hdfs_spark.operators.similarity import (
        isotropy_by_label,
    )

    rows = (
        # label 0: all identical -> pairwise cos 1, mean norm 1
        [(i, [3.0, 4.0], 0) for i in range(5)]
        # label 1: antipodal pairs -> mean ~ 0
        + [(10, [1.0, 0.0], 1), (11, [-1.0, 0.0], 1)]
        # label 2: singleton -> NULL pairwise
        + [(20, [0.0, 2.0], 2)]
    )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {r["label"]: r for r in isotropy_by_label(emb).collect()}
    assert out[0]["n_vecs"] == 5
    assert out[0]["avg_pairwise_cos"] == pytest.approx(1.0, abs=1e-5)
    assert out[0]["mean_vector_norm"] == pytest.approx(1.0, abs=1e-5)
    assert out[1]["avg_pairwise_cos"] == pytest.approx(-1.0, abs=1e-5)
    assert out[1]["mean_vector_norm"] == pytest.approx(0.0, abs=1e-5)
    assert out[2]["avg_pairwise_cos"] is None
    assert out[2]["mean_vector_norm"] == pytest.approx(1.0, abs=1e-5)


def test_binary_sketch_packs_signs_into_words(spark):
    from kafka_connect_hdfs_spark.operators.similarity import (
        binarize_sign_sketch,
    )

    # dims 0 and 33 positive -> word0 bit0, word1 bit1
    vec = [0.0] * 64
    vec[0] = 1.0
    vec[33] = 0.5
    emb = spark.createDataFrame(
        [(7, vec)], "vec_id long, embedding array<double>"
    )
    row = binarize_sign_sketch(emb).collect()[0]
    assert row["id"] == 7
    assert row["words"] == [1, 2]


def test_binary_hamming_topk_orders_by_distance_then_id(spark):
    from kafka_connect_hdfs_spark.operators.similarity import (
        binary_hamming_topk,
    )

    def v(*pos):
        x = [-1.0] * 64
        for p in pos:
            x[p] = 1.0
        return x

    emb = spark.createDataFrame(
        [
            (1, v(0, 1, 2)),       # query
            (2, v(0, 1, 2)),       # hamming 0
            (3, v(0, 1)),          # hamming 1
            (4, v(5, 6, 7)),       # hamming 6
            (5, v(0, 1)),          # hamming 1, tie with 3 -> after by id
        ],
        "vec_id long, embedding array<double>",
    )
    got = [
        (r["neighbor_id"], r["hamming"])
        for r in binary_hamming_topk(
            emb, emb.filter("vec_id = 1"), k=4
        ).orderBy("rank").collect()
    ]
    assert got == [(2, 0), (3, 1), (5, 1), (4, 6)]


def test_cross_source_overlap_counts_and_stop_cap(spark):
    from kafka_connect_hdfs_spark.operators.dedup import cross_source_overlap

    docs = spark.createDataFrame(
        [
            # A and B share the shingle "x y z"; "c c c" is everywhere
            # (df=4 > cap) and must not count
            (1, "x y z q r s", "A"),
            (2, "x y z t u v", "B"),
            (3, "c c c", "A"),
            (4, "c c c", "B"),
            (5, "c c c", "C"),
            (6, "c c c", "C"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in cross_source_overlap(docs, n=3, max_shingle_freq=3).collect()
    }
    ab = rows[("A", "B")]
    assert ab["n_shared"] == 1  # only "x y z"
    # A has 4 capped shingles (xyz,yzq,zqr,qrs), B has 4 -> 1/4
    assert ab["overlap_coef"] == pytest.approx(0.25, abs=1e-9)
    assert ("A", "C") not in rows and ("B", "C") not in rows


def test_orphan_report_statuses(spark, tmp_path):
    import shutil

    from kafka_connect_hdfs_spark.snapshots import (
        commit_snapshot, orphan_report,
    )

    table = str(tmp_path / "t")
    d1 = spark.createDataFrame([(1, "a")], "id long, s string")
    d2 = spark.createDataFrame([(2, "b")], "id long, s string")
    commit_snapshot(spark, d1, table)                       # v1
    commit_snapshot(spark, d2, table, mode="append")        # v2 -> refs v1+v2
    d2.write.parquet(f"{table}/data/v9")                    # orphan
    shutil.rmtree(f"{table}/data/v2")                       # corrupt v2
    got = {
        r["data_dir"]: (r["status"], r["n_refs"])
        for r in orphan_report(spark, table).collect()
    }
    assert got == {
        "v1": ("live", 2),      # referenced by v1 and the v2 append
        "v2": ("missing", 1),
        "v9": ("orphan", 0),
    }


def test_media_stub_embeddings_shape_and_determinism(spark):
    from kafka_connect_hdfs_spark.operators.multimodal import (
        documents_as_media, media_stub_embeddings,
    )

    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "hello world"), (2, "different")],
        "doc_id long, text string",
    )
    emb = media_stub_embeddings(documents_as_media(docs)).collect()
    by_id = {r["media_id"]: r["embedding"] for r in emb}
    assert all(len(v) == 8 for v in by_id.values())
    assert all(-1.0 <= x < 1.0 for v in by_id.values() for x in v)
    # same payload -> same embedding regardless of media type
    assert by_id[0] == by_id[1]
    assert by_id[0] != by_id[2]
    import hashlib

    b0 = hashlib.md5(b"hello world").hexdigest()
    expect0 = int(b0[0:2], 16) / 128.0 - 1.0
    assert by_id[0][0] == pytest.approx(expect0, abs=1e-12)


def test_personalized_pagerank_concentrates_on_seed_side(spark):
    import math

    from pyspark.sql import functions as F

    from kafka_connect_hdfs_spark.operators.graph import (
        pagerank, personalized_pagerank,
    )

    # barbell: clique {1,2,3} — bridge — clique {7,8,9}; seed side wins
    pairs = [
        (1, 2), (2, 3), (1, 3),
        (7, 8), (8, 9), (7, 9),
        (3, 7),
    ]
    edges = spark.createDataFrame(pairs, "src_a long, src_b long")
    edges = edges.withColumn("n_shared", F.lit(1))
    ppr = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(
            edges, seeds=[1, 2], iterations=4
        ).collect()
    }
    assert min(ppr[1], ppr[2], ppr[3]) > max(ppr[8], ppr[9])
    assert abs(math.fsum(ppr.values()) - 1.0) < 1e-3
    # unknown seed is ignored; known seed still drives the walk
    ppr2 = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(
            edges, seeds=[1, 999], iterations=4
        ).collect()
    }
    assert 999 not in ppr2 and ppr2[1] == max(ppr2.values())
    # the GLOBAL pagerank on the symmetric barbell is ~uniform by side —
    # personalization is what breaks the tie
    pr = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iterations=4).collect()
    }
    assert abs(pr[1] - pr[9]) < 1e-6


def test_rehydrate_fills_every_nonfinal_sequence_exactly(spark):
    """Token-level invariants: every non-final sequence of a shard holds
    exactly `budget` tokens (tails included), the total equals the corpus
    token count, and a doc spanning sequences is split, not duplicated."""
    from kafka_connect_hdfs_spark.operators.packing import (
        rehydrate_sequences, with_sequence_packing,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(5 + (i * 7) % 11)))
         for i in range(40)],
        "doc_id long, text string",
    )
    with_tokens = docs.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
    )
    assignment = with_sequence_packing(with_tokens, budget=16, shards=4)
    out = rehydrate_sequences(docs, assignment, budget=16).collect()
    per_shard_max = {}
    for r in out:
        per_shard_max[r["shard"]] = max(
            per_shard_max.get(r["shard"], -1), r["seq"]
        )
    for r in out:
        if r["seq"] < per_shard_max[r["shard"]]:
            assert r["n_tokens_filled"] == 16, r
    total = sum(r["n_tokens_filled"] for r in out)
    expect = sum(r["n_tokens"] for r in with_tokens.collect())
    assert total == expect
    # fingerprints are all distinct (no sequence duplicated)
    fps = [r["text_fp"] for r in out]
    assert len(set(fps)) == len(fps)


def test_ivf_compact_reduces_files_preserves_content(spark, tmp_path):
    """After fragmenting appends, compaction must shrink per-cell file
    counts, leave _seeds byte-identical, and serve the same results."""
    import glob
    import random

    from kafka_connect_hdfs_spark.operators.similarity import (
        append_to_ivf_index, build_ivf_index, compact_ivf_index,
        query_ivf_index,
    )

    rnd = random.Random(3)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(120)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "idx")
    build_ivf_index(emb.filter("vec_id < 60"), path, n_seeds=4)
    for lo, hi in ((60, 90), (90, 120)):
        append_to_ivf_index(
            spark, emb.filter(f"vec_id >= {lo} and vec_id < {hi}"), path
        )
    seeds_before = sorted(glob.glob(f"{path}/_seeds/*.parquet"))
    before = query_ivf_index(spark, path, [0, 1, 2], k=3, n_probe=2)
    rows_before = sorted(map(tuple, before.collect()))
    files_before = len(glob.glob(f"{path}/cells/cell=*/*.parquet"))

    report = compact_ivf_index(spark, path)
    assert report, "nothing was compacted despite fragmenting appends"
    files_after = len(glob.glob(f"{path}/cells/cell=*/*.parquet"))
    assert files_after < files_before
    assert sorted(glob.glob(f"{path}/_seeds/*.parquet")) == seeds_before
    after = query_ivf_index(spark, path, [0, 1, 2], k=3, n_probe=2)
    assert sorted(map(tuple, after.collect())) == rows_before


# ---------------------------------------------------------------------------
# cross-engine determinism kernels vs DuckDB (property-style)


def test_big_to_double_matches_duckdb_split_everywhere():
    """The hi/lo 2^50 split must be bit-identical between Python and the
    SQL expression the oracles use — including >2^53 magnitudes where the
    naive HUGEINT->DOUBLE cast is NOT correctly rounded."""
    import random

    import duckdb

    from kafka_connect_hdfs_spark.operators.similarity import _big_to_double

    con = duckdb.connect()
    rnd = random.Random(42)
    vals = [0, 1, -1, 2**53 - 1, 2**53 + 1, -(2**53 + 3)]
    for e in range(54, 100, 5):
        v = rnd.getrandbits(e) | (1 << (e - 1))
        vals += [v, -v]
    for v in vals:
        got = con.sql(
            f"SELECT CASE WHEN h < 0 THEN -1.0 ELSE 1.0 END * "
            f"(CAST(abs(h) // 1125899906842624 AS DOUBLE) "
            f"* 1125899906842624.0 "
            f"+ CAST(abs(h) % 1125899906842624 AS DOUBLE)) "
            f"FROM (SELECT CAST('{v}' AS HUGEINT) AS h)"
        ).fetchone()[0]
        assert got == _big_to_double(v), v


def test_scaled_int6_matches_duckdb_floor_formula():
    import random

    import duckdb

    from kafka_connect_hdfs_spark.operators.similarity import _scaled_int6

    con = duckdb.connect()
    rnd = random.Random(7)
    vals = [0.0, 1.0, -1.0, 0.1000005, -0.1000005, 0.9999995]
    vals += [rnd.uniform(-3, 3) for _ in range(200)]
    for v in vals:
        got = con.sql(
            f"SELECT CAST(CASE WHEN x < 0 "
            f"THEN -floor(-x * 1000000.0 + 0.5) "
            f"ELSE floor(x * 1000000.0 + 0.5) END AS BIGINT) "
            f"FROM (SELECT {v!r}::DOUBLE AS x)"
        ).fetchone()[0]
        assert got == _scaled_int6(v), v
