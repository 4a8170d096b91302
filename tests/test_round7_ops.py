"""Unit tests for the five r07 operators: int8 quantization audit,
robust MAD outliers, weak-label vote census, recency-decayed engagement,
and PSI drift. Each test pins the SEMANTICS on a hand-computed fixture
(the oracle gates pin cross-engine parity separately)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# embedding_int8_quant


def test_int8_quant_hand_computed(spark):
    from kafka_connect_hdfs_spark.operators.similarity import (
        embedding_int8_quant,
    )

    # dim0 micro-ints: 1_000_000, -500_000, 250_000  (amax = 1_000_000)
    # codes (half-up 127*m/amax): 127, -64 (63.5 rounds half-up), 32 (31.75->32)
    # dim1: all zero -> amax 0, codes 0, mse 0
    rows = [
        (0, [1.0, 0.0]),
        (1, [-0.5, 0.0]),
        (2, [0.25, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["i"]: r for r in embedding_int8_quant(df).collect()}
    assert got[0]["amax_micro"] == 1_000_000
    assert got[0]["n_saturated"] == 1  # only the max element
    assert got[1]["amax_micro"] == 0
    assert got[1]["n_saturated"] == 0
    assert got[1]["mse"] == 0.0
    # dim0 exact errors: e = 127*m - code*amax
    #   m=1e6:  127e6 - 127e6 = 0
    #   m=-5e5: -63.5e6 + 64e6 = 5e5
    #   m=2.5e5: 31.75e6 - 32e6 = -2.5e5
    # mse = (0 + 25e10 + 6.25e10) / (3 * 127^2 * 1e12)
    expected = (25e10 + 6.25e10) / (3 * 127 * 127 * 1e12)
    assert abs(got[0]["mse"] - round(expected, 6)) < 1e-9


def test_int8_quant_code_bound(spark):
    """No code may exceed |127| and every nonzero dim saturates at least
    once (the max element maps to exactly 127)."""
    from kafka_connect_hdfs_spark.operators.similarity import (
        embedding_int8_quant,
    )
    from kafka_connect_hdfs_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = embedding_int8_quant(emb).collect()
    assert len(out) == 64
    for r in out:
        assert r["n_saturated"] >= 1
        assert r["mse"] >= 0.0
        # quantization error per element is <= (amax/254)/1e6 in original
        # units, so mse <= (amax/254e6)^2
        bound = (r["amax_micro"] / 254e6) ** 2
        assert r["mse"] <= bound + 1e-12


# ---------------------------------------------------------------------------
# robust_length_outliers (MAD)


def test_mad_outliers_hand_computed(spark):
    from kafka_connect_hdfs_spark.operators.quality import (
        robust_length_outliers,
    )

    # lengths 10,12,14,16,1000: median 14, deviations 4,2,0,2,986
    # MAD = median(0,2,2,4,986) = 2
    # z(1000) = 0.6745*986/2 = 332.5... -> 1 outlier at cut 3.5
    rows = [(i, "x", "en", "s", n) for i, n in enumerate([10, 12, 14, 16, 1000])]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = robust_length_outliers(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["median_len"] == 14.0
    assert r["mad"] == 2.0
    assert r["n_docs"] == 5
    assert r["n_outliers"] == 1
    assert r["max_abs_z"] == round(0.6745 * 986 / 2, 6)


def test_mad_zero_guard(spark):
    from kafka_connect_hdfs_spark.operators.quality import (
        robust_length_outliers,
    )

    rows = [(i, "x", "de", "s", 50) for i in range(4)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    r = robust_length_outliers(df).collect()[0]
    assert r["mad"] == 0.0 and r["n_outliers"] == 0 and r["max_abs_z"] == 0.0


# ---------------------------------------------------------------------------
# weak_label_census


def test_weak_label_votes_per_branch(spark):
    from kafka_connect_hdfs_spark.operators.quality import weak_label_census

    docs = [
        # 12 distinct tokens: LF1 +1 (10<=12<=80), LF2 +1, LF3 'spark' +1
        (1, "spark a b c d e f g h i j k"),
        # 3 tokens: LF1 -1 (<5), LF2 +1 (3 distinct of 3), LF3 'dup' -1
        (2, "dup x y"),
        # 12 tokens all 'w': LF1 +1, LF2 -1 (1*10 < 12*3), LF3 0
        (3, "w w w w w w w w w w w w"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["v1"], r["v2"], r["v3"]): (r["decision"], r["n_docs"])
        for r in weak_label_census(df).collect()
    }
    assert got[(1, 1, 1)] == ("keep", 1)
    assert got[(-1, 1, -1)] == ("drop", 1)
    assert got[(1, -1, 0)] == ("undecided", 1)


def test_weak_label_dup_beats_spark(spark):
    from kafka_connect_hdfs_spark.operators.quality import weak_label_census

    df = spark.createDataFrame(
        [(1, "spark dup a b c d e f g h i j")], "doc_id long, text string"
    )
    r = weak_label_census(df).collect()[0]
    assert r["v3"] == -1  # both keywords -> spam wins


# ---------------------------------------------------------------------------
# decayed_engagement


def test_decay_engagement_hand_computed(spark):
    from kafka_connect_hdfs_spark.operators.funnel import decayed_engagement

    d = datetime.datetime
    rows = [
        # user 1: 10.0 today (w=10), 10.0 four days ago (w=2) -> 12
        (1, d(2026, 1, 5, 12), 1, "click", 10.0, None),
        (2, d(2026, 1, 1, 9), 1, "click", 10.0, None),
        # user 2: 30.0 nine days ago (w=3) -> 3
        (3, d(2025, 12, 27, 8), 2, "click", 30.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = decayed_engagement(df, k=10).collect()
    assert [(r["user_id"], r["n_events"], r["score"]) for r in out] == [
        (1, 2, 12.0),
        (2, 1, 3.0),
    ]


def test_decay_engagement_is_topk_and_ordered(spark):
    from kafka_connect_hdfs_spark.operators.funnel import decayed_engagement
    from kafka_connect_hdfs_spark.session import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = decayed_engagement(ev, k=5).collect()
    assert len(out) == 5
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)


# ---------------------------------------------------------------------------
# psi_drift


def _events_df(spark, values, ids=None):
    d = datetime.datetime(2026, 1, 1)
    rows = [
        ((ids[i] if ids else i), d, 1, "click", float(v), None)
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_psi_identical_samples_is_zero(spark):
    from kafka_connect_hdfs_spark.operators.quality import psi_drift

    vals = [float(x) for x in range(100)]
    ref = _events_df(spark, vals)
    out = psi_drift(ref, _events_df(spark, vals)).collect()
    assert len(out) == 10
    assert all(r["psi_contrib"] == 0.0 for r in out)  # p == q exactly
    assert sum(r["n_ref"] for r in out) == 100


def test_psi_shifted_sample_is_positive_and_clamped(spark):
    from kafka_connect_hdfs_spark.operators.quality import psi_drift

    ref = _events_df(spark, [float(x) for x in range(100)])
    cur = _events_df(spark, [float(x) + 200.0 for x in range(100)])
    out = psi_drift(ref, cur).collect()
    by_bucket = {r["bucket"]: r for r in out}
    # every out-of-range current value clamps into the top bucket
    assert by_bucket[9]["n_cur"] == 100
    total_psi = sum(r["psi_contrib"] for r in out)
    assert total_psi > 0.25  # "retrain" territory for a full shift


def test_psi_constant_reference_single_bucket(spark):
    from kafka_connect_hdfs_spark.operators.quality import psi_drift

    ref = _events_df(spark, [5.0] * 10)
    cur = _events_df(spark, [5.0] * 10)
    out = psi_drift(ref, cur).collect()
    by_bucket = {r["bucket"]: (r["n_ref"], r["n_cur"]) for r in out}
    assert by_bucket[0] == (10, 10)  # hi == lo -> everything in bucket 0
    assert all(v == (0, 0) for b, v in by_bucket.items() if b != 0)


# ---------------------------------------------------------------------------
# pmi_collocations


def test_pmi_hand_computed(spark):
    from kafka_connect_hdfs_spark.operators.text import pmi_collocations

    # 'a b' co-occur in all 6 docs; 'a c' in 3; 'b c' in 3.
    docs = [(i, "a b" + (" c" if i % 2 == 0 else "")) for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        (r["tok_a"], r["tok_b"]): (r["n_ab"], r["pmi"])
        for r in pmi_collocations(df, min_pairs=1, k=10).collect()
    }
    import math

    # n_docs=6, n_a=n_b=6, n_c=3
    assert out[("a", "b")][0] == 6
    assert out[("a", "b")][1] == round(math.log(6 * 6 / (6 * 6)), 6) == 0.0
    assert out[("a", "c")] == (3, round(math.log(3 * 6 / (6 * 3)), 6))
    # PMI('b','c') == PMI('a','c'); min_pairs floor respected
    assert out[("b", "c")] == out[("a", "c")]


def test_pmi_min_pairs_floor_and_cap(spark):
    from kafka_connect_hdfs_spark.operators.text import pmi_collocations

    docs = [(1, "x y"), (2, "x y"), (3, "p q")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pmi_collocations(df, min_pairs=2, k=10).collect()
    assert [(r["tok_a"], r["tok_b"]) for r in out] == [("x", "y")]
    # max_tokens cap: a doc with many distinct tokens emits only pairs
    # among its first (sorted) max_tokens
    wide = spark.createDataFrame(
        [(1, " ".join(f"t{i:03d}" for i in range(10)))] * 2,
        "doc_id long, text string",
    )
    capped = pmi_collocations(wide, min_pairs=1, max_tokens=3, k=100).collect()
    assert len(capped) == 3  # C(3,2), not C(10,2)


# ---------------------------------------------------------------------------
# snapshot_content_diff


def test_snapshot_content_diff_classifies(spark, tmp_path):
    from kafka_connect_hdfs_spark.snapshots import (
        commit_snapshot, snapshot_content_diff,
    )

    tbl = str(tmp_path / "t")
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, txt string"
    )
    commit_snapshot(spark, v1, tbl)
    v2 = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "k long, txt string"
    )
    commit_snapshot(spark, v2, tbl)
    got = {
        r["k"]: r["change"]
        for r in snapshot_content_diff(spark, tbl, 1, 2, "k", ["txt"]).collect()
    }
    assert got == {2: "modified", 3: "removed", 4: "added"}  # 1 unchanged


def test_snapshot_content_diff_multiset_keys(spark, tmp_path):
    """Non-unique keys compare as MULTISETS: same rows in different order
    are unchanged; a duplicated row count change is 'modified'."""
    from kafka_connect_hdfs_spark.snapshots import (
        commit_snapshot, snapshot_content_diff,
    )

    tbl = str(tmp_path / "t")
    commit_snapshot(
        spark,
        spark.createDataFrame(
            [(1, "x"), (1, "y"), (2, "z")], "k long, txt string"
        ),
        tbl,
    )
    commit_snapshot(
        spark,
        spark.createDataFrame(
            [(1, "y"), (1, "x"), (2, "z"), (2, "z")], "k long, txt string"
        ),
        tbl,
    )
    got = {
        r["k"]: r["change"]
        for r in snapshot_content_diff(spark, tbl, 1, 2, "k", ["txt"]).collect()
    }
    assert got == {2: "modified"}  # key 1 reordered only -> unchanged


def test_snapshot_content_diff_xor_cancellation_caught(spark, tmp_path):
    """The r07 ADVICE collision class: {A,A,B} vs {C,C,B} under one key
    have EQUAL count and EQUAL xor (even multiplicities cancel), so a
    (count, xor) fingerprint calls a real change unchanged — the additive
    sum fold must catch it."""
    from kafka_connect_hdfs_spark.snapshots import (
        commit_snapshot, snapshot_content_diff,
    )

    tbl = str(tmp_path / "t")
    commit_snapshot(
        spark,
        spark.createDataFrame(
            [(1, "A"), (1, "A"), (1, "B")], "k long, txt string"
        ),
        tbl,
    )
    commit_snapshot(
        spark,
        spark.createDataFrame(
            [(1, "C"), (1, "C"), (1, "B")], "k long, txt string"
        ),
        tbl,
    )
    got = {
        r["k"]: r["change"]
        for r in snapshot_content_diff(spark, tbl, 1, 2, "k", ["txt"]).collect()
    }
    assert got == {1: "modified"}


# ---------------------------------------------------------------------------
# bucketing


def test_bucketed_join_has_no_exchange_and_matches_plain(spark):
    from pyspark.sql import functions as F

    from kafka_connect_hdfs_spark.operators.bucketing import (
        assert_no_exchange, bucketed_join, drop_bucketed, write_bucketed,
    )
    from kafka_connect_hdfs_spark.session import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select("event_id", "user_id")
    cu = load_table(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    write_bucketed(ev, "t_bj_ev", "user_id", n_buckets=4)
    write_bucketed(cu, "t_bj_cu", "c_custkey", n_buckets=4)
    try:
        j = bucketed_join(spark, "t_bj_ev", "t_bj_cu", "user_id", "c_custkey")
        plan = assert_no_exchange(j)  # must not raise
        assert "SortMergeJoin" in plan
        got = j.count()
        want = ev.join(cu, ev.user_id == cu.c_custkey).count()
        assert got == want
    finally:
        drop_bucketed(spark, "t_bj_ev", "t_bj_cu")


def test_assert_no_exchange_raises_on_shuffled_join(spark):
    import pytest as _pytest

    from kafka_connect_hdfs_spark.operators.bucketing import assert_no_exchange
    from kafka_connect_hdfs_spark.session import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select("event_id", "user_id")
    cu = load_table(spark, sf, "customer").select("c_custkey")
    j = ev.hint("merge").join(cu.hint("merge"), ev.user_id == cu.c_custkey)
    with _pytest.raises(AssertionError, match="Exchange"):
        assert_no_exchange(j)


# ---------------------------------------------------------------------------
# r07 review-pass regressions


def test_mad_meanad_fallback_catches_majority_constant_group(spark):
    """MAD=0 does NOT mean all-equal: a >50%-constant group must fall
    back to the MeanAD modified z (0.7979) and still flag the tail."""
    from kafka_connect_hdfs_spark.operators.quality import (
        robust_length_outliers,
    )

    rows = [(i, "x", "en", "s", n) for i, n in enumerate([5, 5, 5, 5, 1000])]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    r = robust_length_outliers(df).collect()[0]
    assert r["mad"] == 0.0
    # MeanAD = 995/5 = 199; z(1000) = 0.7979*995/199 = 3.9895 > 3.5
    assert r["n_outliers"] == 1
    assert r["max_abs_z"] == round(0.7979 * 995 / 199, 6)


def test_psi_extreme_value_clamps_not_crashes(spark):
    """A current value whose raw bucket index exceeds int range must
    clamp to the edge bucket (pre-fix: ANSI CAST_OVERFLOW crash)."""
    from kafka_connect_hdfs_spark.operators.quality import psi_drift

    ref = _events_df(spark, [float(x) for x in range(10)])
    cur = _events_df(spark, [3.0e12, -3.0e12, 5.0])
    out = {r["bucket"]: r for r in psi_drift(ref, cur).collect()}
    assert out[9]["n_cur"] == 1  # +3e12 -> top bucket
    assert out[0]["n_cur"] == 1  # -3e12 -> bottom bucket
    assert sum(r["n_cur"] for r in out.values()) == 3


def test_pmi_null_text_counts_as_document(spark):
    """NULL text normalizes to '' on both engines, so N is the table's
    row count — a NULL doc must not shift every PMI (latent cross-engine
    red found in review)."""
    import math

    from kafka_connect_hdfs_spark.operators.text import pmi_collocations

    docs = [(1, "a b"), (2, "a b"), (3, None)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pmi_collocations(df, min_pairs=1, k=5).collect()
    assert len(out) == 1
    # N=3 (null doc counted), n_a=n_b=2, n_ab=2
    assert out[0]["pmi"] == round(math.log(2 * 3 / (2 * 2)), 6)


def test_mart_raises_when_stream_takes_over_batch_mart(spark, tmp_path):
    """Legacy/batch-API marker + a stream caller (or vice versa) is an
    ownership mismatch and must raise, not fall through to the
    meaningless batch-id comparison."""
    from kafka_connect_hdfs_spark.streaming.mart import _refresh_batch

    mart = str(tmp_path / "mart")
    batch = spark.createDataFrame([("a", 1.0)], "k string, value double")
    _refresh_batch(
        spark, batch, mart, ["k"], "n_rows", {"value": "v"}, batch_id=7
    )  # batch API writes a legacy marker
    with pytest.raises(ValueError, match="batch API"):
        _refresh_batch(
            spark, batch, mart, ["k"], "n_rows", {"value": "v"},
            batch_id=0, stream_id="fresh-stream",
        )


def test_mart_adopts_legacy_marker_on_stream_resume(spark, tmp_path):
    """A pre-r07 stream wrote `_applied_<n>` markers (no owner id). The
    SAME stream resuming its original checkpoint must keep working (r07
    ADVICE): a replayed final batch (id == n) is skipped, the next batch
    (id > n) folds and REWRITES the marker in the owner-qualified format,
    after which a different stream is correctly rejected again."""
    from kafka_connect_hdfs_spark.statedir import state_marker
    from kafka_connect_hdfs_spark.streaming.mart import _refresh_batch

    mart = str(tmp_path / "mart")
    batch = spark.createDataFrame([("a", 1.0)], "k string, value double")
    # simulate the pre-r07 marker: batch API writes the legacy format
    _refresh_batch(
        spark, batch, mart, ["k"], "n_rows", {"value": "v"}, batch_id=3
    )
    assert state_marker(spark, mart, "_applied_") == "_applied_3"

    # replay of the final pre-upgrade batch: skipped, not raised
    _refresh_batch(
        spark, batch, mart, ["k"], "n_rows", {"value": "v"},
        batch_id=3, stream_id="orig-stream",
    )
    assert (
        spark.read.parquet(mart).agg({"n_rows": "sum"}).collect()[0][0] == 1
    )

    # next batch folds and upgrades the marker format
    _refresh_batch(
        spark, batch, mart, ["k"], "n_rows", {"value": "v"},
        batch_id=4, stream_id="orig-stream",
    )
    assert state_marker(spark, mart, "_applied_") == "_applied_orig-stream_4"
    assert (
        spark.read.parquet(mart).agg({"n_rows": "sum"}).collect()[0][0] == 2
    )

    # ownership guard is back in force for any OTHER stream
    with pytest.raises(ValueError, match="orig-stream"):
        _refresh_batch(
            spark, batch, mart, ["k"], "n_rows", {"value": "v"},
            batch_id=0, stream_id="fresh-stream",
        )


def test_mart_legacy_marker_lower_id_still_raises(spark, tmp_path):
    """Legacy marker + a stream delivering a STRICTLY LOWER batch id can
    only be a fresh checkpoint (ids restarted) - adoption must not apply."""
    from kafka_connect_hdfs_spark.streaming.mart import _refresh_batch

    mart = str(tmp_path / "mart")
    batch = spark.createDataFrame([("a", 1.0)], "k string, value double")
    _refresh_batch(
        spark, batch, mart, ["k"], "n_rows", {"value": "v"}, batch_id=7
    )
    with pytest.raises(ValueError, match="batch API"):
        _refresh_batch(
            spark, batch, mart, ["k"], "n_rows", {"value": "v"},
            batch_id=0, stream_id="fresh-stream",
        )


def test_pz_skips_sql_comments():
    from __spark_entry__ import _pz

    s = "-- round to 6dp (convention\nSELECT round(x, 6) FROM t"
    assert _pz(s) == "-- round to 6dp (convention\nSELECT (round(x, 6) + 0.0) FROM t"
    # a comment inside an argument scan must not unbalance the parens
    s2 = "SELECT round(x + -- note (\n y, 6) FROM t"
    assert _pz(s2) == "SELECT (round(x + -- note (\n y, 6) + 0.0) FROM t"


# ---------------------------------------------------------------------------
# rake_keyphrases


def test_rake_hand_computed(spark):
    from kafka_connect_hdfs_spark.operators.text import rake_keyphrases

    # phrases: 'key order sort' x2, 'scan' x2 (delimited by 'the'/'of')
    docs = [
        (1, "the key order sort of scan"),
        (2, "the key order sort of scan"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["phrase"]: (r["n_occurrences"], r["score"])
        for r in rake_keyphrases(df, min_occurrences=2, k=10).collect()
    }
    # freq: key=2, order=2, sort=2, scan=2; deg: key/order/sort=6, scan=2
    # word scores: 3.0 for phrase words, 1.0 for scan
    assert out["key order sort"] == (2, 9.0)
    assert out["scan"] == (2, 1.0)


def test_rake_respects_phrase_cap_and_min_occ(spark):
    from kafka_connect_hdfs_spark.operators.text import rake_keyphrases

    docs = [
        (1, "alpha beta gamma delta epsilon"),  # 5-word run > cap 4
        (2, "zeta eta"),                        # occurs once only
        (3, "zeta eta"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = [r["phrase"] for r in rake_keyphrases(df, k=10).collect()]
    assert out == ["zeta eta"]  # long run capped out, singletons floored


def test_rake_multiple_docs_same_phrase_share_score(spark):
    from kafka_connect_hdfs_spark.operators.text import rake_keyphrases

    docs = [(i, "merge join the merge join") for i in range(3)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = rake_keyphrases(df, min_occurrences=2, k=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r["phrase"] == "merge join" and r["n_occurrences"] == 6
    # freq(merge)=freq(join)=6, deg=12 -> word score 2.0 each -> 4.0
    assert r["score"] == 4.0


# ---------------------------------------------------------------------------
# streaming CMS


def test_stream_cms_equals_batch_sketch(spark, tmp_path):
    """The streamed sketch must be BIT-identical to the batch sketch over
    the same rows (exact integer cells, additive merge)."""
    from kafka_connect_hdfs_spark.operators.sketches import count_min_table
    from kafka_connect_hdfs_spark.streaming.sketch import start_cms_refresh

    df = spark.createDataFrame(
        [(i % 7,) for i in range(200)], "user_id long"
    )
    src = str(tmp_path / "src")
    df.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_cms_refresh(
        stream, str(tmp_path / "cms"), "user_id", str(tmp_path / "chk")
    )
    assert q.awaitTermination(300)
    streamed = {
        (r["r"], r["bucket"]): r["c"]
        for r in spark.read.parquet(str(tmp_path / "cms")).collect()
    }
    batch = {
        (r["r"], r["bucket"]): r["c"]
        for r in count_min_table(df, "user_id").collect()
    }
    assert streamed == batch


# ---------------------------------------------------------------------------
# snapshot schema drift + audit


def test_schema_drift_classifies_columns(spark, tmp_path):
    from pyspark.sql import functions as F

    from kafka_connect_hdfs_spark.snapshots import (
        commit_snapshot, snapshot_schema_drift,
    )

    tbl = str(tmp_path / "t")
    v1 = spark.createDataFrame([(1, "a", 2.0)], "k long, s string, v double")
    commit_snapshot(spark, v1, tbl)
    v2 = v1.select(F.col("k").cast("int").alias("k"), "s").withColumn(
        "w", F.lit(True)
    )
    commit_snapshot(spark, v2, tbl)
    got = {
        r["column"]: (r["change"], r["from_type"], r["to_type"])
        for r in snapshot_schema_drift(spark, tbl, 1, 2).collect()
    }
    assert got == {
        "k": ("type_changed", "bigint", "int"),
        "v": ("removed", "double", None),
        "w": ("added", None, "boolean"),
    }
    # identical versions -> empty report
    assert snapshot_schema_drift(spark, tbl, 1, 1).count() == 0


def test_snapshot_audit_flags_missing_dir(spark, tmp_path):
    """A manifest referencing a vanished data dir must surface as
    n_missing_dirs > 0 with a NULL row count, not a partial count or a
    crash."""
    from kafka_connect_hdfs_spark.snapshots import (
        commit_snapshot, snapshot_audit,
    )

    tbl = str(tmp_path / "t")
    df = spark.range(10).withColumnRenamed("id", "k")
    commit_snapshot(spark, df, tbl)                      # v1
    commit_snapshot(spark, df, tbl, mode="append")       # v2 = v1+v2 dirs
    fs, Path = _hadoop_fs(spark, tbl)
    assert fs.delete(Path(f"{tbl}/data/v1"), True)       # corrupt v1
    got = {
        r["version"]: (r["n_data_dirs"], r["n_missing_dirs"], r["n_rows"])
        for r in snapshot_audit(spark, tbl).collect()
    }
    assert got[1] == (1, 1, None)
    assert got[2] == (2, 1, None)  # v2 references the vanished dir too


def _hadoop_fs(spark, path):
    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(path).getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, Path
