"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE
compact JSON line LAST — {"metric", "value", "unit", "sf", "n_queries",
"detail"} — and writes the per-query timing map to BENCH_DETAIL.json
(committed) so the driver's tail capture always parses the headline.

Each query is executed to completion (count() forces the full plan; results
stay distributed — no collect of data rows).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entrymod
    from kafka_connect_hdfs_spark.session import get_spark

    spark = get_spark("kchs-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = [
        "q1_pricing_summary",
        "q3_unshipped_orders",
        "q5_local_supplier_volume",
        "q6_forecast_revenue",
        "q17_small_quantity",
        "q_top_events_per_user",
        "q_event_type_rollup",
        "q_sessionize",
        "asof_last_signup",
        "p3_hourly_partition",
        "f1_rotation_manifest",
        "dedup_exact",
        "dedup_minhash_lsh",
        "text_token_stats",
        "ann_topk_bruteforce",
        "media_features",
        "q7_volume_shipping",
        "q_window_suite",
        "ann_quantized_topk",
        "text_decontaminate",
        "corpus_pack_sequences",
        "text_tfidf",
        "text_pii_scrub",
        "text_normalize",
        "corpus_e2e_pipeline",
        "corpus_weighted_sample",
        "dedup_incremental",
        "cdc_latest_state",
        "q_hll_distinct_users",
        "embedding_dim_stats",
        "dedup_chunks",
        "q_rolling_7d_revenue",
        "ann_pq_topk",
        # r3 additions: the heaviest previously-unbenched operators, so
        # round-over-round comparisons cover the full surface
        "ann_ivfpq_topk",
        "dedup_incremental_neardup",
        "q_peak_concurrency",
        "dedup_fuzzy_prefix",
        "q_scd2_dimension",
        # r3 batch B: new operators benched on arrival
        "semantic_dedup_flags",
        "corpus_chunk_overlap",
        "text_strip_markup",
        "ann_filtered_topk",
        "corpus_temperature_mix",
        "q_source_report",
        "ann_index_serve",
        "ann_hard_negatives",
        "ann_cell_stats",
        "ann_label_mrr",
        "dedup_lsh_eval",
        "q_session_sequences",
        "corpus_pack_manifest",
        "dedup_prefix_jaccard",
        "dedup_semantic_text",
        "text_bm25",
        "text_hybrid_search",
        "corpus_e2e_pipeline_v2",
        "text_vocab_drift",
        "ann_triplets",
        # r3 batch C: graph, tokenizer-training, mining, curriculum ops
        # benched on arrival
        "graph_source_pagerank",
        "graph_covisit_pagerank",
        "text_bpe_pairs",
        "corpus_curriculum",
        "q_event_transitions",
        "bitext_mine_margin",
        "embedding_covariance",
        "ann_mmr_rerank",
        "q_hll_set_overlap",
        "text_gopher_rules",
        "graph_triangle_count",
        "graph_source_jaccard",
        "text_ngram_novelty",
        "embedding_outliers",
        "dedup_containment",
        "corpus_datacard",
        "q_customer_rfm",
        "q_basket_lift",
        "text_bm25_batch",
        "text_kwic",
        "q_hourly_anomalies",
        "ann_label_ndcg",
        "q_split_leakage",
        "q_conversion_attribution",
        "semantic_threshold_sweep",
        "text_bigram_logprob",
        "dedup_star_clusters",
        "q_first_touch_attribution",
        "corpus_reduction_report",
        "text_lang_confusion",
        "dedup_cluster_sizes",
        "corpus_split_balance",
        # r4 additions: benched on arrival
        "text_bpe_encode",
        "text_quality_filter_approx",
        "text_unk_replace_join",
        "corpus_pack_bpe",
        "graph_kcore",
        "dedup_span_coverage",
        "corpus_source_budget",
        "text_bpe_fertility",
        "text_clf_filter",
        "ann_knn_graph",
        "semantic_knn_clusters",
        "ann_knn_refine",
        "ops_wap_publish",
        "text_perplexity_filter",
        "stream_windowed_counts",
        "stream_sessionize",
    ]
    qs = entrymod.queries()
    # ann_index_serve (the correctness gate) conflates the ONE-TIME index
    # build (two parquet writes) with the serve path it plan-guards — the
    # r04 bench read a 2.3x "regression" that was entirely the rebuild.
    # Bench them as SEPARATE entries (VERDICT r04 item 4): the serve
    # entry reads an index pre-built once outside the timed region (at
    # 100 TB the index is built once and served many), and the build cost
    # gets its own explicit entry instead of hiding inside the serve one.
    import tempfile

    from kafka_connect_hdfs_spark.operators.similarity import (
        build_ivf_index, query_ivf_index,
    )

    _served_idx = tempfile.mkdtemp(prefix="kchs_bench_ivf_") + "/idx"
    build_ivf_index(entrymod._emb(spark, sf_dir), _served_idx, n_seeds=8)

    # one untimed warm serve: the first read of a fresh index pays
    # partition discovery + codegen (~3x steady-state; measured 5.4 s
    # then 1.8 s flat at sf0.1) — steady-state latency is the serve
    # metric, the one-time listing belongs to the build
    query_ivf_index(spark, _served_idx, list(range(10)), k=5, n_probe=1).count()

    def _bench_index_build(spark, sf_dir):
        p = tempfile.mkdtemp(prefix="kchs_bench_ivfb_") + "/idx"
        build_ivf_index(entrymod._emb(spark, sf_dir), p, n_seeds=8)
        return spark.read.parquet(p + "/_seeds")

    def _bench_index_serve(spark, sf_dir):
        return query_ivf_index(
            spark, _served_idx, list(range(10)), k=5, n_probe=1
        ).orderBy("query_id", "rank")

    qs = dict(qs)
    qs["ann_index_serve"] = _bench_index_serve
    qs["ann_index_build"] = _bench_index_build

    # media fixture caching (VERDICT r11 item 5): the five media gates
    # build their synthetic binary corpus (PNG zlib deflate + JPEG
    # Huffman + WAV encode) INSIDE the gate, so their bench timings were
    # ~60-100% fixture-encode cost (media_audio_spectrum 0.87->2.07 s in
    # r11 was 100% the new PNG tier's encode). Build each corpus ONCE to
    # parquet here, time that build as its own explicit entries, and
    # point the media entries at the cached corpus — the same
    # build/serve split as the ann index above. Correctness gates are
    # untouched (the driver still runs the self-contained versions).
    from kafka_connect_hdfs_spark.operators.multimodal import (
        synthetic_container_corpus, synthetic_media_corpus,
        synthetic_sine_corpus, synthetic_video_corpus,
    )

    _media_pq = tempfile.mkdtemp(prefix="kchs_bench_media_") + "/corpus"
    _sine_pq = tempfile.mkdtemp(prefix="kchs_bench_media_") + "/sine"
    _video_pq = tempfile.mkdtemp(prefix="kchs_bench_media_") + "/video"
    synthetic_media_corpus(entrymod._docs(spark, sf_dir)).write.parquet(
        _media_pq
    )
    synthetic_sine_corpus(entrymod._docs(spark, sf_dir)).write.parquet(
        _sine_pq
    )
    synthetic_video_corpus(entrymod._docs(spark, sf_dir)).write.parquet(
        _video_pq
    )
    _container_pq = tempfile.mkdtemp(prefix="kchs_bench_media_") + "/cont"
    synthetic_container_corpus(entrymod._docs(spark, sf_dir)).write.parquet(
        _container_pq
    )

    def _cached_media(fn, path):
        def run(spark, sf_dir):
            return fn(spark, sf_dir, corpus=spark.read.parquet(path))
        return run

    for _name, _path in [
        ("media_decode_stats", _media_pq),
        ("media_image_gradients", _media_pq),
        ("media_image_resize", _media_pq),
        ("media_audio_resample", _media_pq),
        ("media_audio_spectrum", _sine_pq),
        ("media_video_frames", _video_pq),
        ("media_container_probe", _container_pq),
    ]:
        qs[_name] = _cached_media(getattr(entrymod, f"_q_{_name}"), _path)

    def _bench_media_corpus_build(spark, sf_dir):
        p = tempfile.mkdtemp(prefix="kchs_bench_mediab_") + "/c"
        synthetic_media_corpus(entrymod._docs(spark, sf_dir)).write.parquet(p)
        return spark.read.parquet(p).select("media_id")

    def _bench_sine_corpus_build(spark, sf_dir):
        p = tempfile.mkdtemp(prefix="kchs_bench_mediab_") + "/s"
        synthetic_sine_corpus(entrymod._docs(spark, sf_dir)).write.parquet(p)
        return spark.read.parquet(p).select("media_id")

    def _bench_video_corpus_build(spark, sf_dir):
        p = tempfile.mkdtemp(prefix="kchs_bench_mediab_") + "/v"
        synthetic_video_corpus(entrymod._docs(spark, sf_dir)).write.parquet(p)
        return spark.read.parquet(p).select("media_id")

    def _bench_container_corpus_build(spark, sf_dir):
        p = tempfile.mkdtemp(prefix="kchs_bench_mediab_") + "/k"
        synthetic_container_corpus(
            entrymod._docs(spark, sf_dir)
        ).write.parquet(p)
        return spark.read.parquet(p).select("media_id")

    qs["media_corpus_build"] = _bench_media_corpus_build
    qs["container_corpus_build"] = _bench_container_corpus_build
    qs["sine_corpus_build"] = _bench_sine_corpus_build
    qs["video_corpus_build"] = _bench_video_corpus_build
    # full-registry coverage: every gated query is benched — the explicit
    # list above keeps round-over-round comparability for the long-lived
    # entries, everything else appends in registry order so the per-query
    # budget guard (tests/test_bench_budget.py) covers the whole surface.
    # stream_* entries are EXCLUDED: they measure micro-batch trigger
    # latency (wall-clock waits), not batch throughput — correctness gates
    # still run them; benching them triples a fixed ~60 s of waiting.
    headline += [
        name
        for name in qs
        if name not in set(headline) and not name.startswith("stream_")
    ]
    headline = [n for n in headline if not n.startswith("stream_")]
    # JVM/codegen + file-listing + Python-worker-pool warmup so timings
    # measure the queries, not one-time process startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    qs["q1_pricing_summary"](spark, sf_dir).count()

    # 2 runs per query (keep the larger -> conservative), because the
    # shared-host VM shows 2-4x single-run noise; raise via
    # SPARK_GRAFT_BENCH_REPEATS for a quiet-machine median-of-3.
    # Queries whose FIRST run exceeds 3 s get a second run with the MIN
    # kept (VERDICT r04 item 6): single-run timings in that tier swung
    # 2-4x round-over-round and made regression diffs mostly noise — the
    # min of two runs is the stable "how fast can this plan go" number,
    # while sub-3 s entries keep the conservative larger-of-two.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))

    def _clear_persisted() -> None:
        # localCheckpoint()-ed RDDs accumulate across a 200-query session
        # (operators checkpoint per round and never unpersist); left alone
        # they grow executor memory and GC pressure until late-suite
        # queries measure 3-8x slower than standalone. Dropping them
        # between queries keeps every measurement a fresh-session number.
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        spark.catalog.clearCache()

    timings: dict[str, float] = {}
    raw_runs: dict[str, list[float]] = {}
    for name in headline:
        fn = qs[name]
        runs = []
        for i in range(max(repeats, 2)):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
            _clear_persisted()
            if runs[0] > 3.0 and len(runs) >= 2:
                break
        # raw per-run pairs recorded alongside the aggregate (VERDICT r05
        # item 7): round-over-round diffs of the mixed max-of-2/min-of-2
        # aggregate required archaeology without them
        raw_runs[name] = [round(r, 3) for r in runs]
        if runs[0] > 3.0:
            timings[name] = round(min(runs), 3)  # two-run min: stable tier
        else:
            timings[name] = round(sorted(runs)[len(runs) // 2], 3)

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Per-query timings go to a committed side file; stdout gets ONLY a
    # compact headline object, printed LAST. (r03's single giant JSON line
    # outgrew the driver's tail capture and clipped the `value` key —
    # BENCH_r03.json recorded `parsed: null`.)
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    # one-shot 10x scale proof (scripts/scale_proof.py) rides along so the
    # per-round BENCH record carries the measured scaling factors
    scale_proof = None
    scale_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALE.json"
    )
    if os.path.exists(scale_path):
        try:
            with open(scale_path) as fh:
                scale_proof = json.load(fh)
        except Exception:  # noqa: BLE001 - sidecar is best-effort
            scale_proof = None
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "sf": sf_val,
                "scale_proof": scale_proof,
                "n_queries": len(timings),
                "timing_note": (
                    "sub-3s entries: larger of 2 runs (conservative); "
                    ">3s entries: MIN of 2 runs (single runs in this tier "
                    "swing 2-4x on the shared VM, so round-over-round "
                    "diffs of single-run numbers are mostly noise); "
                    "ann_index_serve times ONLY the partition-pruned "
                    "serve read against a pre-built index, build cost is "
                    "the separate ann_index_build entry; r12: the five "
                    "media_* entries likewise read a corpus pre-built "
                    "once (media_corpus_build / sine_corpus_build are "
                    "the explicit encode-cost entries), so media gate "
                    "timings measure the OPERATOR, not repeated "
                    "PNG/JPEG/WAV fixture encoding. r11 A/B of the "
                    "two r10 movers (3 interleaved runs, quiet machine, "
                    "code unchanged r09->r10 per git): corpus_rehydrate "
                    "0.72-0.79s (r10's 1.26 was noise), "
                    "bitext_mine_margin stable 2.66-2.73s (the r09 1.95 "
                    "was the outlier run, not a regression). r12 A/B of "
                    "the two r11 movers (same 3-interleaved-runs "
                    "protocol; text.py/similarity.py unchanged in r11 "
                    "per git diff --stat): text_hot_ngrams 2.96-3.28s "
                    "(r11's 5.38 was noise, r10's 3.15 is the real "
                    "level) and embedding_covariance 2.45-2.61s (r11's "
                    "4.56 was noise) - both shared-VM swings, no code "
                    "action taken. r13 A/B of the r12 mover "
                    "corpus_source_overlap (two fresh sessions x 3 "
                    "interleaved runs; dedup.py untouched r12-r13 per "
                    "git): 1.95-3.63s observed, floor ~2.0s - r11's "
                    "1.54 and r12's 2.79 both sit inside the swing "
                    "band, shared-VM noise, no code action. "
                    "ops_snapshot_audit's r12 1.14->2.01s is PRICED, "
                    "not noise: the audit now computes the "
                    "tombstone-applied LIVE row count per version (r11 "
                    "verdict item 7 capability change, +~0.9s on this "
                    "gate only); r13 media entries additionally read "
                    "the cached container corpus "
                    "(container_corpus_build is its encode-cost entry). "
                    "Late-r13 PRICED change: delete_rows/commit_changes "
                    "gained a write-time NULL-key refusal (one tiny "
                    "driver job per delete commit), so the delete-"
                    "machinery gates (ops_row_delta, ops_row_deletes, "
                    "ops_changelog_scan) carry ~+0.1-0.2s per delete "
                    "commit in their fixtures - enforcement cost, not "
                    "regression; the mirror-tick contract checks are "
                    "free (feed localCheckpoint, BENCH_SCALE "
                    "mirror_table_tick factor 1.11)"
                ),
                "queries": timings,
                "runs": raw_runs,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    print(
        json.dumps(
            {
                "metric": "headline-suite wall time, local[%s]"
                % os.environ.get("SPARK_GRAFT_CPUS", "32"),
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "detail": "BENCH_DETAIL.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
