"""End-to-end training-data preparation over a landed corpus.

The composition a 100 TB pretraining pipeline runs nightly, expressed with
this repo's operators (each individually oracle-verified; the composition
itself is gated by the `corpus_e2e_pipeline` query):

    documents
      → quality + token stats        (pure codegen columns)
      → exact dedup (keep min id)    (hash groupBy; text never shuffles)
      → MinHash-LSH near-dup pairs   (banded bucket join, skew-capped)
      → PII scrubbing                (map-side regex)
      → decontamination vs benchmark (shingle overlap join)
      → deterministic train/val/test (hash CASE)
      → sequence packing             (per-shard running-total window)
      → deterministic epoch shuffle  (seeded hash order)
      → partitioned parquet landing  (split=... directories)

Run: python examples/training_pipeline.py  [sf_dir]  [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp() + "/corpus"

    from kafka_connect_hdfs_spark.operators.dedup import (
        dedup_keep_first, minhash_lsh_candidates,
    )
    from kafka_connect_hdfs_spark.operators.packing import (
        scrub_pii, shuffle_order, split_corpus, with_sequence_packing,
    )
    from kafka_connect_hdfs_spark.operators.text import (
        decontaminate_against, with_quality_score, with_token_stats,
    )
    from kafka_connect_hdfs_spark.session import get_spark, load_table

    spark = get_spark("training-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    # 0. rule gate first (Gopher subset): single-pass projection, runs at
    #    scan speed — cheapest filter goes earliest
    from kafka_connect_hdfs_spark.operators.text import gopher_rules

    gated = gopher_rules(docs, min_tokens=5, min_word_len=2.0).filter(
        "keep"
    ).select("doc_id", "text", "lang", "source")

    # 0b. source triage: duplicate-sharing graph centrality flags mirror /
    #     boilerplate-heavy sources (report here; production would damp
    #     their sampling weight)
    from kafka_connect_hdfs_spark.operators.graph import (
        pagerank, shingle_share_edges,
    )

    central = pagerank(shingle_share_edges(gated, max_groups_per_shingle=10))
    print("most central (mirror-suspect) sources:")
    for r in central.orderBy(F.desc("rank")).limit(3).collect():
        print(f"  {r['node']}: {r['rank']}")

    # 0c. corpus-health diagnostics: Zipf fit per source (flat slope =
    #     templated/machine text) and DSIR target-likeness (which raw
    #     docs look most like the curated target source — production
    #     upweights them in the mix)
    from kafka_connect_hdfs_spark.operators.text import (
        dsir_importance_select, zipf_slope,
    )

    for r in zipf_slope(gated, top_n=30).orderBy("source").limit(3).collect():
        print(f"  zipf {r['source']}: slope={r['slope']} r2={r['r2']}")
    dsir = dsir_importance_select(gated, target_source="src0", n_select=50)
    print(f"DSIR: top target-like raw docs selected: {dsir.count()}")

    # 1. stats + quality filter (keep docs with some substance)
    scored = with_quality_score(with_token_stats(gated))
    kept = scored.filter((F.col("ws_tokens") >= 5))

    # 1b. relative quality gate: keep each language's top 80% by heuristic
    #     score (percentile, not absolute threshold — low-resource languages
    #     keep their share)
    from kafka_connect_hdfs_spark.operators.text import quality_percentile_filter

    kept = kept.join(
        quality_percentile_filter(kept, min_percentile=0.2).select("doc_id"),
        "doc_id",
    )

    # 1c. model-based cut: per-language perplexity tail drop (CCNet shape —
    #     corpus-LM scoring + sketch threshold, no per-language sort)
    from kafka_connect_hdfs_spark.operators.text import perplexity_filter

    kept = kept.join(
        perplexity_filter(kept, min_percentile=0.1).select("doc_id"), "doc_id"
    )

    # 2. exact dedup, then near-dup candidate audit (report only here;
    #    production would drop one side of each confirmed pair)
    deduped = dedup_keep_first(kept)
    near = minhash_lsh_candidates(deduped)
    print(f"near-dup candidate pairs: {near.count()}")

    # 2a. substring-level signal: fraction of each doc covered by spans
    #     shared with other docs (Lee et al. substring dedup — trim/drop
    #     boilerplate-assembled docs; report the worst offenders here)
    from kafka_connect_hdfs_spark.operators.dedup import (
        duplicated_span_coverage,
    )

    spans = duplicated_span_coverage(deduped, window=8)
    heavy = spans.filter(F.col("dup_token_coverage") > 0.5)
    print(f"boilerplate-heavy docs (>50% duplicated spans): {heavy.count()}")

    # 2b'. line-level boilerplate removal (CCNet): any normalized line
    #      repeated corpus-wide beyond the threshold is dropped from every
    #      doc — report the boilerplate volume here (the single-line
    #      fixture makes it ≈ exact dedup; real corpora cut 10-30%)
    from kafka_connect_hdfs_spark.operators.dedup import line_dedup

    line_report = line_dedup(deduped, max_occurrences=2)
    dropped = line_report.agg(
        F.sum(F.col("n_lines") - F.col("n_lines_kept")).alias("d")
    ).collect()[0]["d"]
    print(f"boilerplate lines dropped corpus-wide: {dropped}")

    # 2b. repeated-paragraph removal: chunk-level exact dedup with document
    #     reassembly (C4-style; chunk granularity per corpus)
    from kafka_connect_hdfs_spark.operators.dedup import chunk_dedup

    rebuilt = chunk_dedup(deduped, chunk_tokens=16).filter(F.col("n_kept") > 0)
    deduped = deduped.join(rebuilt.select("doc_id", "clean_text"), "doc_id").drop(
        "text"
    ).withColumnRenamed("clean_text", "text")

    # 3. PII scrub + decontamination against a benchmark slice
    #    (decontaminate_against returns CONTAMINATED docs → anti-join them out)
    scrubbed = scrub_pii(deduped)
    benchmark = docs.filter(F.col("doc_id") < 20)
    train_side = scrubbed.filter(F.col("doc_id") >= 20)
    contaminated = decontaminate_against(train_side, benchmark, n=5)
    clean = train_side.join(
        contaminated.select("doc_id"), "doc_id", "anti"
    )

    # 4. split + packing assignment + epoch order. Packing budgets come
    #    from the REAL tokenizer: train the BPE table once (vocab-bounded
    #    collect), apply it corpus-wide as a codegen replace chain
    from kafka_connect_hdfs_spark.operators.text import bpe_encode, bpe_learn

    final = split_corpus(clean)
    merges = [(m[0], m[1]) for m in bpe_learn(final, n_merges=64)]
    tokenized = bpe_encode(final, merges)
    pack = with_sequence_packing(
        tokenized.select("doc_id", F.col("n_bpe_tokens").alias("n_tokens")),
        budget=2048, shards=16,
    )
    ordered = shuffle_order(final, shards=16, seed="epoch0")

    # 4x. tokenizer bake-off: the unigram-LM (SentencePiece-style) encode
    #     gives a second fertility estimate — production picks the
    #     tokenizer whose budget curve packs tighter
    from kafka_connect_hdfs_spark.operators.text import unigram_encode

    uni = unigram_encode(final, vocab_size=32)
    avg_fert = uni.agg(F.round(F.avg("fertility"), 3).alias("f")).collect()
    print(f"unigram-LM mean fertility vs whitespace: {avg_fert[0]['f']}")

    # 4a. mixing plan: epoch-capped token budget per source (data-
    #     constrained scaling — integer waterfill, bit-exact replayable)
    from kafka_connect_hdfs_spark.operators.packing import source_token_budget

    plan = source_token_budget(final, total_budget=100_000, max_epochs=4)
    print("source budget plan (first 3):")
    for r in plan.limit(3).collect():
        print(f"  {r['source']}: {r['alloc_tokens']} tokens ({r['epochs']} epochs)")

    # 4b. curriculum alternative to the flat epoch order: quality tiers
    #     first, deterministic shuffle within each tier
    from kafka_connect_hdfs_spark.operators.packing import curriculum_order

    curriculum = curriculum_order(final, buckets=4)

    # 5. land: documents as a VERSIONED snapshot (yesterday's corpus stays
    #    readable for reproducibility / rollback); packing + order sidecars
    from kafka_connect_hdfs_spark.snapshots import (
        commit_snapshot, read_snapshot,
    )

    version = commit_snapshot(
        spark,
        final.select("doc_id", "text", "lang", "source", "split"),
        f"{out}/documents",
    )
    pack.write.mode("overwrite").parquet(f"{out}/packing")
    ordered.select("doc_id", "shard", "position").write.mode(
        "overwrite"
    ).parquet(f"{out}/epoch0_order")
    curriculum.write.mode("overwrite").parquet(f"{out}/curriculum_order")

    n = read_snapshot(spark, f"{out}/documents", version).count()
    print(f"landed {n} documents to {out} as snapshot v{version}")

    # 5b. tag the release (named ref training jobs pin instead of raw
    #     version numbers) and refresh the per-(lang, split) mart
    #     incrementally — the dashboards read the mart, never the corpus
    from kafka_connect_hdfs_spark.merge import refresh_aggregate
    from kafka_connect_hdfs_spark.snapshots import read_tag, tag_snapshot

    tag_snapshot(spark, f"{out}/documents", "release")
    assert read_tag(spark, f"{out}/documents", "release").count() == n
    mart = refresh_aggregate(
        None,  # bootstrap; nightly runs fold only the day's delta
        read_tag(spark, f"{out}/documents", "release"),
        keys=["lang", "split"],
        count_col="n_docs",
    )
    mart.write.mode("overwrite").parquet(f"{out}/mart_lang_split")
    print(f"tagged v{version} as 'release'; mart rows: {mart.count()}")

    # 6. release health checks: robust length outliers (median/MAD — a
    #    scrape of 10 MB pages can't hide behind an inflated stddev),
    #    weak-label vote census (which LF combinations dominate), and the
    #    PSI drift gate against the previous release
    from kafka_connect_hdfs_spark.operators.quality import (
        psi_drift, robust_length_outliers, weak_label_census,
    )

    released = read_tag(spark, f"{out}/documents", "release").withColumn(
        "n_chars", F.length("text")
    )
    print("robust length outliers per lang (first 3):")
    for r in robust_length_outliers(released).orderBy("lang").limit(3).collect():
        print(
            f"  {r['lang']}: med={r['median_len']} mad={r['mad']} "
            f"outliers={r['n_outliers']}"
        )
    votes = weak_label_census(released)
    kept = votes.filter(F.col("decision") == "keep").agg(
        F.sum("n_docs")
    ).collect()[0][0]
    print(f"weak-label census: {kept} docs vote 'keep'")
    halves = released.withColumn("value", F.col("n_chars").cast("double"))
    drift = psi_drift(
        halves.filter(F.col("doc_id") % 2 == 0),
        halves.filter(F.col("doc_id") % 2 == 1),
    )
    psi = drift.agg(F.round(F.sum("psi_contrib"), 6).alias("psi")).collect()
    print(f"release-half length PSI (same-release halves, small-n): {psi[0]['psi']}")
    spark.stop()


if __name__ == "__main__":
    main()
