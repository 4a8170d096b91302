"""Round-3 operators: LSH Jaccard estimates, cluster representatives,
hot-n-gram span removal, per-language token budgets."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_lsh_jaccard_estimate_exact_dup_scores_one(spark):
    from kafka_connect_hdfs_spark.operators.dedup import lsh_jaccard_estimates

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "completely different text about spark query planning"),
        ],
        "doc_id long, text string",
    )
    rows = lsh_jaccard_estimates(docs, num_hashes=8, bands=4).collect()
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in rows}
    assert pairs[(1, 2)] == 1.0  # identical shingle sets agree on every hash
    assert (1, 3) not in pairs and (2, 3) not in pairs  # never bucket together


def test_lsh_jaccard_estimate_threshold_filters(spark):
    from kafka_connect_hdfs_spark.operators.dedup import lsh_jaccard_estimates
    from kafka_connect_hdfs_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    all_pairs = lsh_jaccard_estimates(
        docs, num_hashes=8, bands=4, max_bucket_size=100, min_estimate=0.0
    )
    strict = lsh_jaccard_estimates(
        docs, num_hashes=8, bands=4, max_bucket_size=100, min_estimate=0.5
    )
    n_all, n_strict = all_pairs.count(), strict.count()
    assert n_all >= n_strict > 0
    assert strict.filter(F.col("est_jaccard") < 0.5).count() == 0


def test_cluster_representatives_quality_and_singletons(spark):
    from kafka_connect_hdfs_spark.operators.dedup import cluster_representatives

    # cluster {1,2,3}: 2 has the cleanest text; 4 is a singleton
    docs = spark.createDataFrame(
        [
            (1, "en", "zzz zzz zzz !!! ??? ..."),
            (2, "en", "the quick brown fox is a clean readable sentence"),
            (3, "en", "qqq qqq qqq ### $$$"),
            (4, "en", "a lone document with no duplicate anywhere"),
        ],
        "doc_id long, lang string, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    reps = {r["cluster_id"]: r for r in cluster_representatives(docs, pairs).collect()}
    assert set(reps) == {1, 4}  # cluster label = min member id; 4 singleton
    assert reps[1]["rep_doc_id"] == 2 and reps[1]["n_members"] == 3
    assert reps[4]["rep_doc_id"] == 4 and reps[4]["n_members"] == 1


def test_cluster_representatives_tie_breaks_lowest_id(spark):
    from kafka_connect_hdfs_spark.operators.dedup import cluster_representatives

    docs = spark.createDataFrame(
        [(7, "same exact text here"), (9, "same exact text here")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(7, 9)], "id_a long, id_b long")
    reps = cluster_representatives(docs, pairs).collect()
    assert len(reps) == 1 and reps[0]["rep_doc_id"] == 7


def test_remove_hot_ngrams_cuts_covered_spans(spark):
    from kafka_connect_hdfs_spark.operators.text import remove_hot_ngrams

    boiler = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [(i, f"{boiler} article body {i}") for i in range(5)]
        + [(99, "unique document with no boilerplate at all")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_hot_ngrams(docs, n=3, hot_threshold=5, top_k_hot=16).collect()
    }
    # every trigram inside "subscribe to our newsletter article body" is
    # shared by all 5 docs (the final "body <i>" gram is unique), so the
    # hot spans cover tokens 0-5 and only the distinct trailing "<i>" stays
    assert out[0]["n_removed"] == 6 and out[0]["n_tokens"] == 7
    assert out[99]["n_removed"] == 0
    # identical remaining text ("article body i" differs only by i) -> distinct fps
    assert out[0]["cleaned_fp"] != out[1]["cleaned_fp"]


def test_remove_hot_ngrams_no_hot_grams_is_identity(spark):
    from kafka_connect_hdfs_spark.operators.text import remove_hot_ngrams

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    out = remove_hot_ngrams(docs, n=3, hot_threshold=2).collect()
    assert all(r["n_removed"] == 0 for r in out)


def test_token_budget_sample_respects_budget(spark):
    from kafka_connect_hdfs_spark.operators.packing import token_budget_sample
    from kafka_connect_hdfs_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    t = F.trim(F.col("text"))
    with_tokens = docs.select(
        "doc_id",
        "lang",
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .alias("n_tokens"),
    )
    kept = token_budget_sample(with_tokens, budget=4000, shards=2)
    per_shard = kept.groupBy("lang", "shard").agg(F.max("cum_tokens").alias("m"))
    assert per_shard.filter(F.col("m") > 2000).count() == 0  # budget/shards
    assert kept.count() > 0
    # deterministic: same seed -> same kept set
    again = token_budget_sample(with_tokens, budget=4000, shards=2)
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_token_budget_sample_keeps_everything_under_budget(spark):
    from kafka_connect_hdfs_spark.operators.packing import token_budget_sample

    docs = spark.createDataFrame(
        [(1, "de", 100), (2, "de", 200), (3, "fr", 50)],
        "doc_id long, lang string, n_tokens long",
    )
    kept = token_budget_sample(docs, budget=100000, shards=1)
    assert kept.count() == 3  # nothing cut when the budget covers all
