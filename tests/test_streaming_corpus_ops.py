"""The corpus operators are stateless column transforms, so they must
compose with Structured Streaming unchanged (the property that makes the
batch pipeline reusable for continuous ingestion): stream the documents
fixture through quality scoring + token stats + fingerprinting and assert
the result matches the batch run exactly."""

from __future__ import annotations

from pyspark.sql import functions as F


def _doc_stream(spark, tmp_path, docs, n_files=3):
    path = f"{tmp_path}/docs_src"
    docs.repartition(n_files).write.mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    )


def test_corpus_scoring_composes_with_streaming(spark, tmp_path):
    from kafka_connect_hdfs_spark.operators.text import (
        with_fingerprint, with_quality_score, with_token_stats,
    )
    from kafka_connect_hdfs_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")

    def pipeline(df):
        scored = with_quality_score(with_token_stats(df))
        return with_fingerprint(scored).select(
            "doc_id", "ws_tokens", "bpe_tokens", "quality_score", "fingerprint"
        )

    stream = _doc_stream(spark, tmp_path, docs)
    q = (
        pipeline(stream)
        .writeStream.format("memory")
        .queryName("corpus_stream_out")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{tmp_path}/chk")
        .start()
    )
    q.awaitTermination(120)

    batch = {
        r["doc_id"]: (r["ws_tokens"], r["bpe_tokens"], r["quality_score"], r["fingerprint"])
        for r in pipeline(docs).collect()
    }
    streamed = spark.sql("SELECT * FROM corpus_stream_out").collect()
    assert len(streamed) == len(batch)
    for r in streamed:
        assert batch[r["doc_id"]] == (
            r["ws_tokens"], r["bpe_tokens"], r["quality_score"], r["fingerprint"]
        ), r["doc_id"]


def test_streaming_quality_gate_filters_inline(spark, tmp_path):
    """An absolute-threshold quality gate (the streaming-safe variant of the
    percentile gate, which needs a global rank and is batch-only) drops the
    same documents the batch filter drops."""
    from kafka_connect_hdfs_spark.operators.text import with_quality_score
    from kafka_connect_hdfs_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    thresh = 0.55

    stream = _doc_stream(spark, tmp_path, docs)
    q = (
        with_quality_score(stream)
        .filter(F.col("quality_score") >= thresh)
        .select("doc_id")
        .writeStream.format("memory")
        .queryName("gate_out")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{tmp_path}/chk2")
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM gate_out").collect()}
    want = {
        r["doc_id"]
        for r in with_quality_score(docs)
        .filter(F.col("quality_score") >= thresh)
        .select("doc_id")
        .collect()
    }
    assert got == want and 0 < len(want) < docs.count()


def test_streaming_windowed_approx_distinct(spark, tmp_path):
    """Tumbling-window approximate distinct users under streaming append
    mode: every finalized window's HLL estimate must equal the batch
    estimate for the same window (same sketch, same data → identical)."""
    from kafka_connect_hdfs_spark.session import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    src = f"{tmp_path}/src"
    ev.repartition(2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )

    def windowed(df):
        return (
            df.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "6 hours"), F.col("event_type"))
            .agg(F.approx_count_distinct("user_id").alias("approx_users"))
            .select(
                F.col("window.start").alias("w_start"),
                "event_type",
                "approx_users",
            )
        )

    q = (
        windowed(stream)
        .writeStream.format("memory")
        .queryName("hll_win_out")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch = {
        (r["w_start"], r["event_type"]): r["approx_users"]
        for r in windowed(ev).collect()
    }
    emitted = spark.sql("SELECT * FROM hll_win_out").collect()
    assert emitted, "watermark should finalize at least one window"
    for r in emitted:
        assert batch[(r["w_start"], r["event_type"])] == r["approx_users"]


def test_streaming_quarantine_lands_good_and_bad(spark, tmp_path):
    """DLQ under streaming: each micro-batch splits via
    parse_with_quarantine inside foreachBatch and lands the two sides to
    separate dirs — nothing lost, nothing misrouted."""
    from kafka_connect_hdfs_spark.sources import parse_with_quarantine

    rows = [(i, '{"k": %d}' % i) if i % 3 else (i, "garbage %d" % i)
            for i in range(60)]
    df = spark.createDataFrame(rows, "id long, value string")
    src = f"{tmp_path}/src"
    df.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    good_dir, bad_dir = f"{tmp_path}/good", f"{tmp_path}/bad"

    def land(batch_df, batch_id):
        good, bad = parse_with_quarantine(batch_df, "k bigint")
        good.write.mode("append").parquet(good_dir)
        bad.write.mode("append").parquet(bad_dir)

    q = (
        stream.writeStream.foreachBatch(land)
        .option("checkpointLocation", f"{tmp_path}/chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    good_back = spark.read.parquet(good_dir)
    bad_back = spark.read.parquet(bad_dir)
    assert good_back.count() == 40 and bad_back.count() == 20
    # good side parsed correctly; bad side preserved raw for replay
    assert {r["k"] for r in good_back.collect()} == {i for i in range(60) if i % 3}
    assert all(r["value"].startswith("garbage") for r in bad_back.collect())


def test_strip_markup_and_chunker_compose_with_streaming(spark, tmp_path):
    """The r3 map-side operators (markup strip, overlap chunker) are
    stateless column transforms, so streaming them file-by-file must
    produce exactly the batch result — including the chunker's row
    fan-out (posexplode under a streaming plan)."""
    from kafka_connect_hdfs_spark.operators.packing import chunk_with_overlap
    from kafka_connect_hdfs_spark.operators.text import strip_markup
    from kafka_connect_hdfs_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    wrapped = docs.select(
        "doc_id", F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>")).alias("text")
    )

    def pipeline(df):
        cleaned = strip_markup(df).select("doc_id", F.col("clean_text").alias("text"))
        return chunk_with_overlap(cleaned, window=16, stride=8).select(
            "doc_id", "chunk_idx", "n_chunk_tokens", F.md5("chunk_text").alias("fp")
        )

    stream = _doc_stream(spark, tmp_path, wrapped)
    q = (
        pipeline(stream)
        .writeStream.format("memory")
        .queryName("r3_stateless_out")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{tmp_path}/chk3")
        .start()
    )
    q.awaitTermination(120)
    batch = {
        (r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["fp"])
        for r in pipeline(wrapped).collect()
    }
    streamed = spark.sql("SELECT * FROM r3_stateless_out").collect()
    assert len(streamed) == len(batch) > 0
    for r in streamed:
        assert batch[(r["doc_id"], r["chunk_idx"])] == (r["n_chunk_tokens"], r["fp"])


def test_streaming_vector_ingest_into_ivf_index(spark, tmp_path):
    """Continuous embedding ingest: an initial index plus micro-batch
    appends via foreachBatch must serve exactly what a one-shot batch
    build serves — the vector-pipeline analog of the landing append."""
    from kafka_connect_hdfs_spark.operators.similarity import (
        append_to_ivf_index, build_ivf_index, query_ivf_index,
    )
    from kafka_connect_hdfs_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    full_path = f"{tmp_path}/full"
    build_ivf_index(emb, full_path, n_seeds=8)

    stream_path = f"{tmp_path}/stream_idx"
    base = emb.filter(F.col("vec_id") < 100)
    build_ivf_index(base, stream_path, n_seeds=8)
    src = f"{tmp_path}/src"
    emb.filter(F.col("vec_id") >= 100).repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch_df, _id: append_to_ivf_index(spark, batch_df, stream_path)
        )
        .option("checkpointLocation", f"{tmp_path}/chk_idx")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    key = lambda df: sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
        for r in df.collect()
    )
    assert key(query_ivf_index(spark, stream_path, list(range(10)), k=5)) == key(
        query_ivf_index(spark, full_path, list(range(10)), k=5)
    )


def test_gopher_gate_composes_with_streaming(spark, tmp_path):
    """The Gopher rule gate is a single-pass projection, so the streaming
    run must produce exactly the batch keep/drop decisions — the property
    that lets continuous ingestion apply the same corpus QA inline."""
    from kafka_connect_hdfs_spark.operators.text import gopher_rules
    from kafka_connect_hdfs_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")

    def pipeline(df):
        return gopher_rules(df, min_tokens=30, max_tokens=80).select(
            "doc_id", "n_tokens", "drop_reason", "keep"
        )

    stream = _doc_stream(spark, tmp_path, docs)
    q = (
        pipeline(stream)
        .writeStream.format("memory")
        .queryName("gopher_stream_out")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{tmp_path}/chk_gopher")
        .start()
    )
    q.awaitTermination(120)

    batch = {
        r["doc_id"]: (r["n_tokens"], r["drop_reason"], r["keep"])
        for r in pipeline(docs).collect()
    }
    streamed = spark.sql("SELECT * FROM gopher_stream_out").collect()
    assert len(streamed) == len(batch)
    for r in streamed:
        assert batch[r["doc_id"]] == (r["n_tokens"], r["drop_reason"], r["keep"])


def test_bpe_encode_composes_with_streaming(spark, tmp_path):
    """bpe_encode's expression-chain path is a stateless projection, so it
    must produce identical tokenizations under readStream — the property
    that lets the serving tokenizer run on the continuous ingest path."""
    from kafka_connect_hdfs_spark.operators.text import bpe_encode
    from kafka_connect_hdfs_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    merges = [("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"), ("k", "e")]

    def pipeline(df):
        return bpe_encode(df, merges).select("doc_id", "n_bpe_tokens")

    stream = _doc_stream(spark, tmp_path, docs)
    q = (
        pipeline(stream)
        .writeStream.format("memory")
        .queryName("bpe_stream_out")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{tmp_path}/chk_bpe")
        .start()
    )
    q.awaitTermination(120)

    batch = {r["doc_id"]: r["n_bpe_tokens"] for r in pipeline(docs).collect()}
    streamed = spark.sql("SELECT * FROM bpe_stream_out").collect()
    assert len(streamed) == len(batch)
    for r in streamed:
        assert batch[r["doc_id"]] == r["n_bpe_tokens"], r["doc_id"]
