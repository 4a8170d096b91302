"""Steady-state streaming bench lane (r09 VERDICT item 6): stream_* gates
are excluded from BENCH_DETAIL because a micro-batch run's wall clock is
dominated by trigger scheduling, not fold work — this script measures the
per-batch numbers that matter instead: fold cost per micro-batch
(durationMs.addBatch — the data-plane work; triggerExecution carried
alongside for the full trigger) and the state footprint per monitor
(state-store rows for the stateful operators, persisted mart rows for the
foreachBatch grid monitors) over a FIXED batch count.

Method: each monitor replays the same sf0.1 events subset as an
8-file file-stream (maxFilesPerTrigger=1, availableNow → exactly 8
deterministic micro-batches, no idle trigger waits), then the per-batch
metrics come from the query's recentProgress — Spark's own
instrumentation, not wall-clock bracketing.

Writes BENCH_STREAM.json at the repo root; budget-guarded by
tests/test_bench_budget.py::test_stream_batch_budget.

Usage: python scripts/stream_bench.py [sf_dir] [n_files]
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def _batch_stats(query, state_rows_override=None) -> dict:
    """Per-batch metrics from recentProgress: only batches that actually
    processed rows (availableNow can emit a trailing empty commit)."""
    progs = [p for p in query.recentProgress if p.get("numInputRows", 0) > 0]
    add_ms = [
        int((p.get("durationMs") or {}).get("addBatch", 0)) for p in progs
    ]
    trig_ms = [
        int((p.get("durationMs") or {}).get("triggerExecution", 0))
        for p in progs
    ]
    rows = [int(p.get("numInputRows", 0)) for p in progs]
    state_rows = state_rows_override
    if state_rows is None and progs:
        ops = progs[-1].get("stateOperators") or []
        state_rows = sum(int(o.get("numRowsTotal", 0)) for o in ops)
    total_ms = sum(add_ms) or 1
    return {
        "n_batches": len(progs),
        "rows_total": sum(rows),
        "addbatch_ms_median": int(statistics.median(add_ms)) if add_ms else 0,
        "addbatch_ms_max": max(add_ms) if add_ms else 0,
        "trigger_ms_median": int(statistics.median(trig_ms)) if trig_ms else 0,
        "state_rows_final": int(state_rows or 0),
        "fold_rows_per_sec": round(sum(rows) / (total_ms / 1000.0), 1),
    }


def _mk_source(spark, sf_dir: str, n_files: int, cols, flt=None):
    from kafka_connect_hdfs_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    if flt is not None:
        ev = ev.filter(flt)
    base = tempfile.mkdtemp(prefix="kchs_sbench_")
    src = f"{base}/src"
    ev.select(*cols).repartition(n_files).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    return base, stream


def main() -> None:
    import uuid

    from pyspark.sql import functions as F

    from kafka_connect_hdfs_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("kchs-streambench")
    spark.sparkContext.setLogLevel("ERROR")
    # the stateful sessionizer's processing-time timeouts fire extra
    # zero-row batches under availableNow; the default 100-entry
    # recentProgress ring would drop the DATA batches before we read
    # them — keep the whole run
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "5000")
    # Python-worker + codegen warmup so batch 0 doesn't carry process
    # startup (the same convention as bench.py)
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    out: dict = {}

    # --- grid drift monitors (foreachBatch mart fold; state = mart rows)
    from kafka_connect_hdfs_spark.streaming.drift import (
        start_ks_grid_refresh, start_psi_bucket_refresh,
    )

    base, stream = _mk_source(
        spark, sf_dir, n_files, ["value"], F.col("event_id") % 2 == 1
    )
    q = start_ks_grid_refresh(stream, f"{base}/grid", "value", f"{base}/chk")
    q.awaitTermination(600)
    grid_rows = spark.read.parquet(f"{base}/grid").count()
    out["ks_grid_monitor"] = _batch_stats(q, state_rows_override=grid_rows)
    shutil.rmtree(base, ignore_errors=True)

    base, stream = _mk_source(
        spark, sf_dir, n_files, ["value"], F.col("event_id") % 2 == 1
    )
    q = start_psi_bucket_refresh(
        stream, f"{base}/grid", "value", f"{base}/chk", lo=0.0, hi=1000.0
    )
    q.awaitTermination(600)
    grid_rows = spark.read.parquet(f"{base}/grid").count()
    out["psi_bucket_monitor"] = _batch_stats(q, state_rows_override=grid_rows)
    shutil.rmtree(base, ignore_errors=True)

    # --- stateful operators (state-store rows from stateOperators)
    from kafka_connect_hdfs_spark.streaming.windowed import (
        windowed_event_counts,
    )

    base, stream = _mk_source(
        spark, sf_dir, n_files, ["event_id", "event_type", "ts", "value"]
    )
    name = "sbench_win_" + uuid.uuid4().hex[:8]
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{base}/chk")
        .start()
    )
    q.awaitTermination(600)
    out["windowed_counts"] = _batch_stats(q)
    shutil.rmtree(base, ignore_errors=True)

    from kafka_connect_hdfs_spark.streaming.stateful import (
        streaming_sessionize,
    )

    base, stream = _mk_source(
        spark, sf_dir, n_files, ["user_id", "ts", "value"]
    )
    name = "sbench_sess_" + uuid.uuid4().hex[:8]
    q = (
        streaming_sessionize(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{base}/chk")
        .start()
    )
    q.awaitTermination(600)
    out["sessionize"] = _batch_stats(q)
    shutil.rmtree(base, ignore_errors=True)

    # --- incremental-mart lanes (r10 VERDICT item 6: the per-batch fold
    # cost IS the incremental-mart story's claim; state = persisted mart
    # rows, key-cardinality-bounded)
    from kafka_connect_hdfs_spark.streaming.mart import start_mart_refresh

    base, stream = _mk_source(
        spark, sf_dir, n_files, ["event_type", "ts", "value"]
    )
    q = start_mart_refresh(
        stream.withColumn("day", F.to_date("ts")).drop("ts"),
        f"{base}/mart",
        ["event_type", "day"],
        f"{base}/chk",
        count_col="n_rows",
        sum_cols={"value": "total_value"},
    )
    q.awaitTermination(600)
    mart_rows = spark.read.parquet(f"{base}/mart").count()
    out["mart_refresh"] = _batch_stats(q, state_rows_override=mart_rows)
    shutil.rmtree(base, ignore_errors=True)

    from kafka_connect_hdfs_spark.streaming.sketch import start_cms_refresh

    base, stream = _mk_source(spark, sf_dir, n_files, ["user_id"])
    q = start_cms_refresh(stream, f"{base}/cms", "user_id", f"{base}/chk")
    q.awaitTermination(600)
    cms_rows = spark.read.parquet(f"{base}/cms").count()
    out["cms_topk"] = _batch_stats(q, state_rows_override=cms_rows)
    shutil.rmtree(base, ignore_errors=True)

    from kafka_connect_hdfs_spark.streaming.dedup_join import dedup_stream

    base, stream = _mk_source(
        spark, sf_dir, n_files, ["event_id", "ts", "value"]
    )
    name = "sbench_dedup_" + uuid.uuid4().hex[:8]
    q = (
        dedup_stream(stream, ["event_id"])
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{base}/chk")
        .start()
    )
    q.awaitTermination(600)
    out["dedup"] = _batch_stats(q)
    shutil.rmtree(base, ignore_errors=True)

    doc = {
        "sf_dir": sf_dir,
        "n_source_files": n_files,
        "note": (
            "per-batch fold cost (durationMs.addBatch) and state rows "
            "over a fixed availableNow replay (maxFilesPerTrigger=1) — "
            "trigger scheduling waits excluded by construction; grid "
            "monitors report persisted mart rows as state (their fold "
            "is foreachBatch, no Spark state store)."
        ),
        "monitors": out,
    }
    with open("/root/repo/BENCH_STREAM.json", "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print(json.dumps(doc))
    spark.stop()


if __name__ == "__main__":
    main()
