"""One noop-timed pass over EVERY declared query (guide §1.4) — the
optimization-round coverage sweep. count()-shaped bench actions prune
unreferenced output columns, so a per-column pathology (e.g. an expression
re-evaluated inside a higher-order lambda) can hide behind a fast bench
number; the noop sink computes every column of every row.

Usage: python scripts/opt_sweep.py [start_idx] [end_idx]
Prints one line per query: "<name>: <seconds>". Reads $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and $SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from kafka_connect_hdfs_spark.session import get_spark

    spark = get_spark("kchs-opt-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = sorted(qs)
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else len(names)

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    qs["q1_pricing_summary"](spark, sf_dir).count()

    for name in names[lo:hi]:
        spark.sparkContext.setJobDescription(f"opt-sweep: {name}")
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            print(f"{name}: {time.perf_counter() - t0:.3f}", flush=True)
        except Exception as exc:  # surface, keep sweeping
            print(
                f"{name}: ERROR after {time.perf_counter() - t0:.3f}s "
                f"({type(exc).__name__}: {str(exc)[:120]})",
                flush=True,
            )
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
