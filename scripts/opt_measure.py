"""Optimization-round measurement helper (guide §1).

Times individual declared queries with the noop sink (computation only,
no sink cost) and captures .explain("formatted") to plans/<round>/.

Usage:
  python scripts/opt_measure.py time <query> [query ...]   # noop-timed, 3 runs
  python scripts/opt_measure.py plan <tag> <query> [...]   # plans/r13/<q>_<tag>.txt
  python scripts/opt_measure.py jobs <query>               # job/stage count via status tracker

Reads $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and
$SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mode = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from kafka_connect_hdfs_spark.session import get_spark

    spark = get_spark("kchs-opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # same warmup as bench.py so numbers are comparable
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    qs["q1_pricing_summary"](spark, sf_dir).count()

    def _clear_persisted() -> None:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        spark.catalog.clearCache()

    if mode == "time":
        names = sys.argv[2:]
        for name in names:
            runs = []
            for _ in range(3):
                spark.sparkContext.setJobDescription(f"opt-measure: {name}")
                t0 = time.perf_counter()
                df = qs[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
                _clear_persisted()
            print(f"{name}: " + " ".join(f"{r:.3f}" for r in runs) +
                  f"  min={min(runs):.3f}")
    elif mode == "plan":
        tag = sys.argv[2]
        names = sys.argv[3:]
        outdir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14"),
        )
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {os.path.join(outdir, name + '_' + tag + '.txt')}")
            _clear_persisted()
    elif mode == "jobs":
        name = sys.argv[2]
        sc = spark.sparkContext
        t = sc.statusTracker()
        before = t.getJobIdsForGroup(None) or []
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        after = t.getJobIdsForGroup(None) or []
        print(f"{name}: {len(set(after) - set(before))} jobs")
    spark.stop()


if __name__ == "__main__":
    main()
