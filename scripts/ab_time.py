"""Back-to-back A/B timing of declared queries under BOTH actions the
round cares about: the bench's count() shape (prunes unconsumed columns)
and the noop sink (computes every column — guide §1.4). Used for the r14
re-verification of the r13 eager-materialization changes (VERDICT #8).

Usage: cd <tree> && python scripts/ab_time.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_REPS
(default 3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.getcwd())


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))

    import __spark_entry__ as entrymod
    from kafka_connect_hdfs_spark.session import get_spark

    spark = get_spark("kchs-ab-time")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    qs["q1_pricing_summary"](spark, sf_dir).count()

    def _clear() -> None:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        spark.catalog.clearCache()

    for name in names:
        for action in ("count", "noop"):
            runs = []
            for _ in range(reps):
                spark.sparkContext.setJobDescription(f"ab:{name}:{action}")
                t0 = time.perf_counter()
                df = qs[name](spark, sf_dir)
                if action == "count":
                    df.count()
                else:
                    df.write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
                _clear()
            print(
                f"{name} [{action}]: "
                + " ".join(f"{r:.3f}" for r in runs)
                + f"  min={min(runs):.3f}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
