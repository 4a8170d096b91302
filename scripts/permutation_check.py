"""Partition-permutation flake detector: run each queries() entry under
two deliberately different partitioning configs and require BIT-IDENTICAL
results. Catches the r04 `embedding_covariance` bug class — outputs that
depend on float partial-aggregation order — which a same-config rerun or
a single-engine oracle diff cannot see.

Usage: python scripts/permutation_check.py [sf_dir] [query ...]
Defaults to sf0.01 and ALL registered queries (r05 verdict item 2 —
the first-50 default let order-dependent avg(double) sites hide in the
unchecked tail). Pass explicit names to check a subset.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

CONF_A = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.files.openCostInBytes": str(4 * 1024 * 1024),
}
# few, tiny partitions -> different partial-agg grouping and merge order
CONF_B = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.files.maxPartitionBytes": str(256 * 1024),
    "spark.sql.files.openCostInBytes": "0",
}


def _cell(x):
    # floats compare by IEEE bytes (r06 verdict: -0.0 == 0.0 is True, so a
    # value-level compare is blind to the sign-of-zero class the driver's
    # byte hash catches)
    import struct

    if isinstance(x, float):
        return ("f64", struct.pack("<d", x).hex())
    return x


def _rows(df):
    # bit-exact cell compare: no rounding, no normalization beyond sort
    cols = sorted(df.columns)
    out = []
    for r in df.select(*cols).collect():
        out.append(tuple(_cell(r[c]) for c in cols))
    return sorted(
        out, key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t)
    )


def main() -> None:
    import importlib.util

    from kafka_connect_hdfs_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()
    names = sys.argv[2:] or list(qs)

    spark = get_spark("kchs-permcheck")
    spark.sparkContext.setLogLevel("ERROR")
    bad, err = [], []
    for name in names:
        fn = qs[name]
        try:
            for k, v in CONF_A.items():
                spark.conf.set(k, v)
            a = _rows(fn(spark, sf_dir))
            for k, v in CONF_B.items():
                spark.conf.set(k, v)
            b = _rows(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 - report and continue
            err.append(name)
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            continue
        finally:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist(False)
            spark.catalog.clearCache()
        if a != b:
            n_bad = sum(1 for x, y in zip(a, b) if x != y) + abs(
                len(a) - len(b)
            )
            bad.append(name)
            print(f"FLAKY {name}: {n_bad} differing rows across configs")
        else:
            print(f"ok   {name} ({len(a)} rows)")
    print(
        f"\n{len(names) - len(bad) - len(err)}/{len(names)} ok; "
        f"flaky: {bad}; errors: {err}"
    )
    spark.stop()
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
