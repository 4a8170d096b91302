"""Local replica of the driver's t2 check: run every queries() entry on Spark
and its oracle_sql() on DuckDB, compare row count, column names, and sorted
values. Usage: python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    import datetime
    import struct

    import numpy as np
    import pandas as pd

    if v is None:
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            # distinct sentinel, NOT None (r07 ADVICE): normalizing NaN
            # to None conflated NaN with SQL NULL, so a Spark-NaN vs
            # DuckDB-NULL divergence passed the byte-exact compare.
            return ("f64", "nan")
        # BYTE-level identity (r06 verdict): the driver hashes value bytes,
        # where -0.0 != +0.0 even though they compare ==. Carry the repr for
        # readable FAIL diffs; equality/sort run on the packed bytes.
        return ("f64", struct.pack("<d", v).hex(), repr(v))
    return v


def compare(name, sdf, ddf, verbose=True):
    scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
    if scols != dcols:
        print(f"FAIL {name}: columns spark={scols} duck={dcols}")
        return False
    sdf, ddf = sdf[scols].copy(), ddf[scols].copy()
    # OBJECT-dtype columns (bools, strings, structs) represent SQL NULL
    # asymmetrically through pandas: duckdb fetchdf emits float NaN,
    # Spark toPandas emits None — map NaN→None there. A float NaN in an
    # object column can only be a NULL marker (genuine NaN data lives in
    # float64 columns, which keep the r07 NaN-vs-NULL sentinel).
    for df in (sdf, ddf):
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].map(
                    lambda v: None
                    if isinstance(v, float) and math.isnan(v)
                    else v
                )
    if len(sdf) != len(ddf):
        print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
        return False
    srows = sorted(
        (tuple(norm_cell(v) for v in row) for row in sdf.itertuples(index=False)),
        key=lambda t: tuple((x is None, str(type(x)), x) for x in t),
    )
    drows = sorted(
        (tuple(norm_cell(v) for v in row) for row in ddf.itertuples(index=False)),
        key=lambda t: tuple((x is None, str(type(x)), x) for x in t),
    )
    if srows != drows:
        n_bad = sum(1 for a, b in zip(srows, drows) if a != b)
        print(f"FAIL {name}: {n_bad}/{len(srows)} differing rows")
        for a, b in zip(srows, drows):
            if a != b:
                print(f"  spark: {a}\n  duck : {b}")
                break
        return False
    print(f"ok   {name} ({len(srows)} rows)")
    return True


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from kafka_connect_hdfs_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"ERROR {name} (spark): {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"skip {name}: no oracle ({len(sdf)} rows)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"ERROR {name} (duckdb): {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        if not compare(name, sdf, ddf):
            failures.append(name)
    print(f"\n{n_run - len(failures)}/{n_run} ok; failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
