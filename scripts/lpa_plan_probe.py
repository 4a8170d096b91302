"""Dump the FULL 4-sweep LPA plan (plans/<round>/ evidence for the r14
exchange-fusion change): label_propagation_communities checkpoints its
final label frame, which truncates the sweep subtree out of the gate's
explain output — this probe leaves that LAST checkpoint lazy (the sym
materialization stays real) so the per-sweep Exchange structure is
visible, then prints Exchange / hashpartitioning counts.

Usage: run from the tree to probe —
  cd <tree> && python scripts/lpa_plan_probe.py <out.txt>
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.getcwd())


def main() -> None:
    out_path = sys.argv[1]
    # Spark 4: the concrete class is pyspark.sql.classic.dataframe.DataFrame
    # (patching the abstract base would not intercept the operator's call)
    try:
        import pyspark.sql.classic.dataframe as D
    except ImportError:  # Spark 3.x fallback
        import pyspark.sql.dataframe as D

    import __spark_entry__ as em
    from kafka_connect_hdfs_spark.operators.graph import (
        covisit_edges, label_propagation_communities,
    )
    from kafka_connect_hdfs_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("lpa-plan-probe")
    spark.sparkContext.setLogLevel("ERROR")

    orig = D.DataFrame.localCheckpoint

    def patched(self, eager=True):
        # the final label frame is exactly (u, lbl) — leave it lazy so
        # the sweep plan stays visible; every other checkpoint (covisit
        # internals, sym) stays real so the plan starts at the edge list
        if self.columns == ["u", "lbl"]:
            return self
        return orig(self, eager)

    D.DataFrame.localCheckpoint = patched
    try:
        edges = covisit_edges(
            em._events(spark, sf_dir), max_users_per_bucket=200
        ).filter("n_covisits >= 3")
        lab = label_propagation_communities(
            edges, iterations=4, id_a="user_a", id_b="user_b"
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            lab.explain("formatted")
        plan = buf.getvalue()
    finally:
        D.DataFrame.localCheckpoint = orig

    with open(out_path, "w") as fh:
        fh.write(plan)
    ex = len(re.findall(r"\bExchange\b", plan))
    hp = len(re.findall(r"hashpartitioning", plan))
    print(
        f"wrote {out_path}: {len(plan.splitlines())} lines, "
        f"Exchange={ex}, hashpartitioning={hp}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
