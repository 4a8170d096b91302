"""Midpoint-adversarial oracle fixture (r05 VERDICT item 6).

The r05 driver-red (`embedding_covariance`) was caused by NATIVE
round(x, 6) divergence: Spark's F.round runs BigDecimal HALF_UP on the
double's shortest decimal repr while DuckDB float-multiplies — measured
disagreement on ~1.2% of midpoint-shaped doubles. Fixed-point-derived
quotients (exact int / 1e7) land on TRUE decimal ``…5`` midpoints by
construction, so a gate can be green on one dataset and red on another
purely by data luck.

This fixture removes the luck: a 10-row embeddings table whose per-dim
floor-scaled sums are ≡ 5 (mod 10), making EVERY per-dim mean
``S / 1e7`` a true 6-dp decimal midpoint. The fixed-point gate family
(covariance, PCA, dim stats, isotropy) is then compared Spark-vs-DuckDB
with EXACT equality — any native-round regression flips deterministically
here instead of probabilistically on the driver.
"""

from __future__ import annotations

import decimal
import math

import duckdb
import numpy as np
import pytest

DIM = 64
N = 10


def _scaled(k: int) -> int:
    """The exact integer both engines derive from a float32-stored
    k·1e-6: floor(float64(float32(k·1e-6)) · 1e6) — identical IEEE ops
    on Spark (cast float→double, multiply, floor) and DuckDB."""
    return int(math.floor(float(np.float64(np.float32(k * 1e-6))) * 1e6))


def _make_vectors(rng: np.random.Generator) -> list[list[float]]:
    """10 vectors whose per-dim scaled sums are ≡ 5 (mod 10)."""
    ks = rng.integers(-1_500_000, 1_500_000, size=(N, DIM))
    vecs = ks.astype(np.int64)
    for d in range(DIM):
        base = sum(_scaled(int(vecs[i, d])) for i in range(N - 1))
        # walk the last element until the dim-sum lands on ...5
        k = int(vecs[N - 1, d])
        while (base + _scaled(k)) % 10 != 5:
            k += 1
        vecs[N - 1, d] = k
    return [[float(np.float32(k * 1e-6)) for k in row] for row in vecs]


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory, spark_global):
    import pyspark.sql.functions as F
    import pyspark.sql.types as T

    d = str(tmp_path_factory.mktemp("midpoint"))
    rng = np.random.default_rng(20260815)
    vecs = _make_vectors(rng)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    rows = [(i, vecs[i], i % 3) for i in range(N)]
    df = spark_global.createDataFrame(rows, schema)
    df.coalesce(1).write.mode("overwrite").parquet(d + "/embeddings.parquet")
    # repartition-shuffled copy: same rows, different partition order —
    # catches partial-aggregation-order dependence in the same sweep
    df.repartition(4, F.col("vec_id")).write.mode("overwrite").parquet(
        d + "/embeddings_shuf.parquet"
    )
    return d


def test_fixture_means_are_true_midpoints(fixture_dir):
    """Sanity: the construction actually produced 6-dp decimal midpoints
    for every per-dim mean (S/1e7 with S ≡ 5 mod 10)."""
    con = duckdb.connect()
    sums = con.execute(
        f"""
        WITH v AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
                          x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS s
                   FROM '{fixture_dir}/embeddings.parquet/*.parquet')
        SELECT i, sum(s[i]) AS sx FROM v
        CROSS JOIN (SELECT unnest(generate_series(1, {DIM})) AS i)
        GROUP BY i
        """
    ).fetchall()
    assert len(sums) == DIM
    for _, sx in sums:
        assert int(sx) % 10 == 5
        # the exact decimal mean has digit 5 at the 7th place: true midpoint
        q = decimal.Decimal(int(sx)) / decimal.Decimal(10_000_000)
        assert q == q.quantize(decimal.Decimal("1e-7"))
        assert q.as_tuple().digits[-1] == 5


def test_fixture_is_adversarial_for_native_round():
    """Proof the fixture would have caught the r05 red: on these means,
    Spark-style native round (BigDecimal HALF_UP on the double's repr)
    and DuckDB-style native round (float multiply) DISAGREE on at least
    one value — so the old F.round-based covariance goes red here
    deterministically, not by driver-data luck."""
    rng = np.random.default_rng(20260815)
    vecs = _make_vectors(rng)
    sums = [0] * DIM
    for v in vecs:
        for d in range(DIM):
            sums[d] += int(
                math.floor(float(np.float64(np.float32(v[d]))) * 1e6)
            )
    con = duckdb.connect()
    diverging = 0
    for s in sums:
        mean = s / (N * 1e6)  # the double both engines derive
        spark_native = float(
            decimal.Decimal(repr(mean)).quantize(
                decimal.Decimal("1e-6"), rounding=decimal.ROUND_HALF_UP
            )
        )
        duck_native = con.execute(
            "SELECT round(?::DOUBLE, 6)", [mean]
        ).fetchone()[0]
        if spark_native != duck_native:
            diverging += 1
    assert diverging >= 1


GATES = [
    "embedding_covariance",
    "embedding_pca",
    "embedding_dim_stats",
    "embedding_isotropy",
]


def _run_gate_vs_oracle(spark, name, data_dir, parquet="embeddings.parquet"):
    import __spark_entry__ as E

    sdf = E.queries()[name](spark, data_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{data_dir}/{parquet}/*.parquet'"
    )
    ddf = con.execute(E.oracle_sql()[name]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns), name
    s_rows = sorted(map(tuple, sdf[cols].itertuples(index=False)))
    d_rows = sorted(map(tuple, ddf[cols].itertuples(index=False)))
    assert len(s_rows) == len(d_rows), name
    for sr, dr in zip(s_rows, d_rows):
        for sv, dv in zip(sr, dr):
            if isinstance(sv, float) or isinstance(dv, float):
                # BYTE-exact — `==` is blind to -0.0 vs +0.0 (the r06
                # driver red); the driver hashes value bytes
                import struct

                assert struct.pack("<d", float(sv)) == struct.pack(
                    "<d", float(dv)
                ), (name, sr, dr)
            else:
                assert sv == dv, (name, sr, dr)


@pytest.mark.parametrize("gate", GATES)
def test_fixed_point_family_exact_on_midpoints(spark_global, fixture_dir, gate):
    _run_gate_vs_oracle(spark_global, gate, fixture_dir)


def test_covariance_partition_order_free_on_midpoints(spark_global, fixture_dir):
    """The shuffled-partition copy must produce byte-identical covariance
    output — the partial-aggregation-order half of the r04/r05 flake."""
    from kafka_connect_hdfs_spark.operators.similarity import (
        embedding_covariance,
    )

    a = embedding_covariance(
        spark_global.read.parquet(fixture_dir + "/embeddings.parquet")
    ).orderBy("i", "j").collect()
    b = embedding_covariance(
        spark_global.read.parquet(fixture_dir + "/embeddings_shuf.parquet")
    ).orderBy("i", "j").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
