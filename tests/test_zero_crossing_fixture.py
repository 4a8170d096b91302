"""Zero-crossing adversarial oracle fixture (r06 VERDICT items 1/5).

The r06 driver-red (`embedding_covariance`, third consecutive round) was
a sign-of-zero hash artifact: for true covariances in (-5e-07, 0) the
q6 quantizer lands on zero, and pre-fix the two engines emitted zeros of
OPPOSITE sign — Spark's ``floor`` returns BIGINT so ``-0L -> 0L -> +0.0``
while DuckDB's ``floor`` returns DOUBLE and ``-floor(...)`` keeps
``-0.0``. ``-0.0 == +0.0`` is True, so every value-level compare was
structurally blind; the driver's byte hash was not. The fix appends
``+ 0.0`` to the oracle quantizer `_OQ6` (IEEE: ``-0.0 + 0.0 = +0.0``).

This fixture removes the data luck: a 10-row embeddings table engineered
so the dim-(0,1) covariance lands in the open interval (-5e-07, 0)
DETERMINISTICALLY. The q6 gate family is then compared Spark-vs-DuckDB at
BYTE level — pre-fix code flips here on every run instead of on one
driver cell at one sf.
"""

from __future__ import annotations

import math
import struct

import duckdb
import numpy as np
import pytest

DIM = 64
N = 10
P50 = 1 << 50


def _scaled(k: int) -> int:
    """Micro-int both engines derive from a float32-stored k*1e-6:
    floor(float64(float32(k*1e-6)) * 1e6)."""
    return int(math.floor(float(np.float64(np.float32(k * 1e-6))) * 1e6))


def _big_to_double(s: int) -> float:
    m = abs(s)
    d = float(m // P50) * float(P50) + float(m % P50)
    return -d if s < 0 else d


def _cov_double(ms: list[list[int]], i: int, j: int) -> float:
    """The exact double the covariance kernel computes for dims (i, j)
    BEFORE q6 quantization — mirrors similarity.embedding_covariance
    term-for-term (dec_to_double split, same op order)."""
    n = len(ms)
    sxy = sum(r[i] * r[j] for r in ms)
    si = sum(r[i] for r in ms)
    sj = sum(r[j] for r in ms)
    nd = float(n)
    e_xy = _big_to_double(sxy) / (nd * 1e12)
    mi = _big_to_double(si) / (nd * 1e6)
    mj = _big_to_double(sj) / (nd * 1e6)
    return e_xy - mi * mj


def _make_vectors() -> list[list[float]]:
    """10 float32 vectors whose (dim0, dim1) covariance double is in the
    open interval (-5e-07, 0): quantizes to zero with a negative input
    sign — the exact class of the r06 driver red."""
    rng = np.random.default_rng(20260907)
    ks = rng.integers(-900, 900, size=(N, DIM)).astype(np.int64)
    ms = [[_scaled(int(k)) for k in row] for row in ks]
    # analytic zero for cov(dim0, dim1) as a function of the last row's
    # dim-1 micro-int t: slope = (n*m0_last - Sx0) / (n^2 * 1e12)
    sx0 = sum(r[0] for r in ms)
    m0_last = ms[N - 1][0]
    if N * m0_last == sx0:  # degenerate slope; nudge dim0 of the last row
        ks[N - 1][0] += 7
        ms[N - 1][0] = _scaled(int(ks[N - 1][0]))
        m0_last = ms[N - 1][0]
    base_t = ms[N - 1][1]
    cov0 = _cov_double(ms, 0, 1)
    slope = (N * m0_last - sx0) / (N * N * 1e12)
    t_star = base_t - cov0 / slope
    # scan k near the root until the KERNEL double lands in (-5e-7, 0)
    k0 = int(round(t_star))
    for dk in range(0, 120_000):
        for k in (k0 + dk, k0 - dk):
            ms[N - 1][1] = _scaled(k)
            c = _cov_double(ms, 0, 1)
            if -5e-07 < c < 0.0:
                ks[N - 1][1] = k
                return [[float(np.float32(int(x) * 1e-6)) for x in row] for row in ks]
    raise AssertionError("no zero-crossing k found — widen the scan")


@pytest.fixture(scope="module")
def zc_dir(tmp_path_factory, spark_global):
    import pyspark.sql.types as T

    d = str(tmp_path_factory.mktemp("zerocross"))
    vecs = _make_vectors()
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
    return d


def test_fixture_hits_the_zero_crossing_class(zc_dir):
    """Sanity: the construction produced a covariance double strictly
    inside (-5e-07, 0) for dims (0, 1)."""
    vecs = _make_vectors()
    ms = [
        [int(math.floor(float(np.float64(x)) * 1e6)) for x in row] for row in vecs
    ]
    c = _cov_double(ms, 0, 1)
    assert -5e-07 < c < 0.0, c


def test_fixture_is_adversarial_for_prefix_oracle(zc_dir):
    """Proof the fixture would have caught the r06 red: the PRE-FIX _OQ6
    form (no `+ 0.0`) emits -0.0 in DuckDB on this covariance while
    Spark's BIGINT floor emits +0.0 — byte-distinct; the fixed form
    emits +0.0 bytes."""
    vecs = _make_vectors()
    ms = [
        [int(math.floor(float(np.float64(x)) * 1e6)) for x in row] for row in vecs
    ]
    c = _cov_double(ms, 0, 1)
    con = duckdb.connect()
    old = con.execute(
        "SELECT (CASE WHEN (?) < 0 THEN -floor(-(?) * 1000000.0 + 0.5) "
        "ELSE floor((?) * 1000000.0 + 0.5) END / 1000000.0)",
        [c, c, c],
    ).fetchone()[0]
    new = con.execute(
        "SELECT ((CASE WHEN (?) < 0 THEN -floor(-(?) * 1000000.0 + 0.5) "
        "ELSE floor((?) * 1000000.0 + 0.5) END / 1000000.0) + 0.0)",
        [c, c, c],
    ).fetchone()[0]
    plus_zero = struct.pack("<d", 0.0)
    minus_zero = struct.pack("<d", -0.0)
    assert struct.pack("<d", old) == minus_zero  # pre-fix: -0.0 bytes
    assert struct.pack("<d", new) == plus_zero  # fixed: +0.0 bytes
    assert old == new  # ...which is why == compares were blind


GATES = ["embedding_covariance", "embedding_pca", "embedding_dim_stats"]


def _bytes_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return ("f64", struct.pack("<d", v).hex())
    if isinstance(v, np.floating):
        return _bytes_cell(float(v))
    if isinstance(v, np.integer):
        return int(v)
    return v


@pytest.mark.parametrize("gate", GATES)
def test_q6_family_byte_identical_on_zero_crossing(spark_global, zc_dir, gate):
    import __spark_entry__ as E

    sdf = E.queries()[gate](spark_global, zc_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{zc_dir}/embeddings.parquet/*.parquet'"
    )
    ddf = con.execute(E.oracle_sql()[gate]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns), gate
    key = lambda t: tuple((x is None, str(type(x)), str(x)) for x in t)  # noqa: E731
    s_rows = sorted(
        (tuple(_bytes_cell(v) for v in r) for r in sdf[cols].itertuples(index=False)),
        key=key,
    )
    d_rows = sorted(
        (tuple(_bytes_cell(v) for v in r) for r in ddf[cols].itertuples(index=False)),
        key=key,
    )
    assert len(s_rows) == len(d_rows), gate
    for sr, dr in zip(s_rows, d_rows):
        assert sr == dr, (gate, sr, dr)


def test_spark_covariance_emits_positive_zero(spark_global, zc_dir):
    """The planted cell quantizes to BYTE-positive zero on the Spark side
    (the +0.0 the fixed oracle now matches)."""
    from kafka_connect_hdfs_spark.operators.similarity import embedding_covariance

    df = embedding_covariance(
        spark_global.read.parquet(zc_dir + "/embeddings.parquet")
    )
    row = df.filter("i = 0 and j = 1").collect()[0]
    assert struct.pack("<d", row["cov"]) == struct.pack("<d", 0.0)
