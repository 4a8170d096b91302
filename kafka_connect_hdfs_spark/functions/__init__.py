"""Shared column functions and parallelism helpers.

``fan_out`` fixes the small-input / heavy-compute mismatch: a 5 MB parquet
file arrives as ONE scan partition (maxPartitionBytes), so CPU-bound
per-row operators (shingling, hashing, vector math, Pandas UDF decode) run
single-threaded no matter how many cores exist. Repartitioning a small
input costs a trivial shuffle and unlocks full parallelism; a large input
(≥ target partitions) passes through untouched — so the call is safe to
leave in at 100 TB, where scans are already thousands of partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fan_out(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Repartition up to defaultParallelism×multiplier iff under-partitioned.

    Streaming frames pass through untouched (partition introspection is a
    batch-only action; micro-batch parallelism comes from the source's own
    splitting) — this is what lets every corpus operator compose with
    readStream unchanged.
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiplier
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for skewed keys.

    Phase 1 groups by (key, salt) — a hot key splits across ``salt_buckets``
    reducers; phase 2 re-aggregates the per-salt partials by key. Supported
    aggs: {"out_col": (fn, in_col)} with fn in sum/count/min/max — the
    partial-mergeable functions.

    When AQE's skew handling isn't enough (single giant groupBy key rather
    than a skewed join), this is the standard manual remedy; the salt is
    deterministic (hash of the full row spread via monotonically increasing
    id would be non-deterministic on retry — use a stable column hash).
    """
    salt = (F.xxhash64(*[F.col(c) for c in df.columns]) % salt_buckets).alias("_salt")
    phase1_aggs = []
    phase2_aggs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            phase1_aggs.append(F.count(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "sum":
            phase1_aggs.append(F.sum(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            phase1_aggs.append(F.min(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            phase1_aggs.append(F.max(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-mergeable agg {fn}")
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*phase1_aggs)
    return partial.groupBy(*keys).agg(*phase2_aggs)


def dec_units_to_double(name: str) -> Column:
    """Deterministic decimal(38,0)→double via the hi/lo 2**50 split:
    ``sign · (float(|s| DIV 2**50)·2**50 + float(|s| % 2**50))``.

    Spark's native decimal→double cast is correctly rounded, but DuckDB's
    HUGEINT→DOUBLE is NOT past 2**53 (measured, r05/r06 verdicts) — so
    any value that crosses the engine boundary must run this split on
    BOTH sides: each sub-cast is exact (< 2**53) and the mul/add are
    identical IEEE ops. SQL ``DIV`` (true floor on decimals), not decimal
    ``/`` (which HALF_UP-rounds first). Canonical home of the kernel;
    :func:`operators.similarity.dec_to_double` is the same construction.
    Takes a column NAME because ``DIV`` needs an expr string."""
    p50 = 1 << 50
    hi = F.expr(f"CAST(abs({name}) DIV {p50} AS DOUBLE)")
    lo = F.expr(f"CAST(abs({name}) % {p50} AS DOUBLE)")
    d = hi * F.lit(float(p50)) + lo
    return F.when(F.col(name) < 0, -d).otherwise(d)


def _units_split_double(u: Column) -> Column:
    """No-name form of the hi/lo split for a decimal(38,0) integer-units
    COLUMN (``dec_units_to_double`` needs a name for SQL ``DIV``; window
    and agg expressions have none). ``(a - a % P) / P`` is exactly
    divisible, so the decimal division is exact regardless of rounding
    mode; each cast is < 2**53 and exact; mul/add are the identical IEEE
    ops the oracle-side ``_OD2`` runs."""
    p50 = 1 << 50
    a = F.abs(u)
    lo = a % F.lit(p50)
    hi = ((a - lo) / F.lit(p50)).cast("decimal(38,0)")
    d = hi.cast("double") * F.lit(float(p50)) + lo.cast("double")
    return F.when(u < 0, -d).otherwise(d)


def dec_as_double(expr: Column) -> Column:
    """Exact DECIMAL→DOUBLE, expression form: scale to micro-units
    (exact for any operand scale ≤ 6 — every decimal in this repo),
    hi/lo-split to double, divide back by ``1e6`` (one correctly-rounded
    IEEE op). Use INSTEAD of ``.cast("double")`` on any decimal that
    crosses the DuckDB oracle boundary: native casts agree with the
    split below 2**53 micro-units — bit-identical at bench sf, which is
    why sweeping a green gate through this does not change its recorded
    hash — and diverge up to 1 ulp above, exactly where a 100 TB sum
    lives (DuckDB's HUGEINT/DECIMAL→DOUBLE is not correctly rounded).
    Oracle mirror: ``_OD2(sum(CAST(CAST(x AS DECIMAL(24,6)) * 1000000
    AS BIGINT))) / 1000000.0`` (__spark_entry__ rewrites every native
    ``CAST(sum(decimal) AS DOUBLE)`` to that form at registry build)."""
    u = (expr.cast("decimal(38,6)") * F.lit(1_000_000)).cast("decimal(38,0)")
    return _units_split_double(u) / F.lit(1_000_000.0)


def dec_sum_double(expr: Column) -> Column:
    """Exact decimal SUM surfaced as double — drop-in replacement for the
    ``F.sum(dec).cast("double")`` pattern inside ``.agg(...)``. The sum
    itself is exact decimal arithmetic; only the final conversion needs
    the deterministic split (:func:`dec_as_double`)."""
    return dec_as_double(F.sum(expr))


def surface_dec_sum(
    df: DataFrame,
    dec_col: str,
    out_col: "str | None" = None,
) -> DataFrame:
    """Replace the DECIMAL column ``dec_col`` with its exact DOUBLE
    rendering (:func:`dec_as_double`), preserving column order — the
    post-aggregation form for operators that hand back decimal totals
    (salted_agg, refresh_aggregate)."""
    out_col = out_col or dec_col
    exact = dec_as_double(F.col(dec_col))
    return df.select(
        *[exact.alias(out_col) if c == dec_col else F.col(c) for c in df.columns]
    )


def md5_int48(col: Column) -> Column:
    """Deterministic 48-bit integer from md5 hex (first 12 chars).

    DuckDB-replayable as ``('0x' || substr(md5(x),1,12))::BIGINT``; 48 bits
    leaves int64 headroom for universal-hash multiplies.
    """
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the big side salts its key deterministically
    (md5-derived, stable across retries), the small side replicates
    ``salt_buckets``× so every (key, salt) pair finds its match — a hot key
    splits across ``salt_buckets`` reducers instead of melting one task.

    Use when AQE's skew-join splitting isn't available (pre-shuffle
    bucketed layouts) or the small side is just over the broadcast
    threshold. For genuinely broadcast-small dims prefer
    ``broadcast(small)`` — zero shuffle beats a salted one.

    Supported: inner and left joins (right/full would need null-salt rows
    on the replicated side).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    # salt varies per ROW (full-row hash), never per key — a per-key salt
    # would land every row of the hot key in one bucket again; full-row
    # hashing is deterministic on retry, unlike rand()/monotonic ids.
    # pmod, not abs+%: abs(Long.MIN_VALUE) stays negative in Spark, and a
    # negative salt has no replicated match — the row would silently drop.
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)
    ).cast("int")
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")
