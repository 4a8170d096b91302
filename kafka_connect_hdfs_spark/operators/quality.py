"""Data-quality operators over landed tables: column profiling and
referential-integrity checks — the audit queries every warehouse team runs
against a fresh landing before opening it to consumers (the reference has
no equivalent; its users run these by hand in Hive).

Both are single-pass, shuffle-light shapes: the profiler is ONE aggregate
over the table (every per-column statistic partial-aggregates map-side);
the integrity checker is one anti-join per foreign key with the parent
side reduced to distinct keys first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Per-column profile: rows, null count/ratio, distinct count, min/max
    (rendered as strings so one result schema fits every column type).

    ``exact_distinct=False`` (default) uses HLL ``approx_count_distinct`` —
    the 100 TB setting (fixed-size sketch per column, partial-aggregable);
    exact mode exists for oracle verification and small tables.

    Scale: ONE aggregate job for all columns together — a per-column loop
    of separate jobs would scan the table len(columns) times. The unpivot
    to one-row-per-column happens on the single aggregated row.
    """
    cols = columns or df.columns
    aggs = [F.count("*").alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"))
        aggs.append(
            (
                F.countDistinct(F.col(c))
                if exact_distinct
                else F.approx_count_distinct(F.col(c))
            ).alias(f"_dist_{c}")
        )
        aggs.append(F.min(F.col(c)).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"_max_{c}"))
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{c}").alias("n_null"),
                F.round(F.col(f"_null_{c}") / F.col("_n"), 6).alias("null_ratio"),
                F.col(f"_dist_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*").orderBy("column")


def referential_integrity(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    relation: str = "fk",
) -> DataFrame:
    """Orphan check for one foreign-key relation: how many child rows (and
    distinct keys) reference a parent key that does not exist. NULL child
    keys are counted separately (unset, not broken).

    Scale: the parent reduces to DISTINCT keys before the join (~8 B/row
    into the shuffle); the child side joins on the uniform key with a
    left_anti. Run one call per relation and union the one-row results.
    """
    parents = parent.select(F.col(parent_key).alias(child_key)).distinct()
    nulls = child.filter(F.col(child_key).isNull())
    orphans = child.filter(F.col(child_key).isNotNull()).join(
        parents, child_key, "left_anti"
    )
    return orphans.agg(
        F.lit(relation).alias("relation"),
        F.count("*").alias("n_orphan_rows"),
        F.countDistinct(F.col(child_key)).alias("n_orphan_keys"),
    ).crossJoin(nulls.agg(F.count("*").alias("n_null_keys")))


def integrity_report(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row results of several ``referential_integrity`` calls
    into the audit table."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("relation")


def table_checksum(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Order-independent content checksum: xor-fold of a per-row md5-derived
    48-bit hash over the selected columns (rendered canonically as strings)
    plus the row count — compare two landings (replication, migration,
    backup restore) without sorting or moving either table.

    Scale: one map-side hash projection + a single xor/count aggregate
    (both partial-aggregable) — bytes shuffled: one (long, long) per
    partition. xor is commutative/associative, so the result is identical
    for ANY row order or partitioning; a single changed, missing, or
    duplicated-odd-times row flips the checksum.
    """
    from kafka_connect_hdfs_spark.functions import md5_int48

    cols = columns or df.columns
    row_repr = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
    )
    h = md5_int48(row_repr)
    return df.select(h.alias("_h")).agg(
        F.count("*").alias("n_rows"),
        F.expr("bit_xor(_h)").alias("checksum"),
    )


def source_report(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-source corpus triage report (the RefinedWeb-style per-domain
    table that decides which sources to keep, cap, or drop): document
    count, exact-duplicate pressure (docs minus distinct text
    fingerprints), language spread, token and char volume, mean document
    length. All counts are integers and the means derive from them, so
    the report is bit-reproducible across engines.

    ``exact_distinct=False`` swaps the two COUNT(DISTINCT)s for HLL
    ``approx_count_distinct`` — the 100 TB setting (no expand, fixed-size
    sketches); exact mode is the oracle/small-table path.

    Scale: ONE aggregate over a pruned 4-column projection; text reduces
    to its md5 BEFORE the shuffle so full documents never move. Exact
    mode's two distincts expand rows ×2 (Spark's Expand) but still
    partial-aggregate map-side; shuffle is bounded by
    #sources × distinct fingerprints.
    """
    t = F.trim(F.col(text_col))
    n_tokens = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )
    per_doc = df.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        F.md5(F.col(text_col)).alias("fp"),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.length(F.col(text_col)).cast("bigint").alias("n_chars"),
    )
    cd = F.count_distinct if exact_distinct else F.approx_count_distinct
    agg = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        cd(F.col("fp")).alias("n_distinct_texts"),
        cd(F.col("lang")).alias("n_langs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_distinct_texts",
        (F.col("n_docs") - F.col("n_distinct_texts")).alias("n_dup_docs"),
        F.round(
            (F.col("n_docs") - F.col("n_distinct_texts")) / F.col("n_docs"), 6
        ).alias("dup_ratio"),
        "n_langs",
        "total_tokens",
        "total_chars",
        F.round(F.col("total_tokens") / F.col("n_docs"), 4).alias(
            "mean_tokens_per_doc"
        ),
    )


def corpus_datacard(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-table corpus datacard: the tall ``(metric, value)`` summary a
    dataset card / release review starts from — sizes, diversity,
    duplicate pressure, quality mass — composed from the same signals the
    individual triage operators expose, so the numbers here always agree
    with the detailed reports.

    Metrics: n_docs, n_sources, n_langs, total_ws_tokens, avg_doc_tokens,
    exact_dup_rate (1 − distinct fingerprints / docs), avg_quality,
    gopher_keep_rate (default thresholds).

    Scale: ONE wide aggregate over map-side-computed per-doc signals
    (fingerprint md5, token count, quality score, keep flag — text never
    shuffles), plus two countDistinct. Output is 8 rows regardless of
    corpus size.
    """
    from kafka_connect_hdfs_spark.operators.text import (
        gopher_rules, with_quality_score,
    )

    scored = with_quality_score(df, text_col)
    gated = gopher_rules(scored, text_col=text_col)
    t = F.trim(F.col(text_col))
    base = gated.select(
        F.col(id_col),
        F.col(lang_col),
        F.col(source_col),
        F.md5(
            F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
        ).alias("_fp"),
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("bigint")
        .alias("_tok"),
        F.col("quality_score"),
        F.col("keep").cast("int").alias("_keep"),
    )
    agg = base.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(source_col).alias("n_sources"),
        F.countDistinct(lang_col).alias("n_langs"),
        F.sum("_tok").alias("total_ws_tokens"),
        F.avg("_tok").alias("avg_doc_tokens"),
        (1 - F.countDistinct("_fp") / F.count("*")).alias("exact_dup_rate"),
        F.avg("quality_score").alias("avg_quality"),
        F.avg("_keep").alias("gopher_keep_rate"),
    )
    metrics = [
        "n_docs", "n_sources", "n_langs", "total_ws_tokens",
        "avg_doc_tokens", "exact_dup_rate", "avg_quality",
        "gopher_keep_rate",
    ]
    stacked = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("metric"),
                        F.round(F.col(m).cast("double"), 6).alias("value"),
                    )
                    for m in metrics
                ]
            )
        ).alias("kv")
    )
    return stacked.select("kv.metric", "kv.value").orderBy("metric")


def concentration_report(
    df: DataFrame, group_cols: "tuple[str, ...]" = ("lang", "source")
) -> DataFrame:
    """Corpus concentration per grouping dimension: for each column in
    ``group_cols``, the Gini coefficient of document counts across its
    groups plus the top group's share — the diversity health check run
    before mixing decisions (a Gini near 1 means one language/source
    dominates; temperature sampling exists to pull it down). Returns
    ``(dimension, n_groups, top_share, gini)``.

    Gini over ascending group counts x_1..x_n:
    ``(2·Σ i·x_i) / (n·Σx) − (n+1)/n`` — integer sums until the final
    division, so the oracle replays exactly.

    Scale: one partial-combining count per dimension (group-bounded
    shuffle); ranking and the closed-form fold run on the tiny per-group
    count tables.
    """
    from pyspark.sql import Window

    out = None
    for col in group_cols:
        counts = df.groupBy(F.col(col).alias("g")).agg(
            F.count("*").alias("x")
        )
        w = Window.orderBy(F.asc("x"), F.asc("g"))
        ranked = counts.withColumn("i", F.row_number().over(w))
        dim = ranked.agg(
            F.lit(col).alias("dimension"),
            F.count("*").alias("n_groups"),
            F.round(F.max("x") / F.sum("x"), 6).alias("top_share"),
            F.round(
                (2 * F.sum(F.col("i") * F.col("x")))
                / (F.count("*") * F.sum("x"))
                - (F.count("*") + 1) / F.count("*"),
                6,
            ).alias("gini"),
        )
        out = dim if out is None else out.unionByName(dim)
    return out


def validate_constraints(
    df: DataFrame, rules: "list[tuple[str, F.Column]]"
) -> DataFrame:
    """Write-side CHECK-constraint validation (the Delta/Iceberg table
    constraint model; the reference has no equivalent — bad records reach
    HDFS): annotate every row with the list of violated rule names and a
    ``valid`` flag, entirely map-side — callers route ``valid`` rows to
    the sink and the rest to a quarantine path (the json_quarantine
    pattern generalized to declarative predicates).

    ``rules`` is ``[(name, boolean Column)]``; a row violates a rule when
    the predicate is NOT TRUE (false OR null — SQL CHECK semantics treat
    NULL as passing, but a data gate must flag unknowns).
    """
    viols = F.array_compact(
        F.array(
            *[
                F.when(~cond.eqNullSafe(F.lit(True)), F.lit(name))
                for name, cond in rules
            ]
        )
    )
    return df.withColumn("violations", viols).withColumn(
        "valid", F.size("violations") == 0
    )


def constraint_report(
    df: DataFrame, rules: "list[tuple[str, F.Column]]"
) -> DataFrame:
    """Per-rule violation summary ``(rule, n_checked, n_violations,
    violation_rate)`` — ONE aggregate over the table computes every
    rule's count (no per-rule scans), the shape profile_table uses.
    """
    aggs = [F.count("*").alias("_n")] + [
        F.sum(
            F.when(~cond.eqNullSafe(F.lit(True)), 1).otherwise(0)
        ).alias(f"_v_{i}")
        for i, (name, cond) in enumerate(rules)
    ]
    row = df.agg(*aggs)
    out = None
    for i, (name, _) in enumerate(rules):
        r = row.select(
            F.lit(name).alias("rule"),
            F.col("_n").alias("n_checked"),
            F.col(f"_v_{i}").alias("n_violations"),
            F.round(F.col(f"_v_{i}") / F.col("_n"), 6).alias(
                "violation_rate"
            ),
        )
        out = r if out is None else out.unionByName(r)
    return out


def cube_profile(
    df: DataFrame,
    dims: "list[str]",
    value_col: str | None = None,
) -> DataFrame:
    """Multi-dimensional rollup mart (GROUP BY CUBE): one pass emits the
    aggregate at EVERY subset of ``dims`` — the per-dim marginals, the
    cross-tabs, and the grand total a datacard/dashboard reads — with
    ``gid`` (Spark ``grouping_id``: bit i set ⇔ dim i rolled up) telling
    the levels apart. The reference's consumers build these marts in
    Hive after landing (SURVEY §2.7); here it is one declarative pass.

    Counts are exact longs; the optional value sum runs as decimal(18,2)
    (order-free) and surfaces as double.

    Scale: CUBE over d dims multiplies aggregate rows by 2^d, NOT input
    rows — partial aggregation combines map-side per grouping set, so
    the shuffle carries |groups|·2^d partials regardless of corpus size.
    Keep d small (2-4) like any sane mart; for high-cardinality dims use
    grouping sets of the needed combinations instead of the full cube.
    """
    from kafka_connect_hdfs_spark.operators.similarity import dec_to_double

    aggs = [F.grouping_id().alias("gid"), F.count("*").alias("n_rows")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("_tv_dec")
        )
    out = df.cube(*dims).agg(*aggs)
    if value_col is not None:
        # decimal→double through the deterministic hi/lo split on exact
        # integer cents (r06 ADVICE): a native decimal→double cast is not
        # correctly rounded in DuckDB past 2**53 scaled units, and the
        # CUBE grand-total cell is exactly the sum that gets there first
        out = (
            out.withColumn(
                "_cents", (F.col("_tv_dec") * F.lit(100)).cast("decimal(38,0)")
            )
            .withColumn(
                "total_value", dec_to_double("_cents") / F.lit(100.0)
            )
            .drop("_tv_dec", "_cents")
        )
    return out


def robust_length_outliers(
    df: DataFrame,
    group_col: str = "lang",
    len_col: str = "n_chars",
    z_cut: float = 3.5,
) -> DataFrame:
    """Robust (median/MAD) per-group length-outlier report — the
    distribution health check that survives the heavy tails mean/stddev
    z-scores drown in (one 10 MB scrape in a group of tweets inflates σ
    until nothing is an outlier). Per group: the median length, the
    median absolute deviation, the count beyond the modified z-score cut
    ``0.6745·(x − med)/MAD`` (Iglewicz–Hoaglin), and the worst score.

    Determinism: lengths are integers, so exact interpolated medians land
    on .0/.5 (and MAD on .0/.25/.5/.75) — exactly representable doubles;
    every later op is the identical IEEE expression on both engines and
    the surfaced score goes through q6. MAD = 0 does NOT mean all lengths
    are equal (any >50%-constant group zeroes the median deviation), so
    the Iglewicz–Hoaglin fallback applies: ``0.7979·(x − med)/MeanAD``
    with MeanAD the MEAN absolute deviation — still order-free, because
    the deviations are exact dyadic halves whose partial sums are all
    exactly representable, so avg() is one deterministic division. Only a
    truly constant group (MeanAD = 0 too) reports z = 0.

    Scale: one group-bounded percentile aggregation (Spark's exact
    ``percentile`` partial-aggregates per partition), one broadcast join
    of the tiny per-group stats, one counting pass — nothing corpus-sized
    shuffles twice.
    """
    med = df.groupBy(group_col).agg(
        F.percentile(F.col(len_col), F.lit(0.5)).alias("_med")
    )
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "_dev", F.abs(F.col(len_col) - F.col("_med"))
    )
    mad = dev.groupBy(group_col).agg(
        F.percentile(F.col("_dev"), F.lit(0.5)).alias("_mad"),
        F.avg(F.col("_dev")).alias("_meanad"),
    )
    z = (
        F.when(
            F.col("_mad") > 0,
            F.lit(0.6745) * (F.col(len_col) - F.col("_med")) / F.col("_mad"),
        )
        .when(
            F.col("_meanad") > 0,
            F.lit(0.7979)
            * (F.col(len_col) - F.col("_med"))
            / F.col("_meanad"),
        )
        .otherwise(F.lit(0.0))
    )
    from kafka_connect_hdfs_spark.operators.similarity import q6_col

    return (
        dev.join(F.broadcast(mad), group_col)
        .withColumn("_z", z)
        .groupBy(group_col)
        .agg(
            F.max("_med").alias("median_len"),
            F.max("_mad").alias("mad"),
            F.count("*").alias("n_docs"),
            F.sum((F.abs(F.col("_z")) > F.lit(z_cut)).cast("long")).alias(
                "n_outliers"
            ),
            F.max(F.abs(F.col("_z"))).alias("_maxz"),
        )
        .select(
            group_col,
            "n_docs",
            "median_len",
            "mad",
            "n_outliers",
            q6_col(F.col("_maxz")).alias("max_abs_z"),
        )
    )


def weak_label_census(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Snorkel-style weak-supervision vote census: three labeling
    functions vote keep(+1)/drop(−1)/abstain(0) on every document, and
    the census reports one row per (vote₁, vote₂, vote₃, decision) with
    its document count — the coverage/overlap/conflict table a
    programmatic-labeling pipeline inspects before training a label
    model. Decision = majority sign of the vote sum (0 = undecided).

    The three LFs (deterministic, integer-exact — ratio thresholds use
    cross-multiplication, never float division):
      LF1 length:    10 ≤ tokens ≤ 80 → +1; tokens < 5 → −1; else 0.
      LF2 diversity: distinct/total ≥ 1/2 → +1; < 3/10 → −1; else 0.
      LF3 keywords:  token 'dup' present → −1; 'spark' present → +1;
                     both → conflict resolved to −1 (spam beats topical);
                     neither → 0.

    Scale: one map-side pass computes all three votes from a single
    tokenization (no joins), one |vote-space|-bounded aggregation
    (≤ 3³·3 = 81 output rows regardless of corpus size).
    """
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    lf1 = (
        F.when((n >= 10) & (n <= 80), 1).when(n < 5, -1).otherwise(0)
    )
    lf2 = (
        F.when(nd * 2 >= n, 1).when(nd * 10 < n * 3, -1).otherwise(0)
    )
    has_dup = F.array_contains(toks, "dup")
    has_spark = F.array_contains(toks, "spark")
    lf3 = F.when(has_dup, -1).when(has_spark, 1).otherwise(0)
    voted = df.select(
        lf1.alias("v1"), lf2.alias("v2"), lf3.alias("v3")
    ).withColumn("_s", F.col("v1") + F.col("v2") + F.col("v3"))
    decision = (
        F.when(F.col("_s") > 0, F.lit("keep"))
        .when(F.col("_s") < 0, F.lit("drop"))
        .otherwise(F.lit("undecided"))
    )
    return (
        voted.withColumn("decision", decision)
        .groupBy("v1", "v2", "v3", "decision")
        .agg(F.count("*").alias("n_docs"))
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str = "value",
    n_buckets: int = 10,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    sample of a numeric column — the standard train/serve drift gate
    (rule of thumb: < 0.1 stable, 0.1–0.25 drifting, > 0.25 retrain).
    Returns one row per bucket: ``(bucket, n_ref, n_cur, psi_contrib)``;
    Σ psi_contrib is the PSI.

    Buckets are EQUAL-WIDTH over the reference min/max (not quantiles:
    interpolated quantile edges are engine-implementation-shaped doubles,
    and a value landing exactly on an edge could bucket differently
    across engines — min/max are exact and the bucket index is one
    identical IEEE expression). Out-of-range current values clamp to the
    edge buckets, which is exactly the drift signal. Counts get +1
    Laplace smoothing so empty buckets contribute finitely.

    Scale: two single-pass bounded aggregations (min/max, then bucket
    counts — ≤ n_buckets rows each after map-side combine) and a
    broadcast join of two tiny count tables.
    """
    from kafka_connect_hdfs_spark.operators.similarity import q6_col

    mm = ref.agg(
        F.min(F.col(value_col).cast("double")).alias("_lo"),
        F.max(F.col(value_col).cast("double")).alias("_hi"),
    )

    def _bucketed(df: DataFrame, out: str) -> DataFrame:
        v = F.col(value_col).cast("double")
        # clamp the DOUBLE index BEFORE floor/int-cast: a far-out-of-range
        # current value (raw index past 2**31, or even 2**63) must clamp
        # to the edge bucket, not overflow the ANSI cast or floor's
        # BIGINT result (r07 review finding, reproduced)
        raw = (
            (v - F.col("_lo"))
            * F.lit(float(n_buckets))
            / (F.col("_hi") - F.col("_lo"))
        )
        clamped = F.floor(
            F.greatest(F.lit(0.0), F.least(F.lit(float(n_buckets - 1)), raw))
        ).cast("int")
        b = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(clamped)
        return (
            df.crossJoin(F.broadcast(mm))
            .select(b.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").alias(out))
        )

    rb = _bucketed(ref, "_nr")
    cb = _bucketed(cur, "_nc")
    return psi_from_counts(rb, cb, n_buckets=n_buckets)


def jsd_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str = "value",
    n_buckets: int = 10,
) -> DataFrame:
    """Jensen-Shannon divergence between a reference and a current
    sample of a numeric column — the bounded, symmetric member of the
    drift family (:func:`psi_drift` is unbounded and blows up on
    near-empty buckets even smoothed; :func:`ks_drift` sees only the
    worst ECDF point; JSD ∈ [0, ln 2] weighs the WHOLE distribution and
    is safe to threshold across columns of different shapes).

    Buckets are the same exact equal-width reference-min/max kernel as
    PSI (engine-identical edges, out-of-range clamps to the edge
    buckets). Per bucket with ``p = n_ref/Nr``, ``q = n_cur/Nc``,
    ``m = (p+q)/2``: contribution ``½·p·ln(p/m) + ½·q·ln(q/m)``
    (zero-count terms contribute 0 — no smoothing needed, unlike PSI);
    Σ contributions is the JSD. Returns one row per bucket:
    ``(bucket, n_ref, n_cur, jsd_contrib)``, 6-dp HALF-UP.

    Scale: identical to PSI — two bounded single-pass aggregations and
    broadcast joins of ≤ ``n_buckets``-row tables.
    """
    from kafka_connect_hdfs_spark.operators.similarity import q6_col

    mm = ref.agg(
        F.min(F.col(value_col).cast("double")).alias("_lo"),
        F.max(F.col(value_col).cast("double")).alias("_hi"),
    )

    def _bucketed(df: DataFrame, out: str) -> DataFrame:
        v = F.col(value_col).cast("double")
        raw = (
            (v - F.col("_lo"))
            * F.lit(float(n_buckets))
            / (F.col("_hi") - F.col("_lo"))
        )
        clamped = F.floor(
            F.greatest(F.lit(0.0), F.least(F.lit(float(n_buckets - 1)), raw))
        ).cast("int")
        b = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(clamped)
        return (
            df.crossJoin(F.broadcast(mm))
            .select(b.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").alias(out))
        )

    r = _bucketed(ref, "_nr")
    c = _bucketed(cur, "_nc")
    return jsd_from_counts(r, c, n_buckets=n_buckets)


def jsd_from_counts(
    ref_counts: DataFrame,
    cur_counts: DataFrame,
    n_buckets: int = 10,
) -> DataFrame:
    """The JSD contributions from two already-bucketed count tables —
    the :func:`psi_from_counts` twin, so the streamed bucket mart
    (:mod:`streaming.drift`) scores identically to batch
    :func:`jsd_drift`."""
    from kafka_connect_hdfs_spark.operators.similarity import q6_col

    r = ref_counts.select(
        "bucket", F.col(ref_counts.columns[-1]).alias("_nr")
    )
    c = cur_counts.select(
        "bucket", F.col(cur_counts.columns[-1]).alias("_nc")
    )
    base = F.broadcast(
        ref_counts.sparkSession.range(n_buckets).select(
            F.col("id").cast("int").alias("bucket")
        )
    )
    j = (
        base.join(r, "bucket", "left")
        .join(c, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("_nr", F.lit(0)).alias("n_ref"),
            F.coalesce("_nc", F.lit(0)).alias("n_cur"),
        )
    )
    tot = j.agg(
        F.sum("n_ref").alias("_tr"), F.sum("n_cur").alias("_tc")
    )
    p = F.col("n_ref").cast("double") / F.col("_tr").cast("double")
    q = F.col("n_cur").cast("double") / F.col("_tc").cast("double")
    m = (p + q) / F.lit(2.0)
    term = (
        F.when(F.col("n_ref") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("n_cur") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    ) * F.lit(0.5)
    return j.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_ref",
        "n_cur",
        q6_col(term).alias("jsd_contrib"),
    )


def bucket_counts(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 10,
    count_col: str = "n",
) -> DataFrame:
    """:func:`psi_drift`'s per-side bucket kernel with FROZEN literal
    edges → ``(bucket, count_col)``. The bucket index is the identical
    IEEE expression as the batch form (same multiply-then-divide, same
    clamp), so counts folded from micro-batches with pinned ``lo``/``hi``
    (the monitor-setup reference min/max) are bit-identical to the batch
    recompute — the streaming PSI monitor's kernel
    (:mod:`streaming.drift`). Counts are distributive; one
    map-side-combined ≤ ``n_buckets``-row aggregate."""
    v = F.col(value_col).cast("double")
    if float(hi) == float(lo):
        b = F.lit(0)
    else:
        raw = (
            (v - F.lit(float(lo)))
            * F.lit(float(n_buckets))
            / F.lit(float(hi) - float(lo))
        )
        b = F.floor(
            F.greatest(F.lit(0.0), F.least(F.lit(float(n_buckets - 1)), raw))
        ).cast("int")
    return df.select(b.alias("bucket")).groupBy("bucket").agg(
        F.count("*").alias(count_col)
    )


def psi_from_counts(
    ref_counts: DataFrame,
    cur_counts: DataFrame,
    n_buckets: int = 10,
) -> DataFrame:
    """The PSI contributions from two already-bucketed count tables
    (``(bucket, n)`` — :func:`bucket_counts` output, the streaming
    bucket mart, or :func:`psi_drift`'s internal kernels). See
    :func:`psi_drift` for semantics; Laplace smoothing and the 6-dp
    HALF-UP contract are applied here so every producer of counts scores
    identically."""
    from kafka_connect_hdfs_spark.operators.similarity import q6_col

    r = ref_counts.select(
        "bucket", F.col(ref_counts.columns[-1]).alias("_nr")
    )
    c = cur_counts.select(
        "bucket", F.col(cur_counts.columns[-1]).alias("_nc")
    )
    base = F.broadcast(
        ref_counts.sparkSession.range(n_buckets).select(
            F.col("id").cast("int").alias("bucket")
        )
    )
    j = (
        base.join(r, "bucket", "left")
        .join(c, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("_nr", F.lit(0)).alias("n_ref"),
            F.coalesce("_nc", F.lit(0)).alias("n_cur"),
        )
    )
    tot = j.agg(
        F.sum("n_ref").alias("_tr"), F.sum("n_cur").alias("_tc")
    )
    p = (F.col("n_ref") + 1).cast("double") / (
        F.col("_tr") + n_buckets
    ).cast("double")
    q = (F.col("n_cur") + 1).cast("double") / (
        F.col("_tc") + n_buckets
    ).cast("double")
    return j.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_ref",
        "n_cur",
        q6_col((p - q) * F.log(p / q)).alias("psi_contrib"),
    )


def ks_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str = "value",
    quantize_scale: int = 2,
    grid_partitions: "int | None" = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between a reference
    and a current sample of a numeric column — the distribution-shape
    drift gate complementing :func:`psi_drift` (PSI sees bucket mass
    shift; KS sees the largest ECDF gap wherever it lies, without
    choosing bucket edges).

    Values are quantized to HALF-UP integer units (``10**quantize_scale``
    — cents by default) so the ECDFs live on an exact integer grid:
    every comparison, cumulative count and the gap numerator
    ``|c_ref·n_cur − c_cur·n_ref|`` is integer arithmetic (promoted to
    ``decimal(38,0)`` so the products stay exact past 2**63 — the r08
    ADVICE overflow bound at ~3e9 rows/side), order-free and
    engine-replayable; the final ``D = max_gap/(n_ref·n_cur)`` divides
    via the deterministic hi/lo decimal→double split (one IEEE divide,
    6-dp HALF-UP).

    Returns ONE row: ``(n_ref, n_cur, d_num, ks_stat)`` where ``d_num``
    is ``max |c_ref·n_cur − c_cur·n_ref|`` as a deterministic
    split-derived double (exact below 2**53, 1-ulp-deterministic above).

    Scale: per-side counts aggregate map-side onto the quantized grid
    (distinct grid values, not rows, cross the shuffle). The cumulative
    ECDF is a TWO-PHASE prefix sum (r08 verdict item 2 — no
    single-partition window over the grid): the grid is
    ``repartitionByRange`` on ``q``, each range computes a local running
    sum, and per-range totals — one row per PARTITION, bounded by
    cluster width, not data — are prefix-summed and broadcast back as
    offsets. The only unpartitioned window left runs over those
    ≤``grid_partitions`` total rows.
    """
    r = quantized_counts(ref, value_col, quantize_scale, count_col="_nr")
    c = quantized_counts(cur, value_col, quantize_scale, count_col="_nc")
    return ks_from_grids(r, c, grid_partitions=grid_partitions)


def quantized_counts(
    df: DataFrame,
    value_col: str = "value",
    quantize_scale: int = 2,
    count_col: str = "n",
) -> DataFrame:
    """Exact integer value-grid counts: HALF-UP quantize ``value_col`` to
    ``10**quantize_scale`` units and count per grid point →
    ``(q, count_col)``. This is :func:`ks_drift`'s per-side kernel,
    exposed because grid counts are DISTRIBUTIVE — they fold additively
    across micro-batches, which is what makes the streaming KS monitor
    (:mod:`streaming.drift`) bit-identical to the batch recompute.

    Scale: one map-side-combined aggregate; distinct grid values, not
    rows, cross the shuffle."""
    unit = 10**quantize_scale
    v = F.col(value_col).cast("double") * F.lit(float(unit))
    m = F.when(v < 0, -F.floor(-v + F.lit(0.5))).otherwise(
        F.floor(v + F.lit(0.5))
    ).cast("bigint")
    return df.select(m.alias("q")).groupBy("q").agg(
        F.count("*").alias(count_col)
    )


def ks_from_grids(
    ref_grid: DataFrame,
    cur_grid: DataFrame,
    grid_partitions: "int | None" = None,
) -> DataFrame:
    """The KS statistic from two already-quantized integer count grids
    (``(q, _nr)`` / ``(q, _nc)`` — :func:`quantized_counts` output with
    those count names, or any exact-count table on the same grid, e.g.
    the streaming grid mart). See :func:`ks_drift` for the semantics and
    the two-phase prefix-sum plan shape."""
    from pyspark.sql import Window

    from kafka_connect_hdfs_spark.operators.similarity import (
        dec_to_double,
        q6_col,
    )

    r = ref_grid.select("q", F.col(ref_grid.columns[-1]).alias("_nr"))
    c = cur_grid.select("q", F.col(cur_grid.columns[-1]).alias("_nc"))
    grid = r.join(c, "q", "full_outer").select(
        "q",
        F.coalesce("_nr", F.lit(0)).alias("_nr"),
        F.coalesce("_nc", F.lit(0)).alias("_nc"),
    )
    n_parts = (
        grid_partitions
        or ref_grid.sparkSession.sparkContext.defaultParallelism
    )
    # phase 1: range-partition the grid on q; local running sums per range.
    # Both branches below reuse THIS exchange (same subtree → Spark reuses
    # the shuffle), so _pid assignments are consistent by construction.
    ranged = grid.repartitionByRange(n_parts, "q").withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.select(
        "_pid",
        "_nr",
        "_nc",
        F.sum("_nr").over(w_local).alias("_lr"),
        F.sum("_nc").over(w_local).alias("_lc"),
    )
    # phase 2: per-range totals (≤ n_parts ROWS — cluster-width-bounded,
    # not data-bounded) prefix-summed into start offsets; the exclusive
    # window below is the only unpartitioned one and sees ≤ n_parts rows.
    p_tot = local.groupBy("_pid").agg(
        F.sum("_nr").alias("_pr"), F.sum("_nc").alias("_pc")
    )
    w_off = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = p_tot.select(
        "_pid",
        F.coalesce(F.sum("_pr").over(w_off), F.lit(0)).alias("_or"),
        F.coalesce(F.sum("_pc").over(w_off), F.lit(0)).alias("_oc"),
    )
    cum = local.join(F.broadcast(offsets), "_pid").select(
        (F.col("_lr") + F.col("_or")).alias("_cr"),
        (F.col("_lc") + F.col("_oc")).alias("_cc"),
    )
    tot = grid.agg(
        F.sum("_nr").alias("n_ref"), F.sum("_nc").alias("n_cur")
    )

    def _dec(c: F.Column) -> F.Column:
        return c.cast("decimal(38,0)")

    gap = F.abs(
        _dec(F.col("_cr")) * _dec(F.col("n_cur"))
        - _dec(F.col("_cc")) * _dec(F.col("n_ref"))
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.first("n_ref").alias("n_ref"),
            F.first("n_cur").alias("n_cur"),
            F.max(gap).alias("_dnum"),
        )
        .withColumn("_den", _dec(F.col("n_ref")) * _dec(F.col("n_cur")))
        .select(
            "n_ref",
            "n_cur",
            dec_to_double("_dnum").alias("d_num"),
            q6_col(
                dec_to_double("_dnum") / dec_to_double("_den")
            ).alias("ks_stat"),
        )
    )


def benford_profile(
    df: DataFrame, value_col: str = "value", quantize_scale: int = 2
) -> DataFrame:
    """First-significant-digit census of ``|value|`` against Benford's
    law — the classic fabricated-data / unit-mix-up screen for a numeric
    column (real multiplicative data tracks ``log10(1+1/d)``; uniform or
    synthetic generators don't, which the gate fixture demonstrates).

    The digit is extracted EXACTLY on the ``10**-quantize_scale`` grid
    (cents by default): HALF-UP integer units, then the first character
    of the integer's decimal string — integer-to-string is
    engine-unambiguous, unlike double formatting or ``log10`` near
    powers of ten. Values that quantize to zero are excluded (no leading
    digit on the grid).

    DOMAIN ASSUMPTION (r08 ADVICE): the digit is the first significant
    digit of the QUANTIZED value, so magnitudes below the grid report
    the digit of their rounded unit count, not of the raw value
    (``0.025`` → 3 cents → digit 3 at the default scale), and
    ``|v| < 0.5·10**-quantize_scale`` rows are excluded entirely. For a
    currency/cents-shaped business column — the intended domain — the
    grid IS the value domain and the census is exact; for
    small-magnitude or wide-dynamic-range columns, pass a
    ``quantize_scale`` large enough that the grid resolves every
    value's first significant digit.

    Returns 9 rows: ``(digit, n, observed_pct, benford_pct, abs_dev)``
    with the pcts 6-dp HALF-UP from exact integer ratios.

    Scale: one map-side-combined 9-group aggregate; nothing else.
    """
    import math

    from kafka_connect_hdfs_spark.operators.similarity import q6_col

    unit = float(10**quantize_scale)
    v = F.abs(F.col(value_col).cast("double")) * F.lit(unit)
    m = F.floor(v + F.lit(0.5)).cast("bigint")
    digit = F.substring(m.cast("string"), 1, 1).cast("int")
    counts = (
        df.select(m.alias("_m"), digit.alias("digit"))
        .filter(F.col("_m") > 0)
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    spark = df.sparkSession
    expected = spark.createDataFrame(
        [(d, math.log10(1.0 + 1.0 / d)) for d in range(1, 10)],
        "digit int, _exp double",
    )
    tot = counts.agg(F.sum("n").alias("_t"))
    obs = F.col("n").cast("double") / F.col("_t").cast("double")
    return (
        F.broadcast(expected)
        .join(counts, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).alias("n"),
            q6_col(F.coalesce(obs, F.lit(0.0))).alias("observed_pct"),
            q6_col(F.col("_exp")).alias("benford_pct"),
            q6_col(F.abs(F.coalesce(obs, F.lit(0.0)) - F.col("_exp"))).alias(
                "abs_dev"
            ),
        )
        .orderBy("digit")
    )


def mutual_information(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Per-cell mutual-information decomposition of two categorical
    columns: for each ``(a, b)`` cell, exact contingency counts and the
    MI contribution ``(n_ab/N)·ln(n_ab·N/(n_a·n_b))`` — Σ contributions
    is ``I(A;B)``. The corpus-audit question "does source leak language
    (or label leak split)?" answered cell-by-cell, so the offending
    pairing is visible, not just the scalar.

    Counts are exact integers; each contribution is one ln of a ratio of
    count products and one multiply, 6-dp HALF-UP quantized (the PMI
    kernel, text.pmi_collocations) — order-free and replayable. Each
    FACTOR is cast to double BEFORE multiplying (r08 ADVICE: the 64-bit
    products ``n_ab·N`` and ``n_a·n_b`` wrap silently past ~3e9 total
    rows — double products never wrap, are exact below 2**53 per factor,
    and the oracle mirrors the same IEEE ops).

    Rows with a NULL category in EITHER column are excluded upfront
    (same contract as :func:`chi2_independence` / :func:`cramers_v` —
    a join-side drop alone would leave NULL-keyed rows in the
    marginals and N).

    Scale: one shuffle on the (a, b) cell key; marginals are
    vocab-bounded aggregates broadcast back onto the cell table.
    """
    from kafka_connect_hdfs_spark.operators.similarity import q6_col

    cells = (
        # filter on df BEFORE the aliasing select (r11 ADVICE): after the
        # select, F.col(a_col)/F.col(b_col) would resolve against the
        # ALIASED output when the caller's column is literally named "a"
        # or "b" (e.g. mutual_information(df, "x", "a")) — the filter
        # would then check the wrong column and NULL-keyed rows would
        # re-enter the marginals and N
        df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
        .select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
    )
    ma = cells.groupBy("a").agg(F.sum("n_ab").alias("n_a"))
    mb = cells.groupBy("b").agg(F.sum("n_ab").alias("n_b"))
    tot = cells.agg(F.sum("n_ab").alias("_N"))
    contrib = (
        F.col("n_ab").cast("double") / F.col("_N").cast("double")
    ) * F.log(
        (F.col("n_ab").cast("double") * F.col("_N").cast("double"))
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    )
    return (
        cells.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            "n_ab",
            "n_a",
            "n_b",
            q6_col(contrib).alias("mi_contrib"),
        )
        .orderBy("a", "b")
    )


def chi2_independence(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Per-cell chi-squared decomposition of two categorical columns:
    for each ``(a, b)`` cell, the observed count, the independence-
    expected count ``n_a·n_b/N``, and the contribution
    ``(n_ab − e)²/e`` — Σ contributions is the χ² statistic, the classic
    frequentist companion to :func:`mutual_information` (MI measures the
    dependence in nats; χ² weighs it by sample size, which is what a
    fixed significance threshold needs). Cells with zero observed count
    are NOT emitted (the corpus-audit question is "which observed
    pairings are over/under-represented"; absent cells belong to the
    marginal census). Rows with a NULL category in EITHER column are
    excluded from the census entirely via an explicit upfront filter
    (r10 ADVICE: relying on the equi-joins alone drops only the output
    cells while the marginals and N still count NULL-keyed rows,
    inflating every expected count; same contract as
    :func:`mutual_information` and :func:`cramers_v`; coalesce to a
    sentinel upstream if NULL is a category of interest).

    Counts are exact integers; each FACTOR casts to double before
    multiplying (the r08 MI ADVICE overflow class — 64-bit count
    products wrap past ~3e9 rows; double products never wrap), expected
    and contribution are a fixed IEEE expression tree mirrored by the
    oracle, 6-dp HALF-UP.

    Scale: identical to MI — one shuffle on the (a, b) cell key;
    vocab-bounded marginals broadcast back.
    """
    from kafka_connect_hdfs_spark.operators.similarity import q6_col

    cells = (
        # filter BEFORE the aliasing select — see mutual_information
        # (r11 ADVICE: a caller column literally named "a"/"b" would
        # otherwise be filtered against the aliased output)
        df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
        .select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
    )
    ma = cells.groupBy("a").agg(F.sum("n_ab").alias("n_a"))
    mb = cells.groupBy("b").agg(F.sum("n_ab").alias("n_b"))
    tot = cells.agg(F.sum("n_ab").alias("_N"))
    e = (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    ) / F.col("_N").cast("double")
    diff = F.col("n_ab").cast("double") - e
    return (
        cells.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            "n_ab",
            q6_col(e).alias("expected"),
            q6_col((diff * diff) / e).alias("chi2_contrib"),
        )
        .orderBy("a", "b")
    )


def column_completeness(
    tables: "dict[str, DataFrame]",
) -> DataFrame:
    """Null/blank census for every column of every table in one pass per
    table: ``(table, column, n_rows, n_null, n_blank, complete_pct)``
    (blank = trimmed-empty string, only meaningful for string columns,
    0 elsewhere). The first audit a landing runs before downstream teams
    point jobs at it — :func:`profile_table` per-column stats with the
    cross-TABLE matrix shape dashboards want.

    Scale: ONE aggregate per table covering all its columns (no
    per-column scan loop); the unpivot runs on single aggregated rows.
    """
    from functools import reduce

    from pyspark.sql import types as T

    pieces = []
    for name, df in tables.items():
        aggs = [F.count("*").alias("_n")]
        for c in df.columns:
            aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"))
            if isinstance(df.schema[c].dataType, T.StringType):
                blank = (
                    F.col(c).isNotNull() & (F.length(F.trim(F.col(c))) == 0)
                ).cast("long")
            else:
                blank = F.lit(0).cast("long")
            aggs.append(F.sum(blank).alias(f"_blank_{c}"))
        one = df.agg(*aggs)
        rows = [
            F.struct(
                F.lit(name).alias("table"),
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{c}").alias("n_null"),
                F.col(f"_blank_{c}").alias("n_blank"),
            )
            for c in df.columns
        ]
        pieces.append(
            one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
        )
    from kafka_connect_hdfs_spark.operators.similarity import q6_col

    out = reduce(lambda x, y: x.unionByName(y), pieces)
    pct = (
        (F.col("n_rows") - F.col("n_null") - F.col("n_blank")).cast("double")
        / F.col("n_rows").cast("double")
    )
    return out.select(
        "table",
        "column",
        "n_rows",
        "n_null",
        "n_blank",
        q6_col(F.when(F.col("n_rows") > 0, pct).otherwise(F.lit(1.0))).alias(
            "complete_pct"
        ),
    ).orderBy("table", "column")


def cramers_v(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Scalar association strength between two categorical columns:
    Cramér's V = √(χ²/(N·(min(r,c)−1))) ∈ [0,1] — the normalized
    companion to :func:`chi2_independence` (χ² grows with N; V is the
    effect size a mixing audit can threshold). NULL categories are
    excluded exactly as in chi2/MI.

    Cross-engine determinism: a raw Σ of double χ² contributions is
    accumulation-order-dependent, so each cell's contribution is 6-dp
    HALF-UP quantized to a micro-unit BIGINT first and the SUM is exact
    integer arithmetic (the `_OQ6INT` oracle pattern) — the χ² the two
    engines see is bit-identical by construction, and √ of identical
    doubles is identical.

    Scale: identical to χ² — one (a,b) cell shuffle, broadcast
    marginals; the quantized fold is a plain integer sum.
    """
    from kafka_connect_hdfs_spark.operators.similarity import q6_col

    cells = (
        # explicit upfront exclusion (not a join side effect) so N, r, c
        # and the fold all see the same census; filter BEFORE the
        # aliasing select so a caller column literally named "a"/"b"
        # resolves against the caller's frame (r11 ADVICE)
        df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
        .select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
    )
    ma = cells.groupBy("a").agg(F.sum("n_ab").alias("n_a"))
    mb = cells.groupBy("b").agg(F.sum("n_ab").alias("n_b"))
    tot = cells.agg(
        F.sum("n_ab").alias("_N"),
        F.count_distinct("a").alias("_r"),
        F.count_distinct("b").alias("_c"),
    )
    e = (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    ) / F.col("_N").cast("double")
    diff = F.col("n_ab").cast("double") - e
    from kafka_connect_hdfs_spark.operators.similarity import (
        fp_sum_micro_q6,
    )

    # fp_sum_micro_q6, NOT (q6*1e6).cast(long): the float round-trip
    # q/1e6·1e6 truncates to q−1 on ~1% of micro values — the exact
    # hazard that helper exists for (r10 review find)
    folded = (
        cells.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
        .groupBy("_N", "_r", "_c")
        .agg(
            fp_sum_micro_q6(q6_col((diff * diff) / e)).alias("_chi2_micro"),
            fp_sum_micro_q6(q6_col(e)).alias("_e_micro"),
        )
    )
    # cells is OBSERVED pairs only; every unobserved (a, b) cell
    # contributes exactly its expectation e to chi² ((0−e)²/e = e), and
    # Σe over ALL r·c cells is N — so the zero-cell mass is N − Σe_obs.
    # Without it V caps below 1 even for perfect association.
    # the zero-cell term N − Σq6(e) can overshoot by ~5e-7·r·c half-up
    # roundings; near perfect independence chi2 then goes slightly
    # negative and sqrt yields NaN — clamp to 0 (r10 ADVICE), mirrored
    # in the DuckDB oracle
    chi2 = F.greatest(
        F.col("_chi2_micro").cast("double") / F.lit(1e6)
        + (
            F.col("_N").cast("double")
            - F.col("_e_micro").cast("double") / F.lit(1e6)
        ),
        F.lit(0.0),
    )
    denom = F.col("_N").cast("double") * (
        F.least(F.col("_r"), F.col("_c")) - F.lit(1)
    ).cast("double")
    return folded.select(
        F.col("_N").cast("long").alias("n_rows"),
        F.col("_r").cast("long").alias("n_cat_a"),
        F.col("_c").cast("long").alias("n_cat_b"),
        q6_col(chi2).alias("chi2"),
        # min(r,c)=1 makes the denominator 0 (and chi2 exactly 0): a
        # constant column has no measurable association — define V=0
        # instead of emitting engine-divergent NaN
        F.when(
            F.least(F.col("_r"), F.col("_c")) > 1,
            q6_col(F.sqrt(chi2 / denom)),
        )
        .otherwise(F.lit(0.0))
        .alias("cramers_v"),
    )


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """Join/shuffle-key skew diagnostics — the pre-flight an engineer
    runs before keying a 100 TB join: one row of
    ``(n_keys, n_rows, max_share, top10_share, gini)`` over the key's
    count distribution. Gini via the exact rank formula
    ``(2·Σ i·cᵢ − (K+1)·Σc) / (K·Σc)`` with counts sorted ascending —
    every term an exact integer, so the 6-dp result is deterministic
    (tie order between equal counts provably does not change Σ i·cᵢ).

    Scale: ONE shuffle builds the per-key counts (map-side combined);
    the rank/fold runs over K rows (key cardinality), never the corpus.
    The window over counts is a single global sort of K rows — at
    extreme K, range-partition the prefix sum like quality.ks_drift.
    """
    from kafka_connect_hdfs_spark.operators.similarity import q6_col
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.count("*").alias("_c")
    )
    w = Window.orderBy(F.col("_c").asc())
    ranked = counts.select(
        "_c", F.row_number().over(w).alias("_i")
    )
    top10 = (
        counts.orderBy(F.desc("_c"))
        .limit(10)
        .agg(F.sum("_c").alias("_t10"))
    )
    agg = ranked.agg(
        F.count("*").alias("_K"),
        F.sum("_c").alias("_n"),
        F.max("_c").alias("_mx"),
        F.sum(F.col("_i") * F.col("_c")).alias("_ic"),
    ).crossJoin(F.broadcast(top10))
    n = F.col("_n").cast("double")
    return agg.select(
        F.col("_K").cast("long").alias("n_keys"),
        F.col("_n").cast("long").alias("n_rows"),
        q6_col(F.col("_mx").cast("double") / n).alias("max_share"),
        q6_col(F.col("_t10").cast("double") / n).alias("top10_share"),
        q6_col(
            (
                F.lit(2.0) * F.col("_ic").cast("double")
                - (F.col("_K") + 1).cast("double") * n
            )
            / (F.col("_K").cast("double") * n)
        ).alias("gini"),
    )
