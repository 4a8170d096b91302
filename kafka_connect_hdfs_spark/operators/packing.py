"""Corpus-preparation operators: sequence packing, PII scrubbing, splits.

Beyond the reference's surface (it has no expression layer — SURVEY.md §2.9);
these are the last-mile operations a training-data pipeline runs after
dedup/filtering and before tokenized shards are written:

  - with_sequence_packing: concatenate-and-chunk documents into fixed
    token-budget training sequences (the GPT-style packing layout)
  - scrub_pii: regex redaction of emails / IPv4s / SSN-shaped ids with
    per-document redaction counts
  - split_corpus: deterministic hash-based train/val/test assignment

All are built from JVM-side built-in functions only (whole-stage codegen;
no Python UDFs), deterministic, and SQL-expressible so the DuckDB oracle
verifies them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_connect_hdfs_spark.functions import fan_out

#: Public-shape PII patterns, valid in both Java regex (Spark) and RE2
#: (DuckDB oracle): email, dotted-quad IPv4, SSN-shaped ddd-dd-dddd ids.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "id_number": r"\b\d{3}-\d{2}-\d{4}\b",
}


def _hash_uniform(col: F.Column, salt: str = "") -> F.Column:
    """Deterministic uniform in [0, 1) from md5 — reproducible across
    engines/partitionings (same trick as text.stratified_sample)."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("double") / F.lit(
        float(1 << 48)
    )


def with_sequence_packing(
    df: DataFrame,
    budget: int = 2048,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    shards: int = 64,
) -> DataFrame:
    """Concatenate-and-chunk sequence packing: documents are laid end-to-end
    in deterministic (shard, id) order and cut into ``budget``-token
    training sequences; each document is assigned to the sequence where its
    first token lands. Returns the pruned assignment table
    ``(id, n_tokens, shard, seq, offset_in_seq)`` — join text back by id
    when materializing shards, so the text column never enters the shuffle.

    Scale: the corpus is split into ``shards`` independent hash shards
    (md5-uniform, so shard sizes are balanced) and the running-total window
    runs per shard — the sort is (corpus/shards)-sized, parallel across
    executors, and carries only (id, n_tokens) ≈ 16 B/doc. At 100 TB raise
    ``shards`` so each shard's projection fits an executor's sort buffer;
    assignment quality is unaffected because packing is per-shard by
    construction.
    """
    shard = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10
        ).cast("bigint"),
        F.lit(shards),
    )
    pruned = df.select(F.col(id_col), F.col(token_col).cast("bigint"), shard.alias("shard"))
    w = Window.partitionBy("shard").orderBy(id_col)
    cum = F.sum(token_col).over(w)
    start = (cum - F.col(token_col)).alias("start_tok")
    return pruned.select(
        F.col(id_col),
        F.col(token_col),
        F.col("shard"),
        F.floor(start / F.lit(budget)).alias("seq"),
        (start % F.lit(budget)).alias("offset_in_seq"),
    )


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Redact PII-shaped spans, replacing each match with ``<TYPE>`` and
    counting redactions per type (``n_<type>`` columns) plus a
    ``scrubbed_fp`` md5 fingerprint of the redacted text.

    Scale: pure map-side codegen — a regexp_extract_all count and a chained
    regexp_replace per pattern; no shuffle, no state. Patterns are applied
    in sorted-name order so output is deterministic regardless of dict
    ordering.
    """
    pats = patterns if patterns is not None else PII_PATTERNS
    df = fan_out(df)
    t = F.col(text_col)
    scrubbed = t
    counts = []
    for name in sorted(pats):
        pat = pats[name]
        counts.append(
            F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return df.select(
        "*", *counts, F.md5(scrubbed).alias("scrubbed_fp")
    )


def split_corpus(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: uniform(md5(salt || id))
    against cumulative weight boundaries. Hash-based splits are stable
    under re-runs, engine changes, and corpus growth (a document's split
    never changes when others are added/removed) — unlike randomSplit,
    which depends on partition layout.

    Scale: map-side CASE expression, no shuffle. The salt namespaces
    independent splits over the same corpus.
    """
    ws = weights if weights is not None else {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(ws.values())
    u = _hash_uniform(F.col(id_col), salt)
    expr = None
    acc = 0.0
    # deterministic boundary order: sorted by name
    items = sorted(ws.items())
    for name, wgt in items[:-1]:
        acc += wgt / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", split)


def shuffle_order(
    df: DataFrame,
    shards: int = 64,
    id_col: str = "doc_id",
    seed: str = "epoch0",
) -> DataFrame:
    """Deterministic global training order: every row gets a reproducible
    (shard, position) from md5(seed || id) — the shuffled data order a
    training run consumes, stable across engines and re-runs (unlike
    ``orderBy(rand())``). Changing ``seed`` gives an independent
    permutation per epoch.

    Scale: shard assignment is map-side; the position sort is per-shard
    (corpus/shards rows), exactly the layout a sharded dataloader wants —
    there is never a global sort. Position is the rank of the hash within
    the shard.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    u = F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint")
    shard = F.pmod(F.conv(F.substring(h, 13, 12), 16, 10).cast("bigint"), F.lit(shards))
    w = Window.partitionBy("shard").orderBy("sort_key", id_col)
    return (
        df.withColumn("sort_key", u)
        .withColumn("shard", shard)
        .withColumn("position", F.row_number().over(w))
        .drop("sort_key")
    )


def pack_sequences_bestfit(
    df: DataFrame,
    budget: int = 2048,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    shards: int = 64,
) -> DataFrame:
    """First-fit-decreasing bin packing: documents are NEVER split across
    sequences (the no-truncation packing used when document integrity
    matters); docs longer than ``budget`` get a dedicated overflow bin.
    Returns ``(id, n_tokens, shard, seq)``.

    Greedy FFD is inherently sequential, so this is the legitimately
    imperative sibling of :func:`with_sequence_packing` — implemented as
    ``applyInPandas`` over hash shards: each shard's pruned (id, tokens)
    projection packs independently in one Arrow batch. Deterministic:
    shard assignment is md5-based, packing order is (tokens desc, id).

    Scale: same shuffle profile as the window variant (one shuffle of the
    ~16 B/doc projection, keyed by shard); Python cost is O(docs × bins)
    per shard — size ``shards`` so a shard's doc count keeps that cheap.
    """
    import pandas as pd

    shard = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10
        ).cast("bigint"),
        F.lit(shards),
    )
    pruned = df.select(
        F.col(id_col), F.col(token_col).cast("bigint"), shard.alias("shard")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [token_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        bin_loads: list[int] = []
        seqs = []
        for tok in pdf[token_col]:
            placed = None
            for b, load in enumerate(bin_loads):
                if load + tok <= budget:
                    placed = b
                    break
            if placed is None:
                placed = len(bin_loads)
                bin_loads.append(0)
            bin_loads[placed] += int(tok)
            seqs.append(placed)
        pdf["seq"] = pd.Series(seqs, dtype="int64")
        return pdf

    out_schema = f"{id_col} long, {token_col} long, shard long, seq long"
    return pruned.groupBy("shard").applyInPandas(pack, schema=out_schema)


def token_budget_sample(
    df: DataFrame,
    budget: int,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    shards: int = 1,
    seed: str = "budget0",
) -> DataFrame:
    """Per-language token-budget curation: deterministically shuffle each
    language's documents (md5-uniform order) and keep documents while the
    language's running token total stays within ``budget`` — the "take 100 B
    tokens of German, 2 T of English" allocation step of training-data
    mixing (a fair random sample of exactly-budgeted size, not a quality
    cut — compose with quality_percentile_filter upstream for that).

    Returns ``(lang, shard, doc_id, n_tokens, cum_tokens)`` for kept docs.

    Scale: the running total is a window per ``(lang, shard)``; with
    ``shards=1`` the cut is exact but a dominant language sorts in one
    task — at 100 TB set ``shards`` so each shard's slice fits an executor
    and give each shard ``budget/shards``: the md5 shard assignment is
    uniform, so per-shard budgets converge to the same sample (the exact
    form is the oracle-checkable reference; the sharded form is what runs
    at scale and is oracle-checkable too — same SQL, more partitions).
    Only the pruned ``(lang, id, n_tokens)`` projection shuffles.
    """
    u = _hash_uniform(F.col(id_col), seed)
    shard = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed + "#s"), F.col(id_col).cast("string"))), 1, 12),
            16,
            10,
        ).cast("bigint"),
        F.lit(shards),
    )
    per_shard_budget = budget // shards
    w = (
        Window.partitionBy(lang_col, "shard")
        .orderBy("u", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(lang_col),
            shard.alias("shard"),
            F.col(id_col),
            F.col(token_col).cast("bigint").alias(token_col),
            u.alias("u"),
        )
        .withColumn("cum_tokens", F.sum(token_col).over(w))
        .filter(F.col("cum_tokens") <= per_shard_budget)
        .drop("u")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "wsample0",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis & Spirakis,
    "Weighted random sampling with a reservoir", IPL 2006 — the A-ES
    algorithm): each row draws an exponential race key ``-ln(u) / w`` and
    the k smallest keys win, which selects row i with probability
    proportional to ``w_i`` at every step. Used for quality-weighted corpus
    selection ("sample 10 M docs, long/high-quality docs proportionally
    more often").

    ``u`` is a hash-uniform in (0, 1] derived from md5(seed || id) — NOT
    ``rand()`` — so the sample is reproducible across runs, engines, and
    partition layouts, and an interrupted job resumes with the identical
    sample. Rows with non-positive weight are excluded (their inclusion
    probability is 0).

    Scale: the plan is a map-side key projection + ``TakeOrderedAndProject``
    — every partition forwards only its local k best rows, so the merge
    cost is k * n_partitions regardless of corpus size; there is no global
    sort and no shuffle of the corpus. Beyond the reference's surface
    (SURVEY.md §2.9 — its query layer is Hive-delegated).
    """
    h = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    # (hash + 1) / 2^48 lies in (0, 1]: ln() never sees 0, and ln(1) = 0 is
    # a valid (winning) key.
    u = (F.conv(F.substring(h, 1, 12), 16, 10).cast("double") + F.lit(1.0)) / F.lit(
        float(1 << 48)
    )
    key = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("sample_key", key)
        .orderBy(F.asc("sample_key"), F.col(id_col))
        .limit(k)
        .drop("sample_key")
    )


def chunk_with_overlap(
    df: DataFrame,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Sliding-window token chunking with overlap — the RAG / long-context
    pretraining layout: document tokens are cut into windows of ``window``
    whitespace tokens starting every ``stride`` tokens (``window - stride``
    tokens of overlap between consecutive chunks), so no span longer than
    ``stride`` is ever lost at a boundary. The final partial window is kept
    (a document shorter than ``window`` yields exactly one chunk). Returns
    ``(id, chunk_idx, start_token, n_chunk_tokens, chunk_text)``.

    NOTE ``chunk_text`` is rebuilt from the token stream, which casefolds
    (default) and collapses whitespace runs — the dedup-normalized form.
    Pass ``lowercase=False`` to keep original casing when the chunks ARE
    the payload (RAG contexts, training text); whitespace runs still
    collapse to single spaces either way (token-joining is inherent to
    the window/slice layout).

    Scale: pure map-side — tokenization is one split, window starts are a
    per-row ``sequence`` + ``posexplode``, and each chunk is a ``slice`` of
    the token array; no shuffle, no UDF, whole-stage codegen end to end.
    Row growth is len/stride ≈ the same constant factor the trained model
    sees; filters on the output (e.g. chunk-level dedup via
    :func:`operators.dedup.chunk_dedup`) still push down to the scan.
    """
    if not 0 < stride <= window:
        raise ValueError(f"need 0 < stride ({stride}) <= window ({window})")
    base = F.trim(F.col(text_col))
    if lowercase:
        base = F.lower(base)
    toks = F.split(base, r"\s+")
    n = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
        F.size(toks)
    )
    # window start offsets 0, stride, 2*stride, ... — one window when the
    # doc fits, else enough that the last window reaches the final token
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.lit(0),
            F.floor((n - F.lit(window) + F.lit(stride) - 1) / F.lit(stride)).cast(
                "int"
            )
            * F.lit(stride),
        ),
        F.lit(stride),
    )
    return (
        df.filter(n > 0)
        .select(
            F.col(id_col),
            toks.alias("_toks"),
            n.alias("_n"),
            F.posexplode(starts).alias("chunk_idx", "start_token"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.col("start_token").cast("bigint").alias("start_token"),
            F.least(
                F.lit(window), F.col("_n") - F.col("start_token")
            ).cast("bigint").alias("n_chunk_tokens"),
            F.array_join(
                F.slice(F.col("_toks"), F.col("start_token") + 1, window), " "
            ).alias("chunk_text"),
        )
    )


def temperature_sample(
    df: DataFrame,
    budget_tokens: int,
    alpha: float = 0.5,
    lang_col: str = "lang",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "temp0",
) -> DataFrame:
    """Temperature-based language rebalancing (the multilingual-pretraining
    mixing rule of XLM-R, arXiv:1911.02116): language ``l`` with ``T_l``
    corpus tokens gets target share ``q_l ∝ T_l^alpha`` — ``alpha < 1``
    flattens the distribution toward low-resource languages. Each document
    is kept independently with probability
    ``rate_l = min(1, q_l · budget_tokens / T_l)`` via the deterministic
    md5-uniform draw, so the EXPECTED kept-token total is ``budget_tokens``
    (up to head-room lost where rate_l clips at 1) and the run is exactly
    reproducible. Adds ``keep_rate`` to surviving rows.

    Compared to :func:`token_budget_sample` (hard per-language running-total
    cut): this is the probabilistic mixing form — no window, no ordering,
    embarrassingly parallel, and the mix ratio rather than the cap is the
    contract.

    Scale: ONE tiny aggregate (rows = #languages, partial-aggregated
    map-side) collected to the driver; rates enter the plan as a literal
    map and the keep decision is a map-side hash comparison — the corpus
    itself never shuffles (plan-guarded).

    alpha=0.5 intentionally computes via sqrt (correctly rounded in IEEE
    754, so any SQL replayer agrees bitwise); other alphas go through pow,
    whose last-ulp may differ across libms — rates are rounded to 6 dp to
    absorb that.
    """
    import math

    totals = {
        r[0]: int(r[1] or 0)
        for r in df.groupBy(lang_col).agg(F.sum(token_col)).collect()
    }
    # a language whose docs are all empty contributes no tokens: rate 0,
    # never a division by zero (and if EVERY language is empty, z would be
    # 0 — nothing can be kept either way)
    totals = {l: t for l, t in totals.items() if t > 0}
    if not totals:
        return df.withColumn("keep_rate", F.lit(0.0)).filter(F.lit(False))
    w = {
        l: (math.sqrt(t) if alpha == 0.5 else t ** alpha)
        for l, t in totals.items()
    }
    z = sum(w[l] for l in sorted(w))
    rates = {
        l: round(min(1.0, (w[l] / z) * budget_tokens / totals[l]), 6)
        for l in totals
    }
    mapping = F.create_map(
        *[x for l in sorted(rates) for x in (F.lit(l), F.lit(rates[l]))]
    )
    u = _hash_uniform(F.col(id_col), salt)
    return (
        df.withColumn("keep_rate", mapping[F.col(lang_col)])
        .filter(u < F.col("keep_rate"))
    )


def curriculum_order(
    df: DataFrame,
    buckets: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "cur0",
    thresholds: list[float] | None = None,
) -> DataFrame:
    """Quality-bucketed curriculum ordering: score every document with the
    heuristic quality composite, band into ``buckets`` quality tiers
    (bucket 1 = cleanest, trained first — the standard easy-to-hard
    curriculum), and shuffle deterministically WITHIN each tier so ordering
    inside a difficulty band stays i.i.d. Returns
    ``(doc_id, quality_score, bucket, shuffle_key)`` sorted by
    ``(bucket, shuffle_key, doc_id)`` — the row order IS the curriculum.

    Two banding strategies (same contract as quality_percentile_filter):

    * ``thresholds=None`` (exact): ``ntile(buckets)`` over score desc — a
      global sort, fine up to ~10⁹ rows and the oracle-checkable reference
      form.
    * ``thresholds=[t1 > t2 > ...]`` (scale): descending score cuts taken
      from a prior ``percentile_approx`` pass; banding becomes a map-side
      comparison chain and NOTHING global remains — the output sort is by
      (bucket, md5-key), which the training-data writer consumes as a
      partitioned write (`partitionBy(bucket)` + sortWithinPartitions),
      never a single-task sort.
    """
    from kafka_connect_hdfs_spark.operators.text import with_quality_score

    scored = with_quality_score(df, text_col).select(
        F.col(id_col), F.col("quality_score")
    )
    if thresholds is None:
        w = Window.orderBy(F.desc("quality_score"), F.asc(id_col))
        bucket = F.ntile(buckets).over(w)
    else:
        bucket = F.lit(1)
        for t in thresholds:
            bucket = bucket + F.when(
                F.col("quality_score") < t, F.lit(1)
            ).otherwise(F.lit(0))
    key = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    return (
        scored.select(
            F.col(id_col),
            "quality_score",
            bucket.alias("bucket"),
            key.alias("shuffle_key"),
        )
        .orderBy("bucket", "shuffle_key", id_col)
    )


def pack_manifest(
    assignment: DataFrame,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-sequence document-boundary manifest over a
    :func:`with_sequence_packing` assignment — the span metadata an
    attention-mask builder needs to stop cross-document attention inside a
    packed training sequence (and the shard-writer's table of contents).
    One row per (shard, seq): member count, tokens STARTING in the
    sequence (a tail document whose offset+len exceeds the budget
    continues into the next sequence — visible in the spans), first/last
    member ids, and the ordered span fingerprint ``md5("id:offset:len
    ...")``.

    Spans are ordered by ``(offset_in_seq, id)`` — offsets are unique
    within a sequence for non-empty documents (laid end-to-end), but a
    ZERO-token document shares its successor's offset, so the id
    tie-break is what keeps the fingerprint partition-order-free and
    SQL-replayable in that case too.

    Scale: input is already the pruned (id, tokens, shard, seq, offset)
    table (~24 B/doc); the groupBy key (shard, seq) subdivides the
    existing shard partitioning and combines map-side. No text, no
    corpus re-read.
    """
    span = F.concat_ws(
        ":",
        F.col(id_col).cast("string"),
        F.col("offset_in_seq").cast("string"),
        F.col(token_col).cast("string"),
    )
    ordered = F.array_sort(
        F.collect_list(
            F.struct(F.col("offset_in_seq"), F.col(id_col), span.alias("_s"))
        )
    )
    return assignment.groupBy("shard", "seq").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_col).alias("tokens_started"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
        F.md5(
            F.array_join(F.transform(ordered, lambda s: s["_s"]), " ")
        ).alias("spans_fp"),
    )


def split_leakage_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "split",
) -> DataFrame:
    """Train/test contamination audit for hash-by-id splitting: counts
    normalized-text fingerprints whose COPIES land in more than one split
    — the leakage that makes held-out metrics lie when splitting happens
    before dedup. Two rows: the ``raw`` corpus (leaks whenever duplicates
    exist) and the ``deduped`` corpus (keep-first first — zero by
    construction, the audit's own proof that dedup-then-split is the
    correct order). Columns: (stage, n_leaked_fingerprints,
    n_docs_affected).

    Scale: fingerprint + split are map-side; one groupBy per stage on the
    fingerprint (uniform key), one two-row summary each. Text never
    shuffles.
    """
    from kafka_connect_hdfs_spark.operators.dedup import dedup_keep_first

    def leak(stage_df: DataFrame, stage: str) -> DataFrame:
        fp = F.md5(
            F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
        )
        per_fp = (
            split_corpus(stage_df, id_col=id_col, salt=salt)
            .select(fp.alias("_fp"), "split")
            .groupBy("_fp")
            .agg(
                F.countDistinct("split").alias("_n_splits"),
                F.count("*").alias("_n_docs"),
            )
        )
        return per_fp.agg(
            F.lit(stage).alias("stage"),
            F.sum((F.col("_n_splits") > 1).cast("int"))
            .cast("bigint")
            .alias("n_leaked_fingerprints"),
            F.sum(
                F.when(F.col("_n_splits") > 1, F.col("_n_docs")).otherwise(0)
            )
            .cast("bigint")
            .alias("n_docs_affected"),
        )
    raw = leak(df, "raw")
    deduped = leak(dedup_keep_first(df, id_col=id_col, text_col=text_col), "deduped")
    return raw.unionByName(deduped).orderBy("stage")


def source_token_budget(
    df: DataFrame,
    total_budget: int,
    weights: "dict[str, int] | None" = None,
    max_epochs: int = 4,
    rounds: int = 3,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Data-constrained training-budget allocation across sources
    (Muennighoff et al. 2023, "Scaling Data-Constrained Language Models"):
    split ``total_budget`` tokens across sources proportionally to integer
    mix ``weights`` (uniform when omitted — availability-proportional
    weighting makes the cap bind all-or-none, so a target MIX is the real
    input), cap every source at ``max_epochs`` repetitions of its
    available tokens — beyond ~4 epochs repeated data stops helping — and
    waterfill the budget freed by capped sources back onto uncapped ones
    for ``rounds`` fixed redistribution rounds.

    Returns ``(source, avail_tokens, alloc_tokens, epochs)``; epochs =
    alloc/avail HALF_UP-rounded to 6 dp.

    Determinism across engines: ALL allocation arithmetic is integer —
    shares are ``floor(remaining·w/total_w)`` — so the SQL oracle replays
    bit-exactly with no float-summation-order hazard; a sub-|sources|
    integer remainder may stay unallocated after the fixed rounds
    (deterministic). Keep budget × max weight inside int64 (switch both
    sides to DECIMAL beyond that).

    Scale: the corpus-sized work is ONE token-count aggregation (map-side
    partial, |sources| result); the waterfill itself runs on the collected
    |sources|-row table — bounded by contract, like codebooks and merge
    tables.
    """
    import math

    t = F.trim(F.col(text_col))
    n_tok = (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("bigint")
    )
    rows = (
        df.select(F.col(source_col).alias("source"), n_tok.alias("_n"))
        .groupBy("source")
        .agg(F.sum("_n").alias("avail"))
        .collect()
    )
    avail = {r["source"]: int(r["avail"]) for r in rows}
    w = {s: int((weights or {}).get(s, 1)) for s in avail}
    cap = {s: max_epochs * a for s, a in avail.items()}
    alloc = {s: 0 for s in avail}
    remaining = int(total_budget)
    for _ in range(rounds):
        uncapped = [s for s in sorted(avail) if alloc[s] < cap[s]]
        total_w = sum(w[s] for s in uncapped)
        if remaining <= 0 or total_w == 0:
            break
        spent = 0
        for s in uncapped:
            add = (remaining * w[s]) // total_w
            new = min(alloc[s] + add, cap[s])
            spent += new - alloc[s]
            alloc[s] = new
        remaining -= spent
    out_rows = [
        (
            s,
            avail[s],
            alloc[s],
            math.floor(alloc[s] / avail[s] * 1e6 + 0.5) / 1e6 if avail[s] else 0.0,
        )
        for s in sorted(avail)
    ]
    return df.sparkSession.createDataFrame(
        out_rows,
        "source string, avail_tokens bigint, alloc_tokens bigint, epochs double",
    )


def length_buckets(
    df: DataFrame,
    text_col: str = "text",
    max_bucket_cap: int = 1 << 20,
) -> DataFrame:
    """Power-of-two length bucketing for batched inference/training:
    every document lands in the smallest bucket whose capacity
    ``2^k`` holds its whitespace token count, and each bucket reports
    the padding economics of batching at that capacity — ``(bucket_cap,
    n_docs, total_tokens, padded_tokens, pad_waste_ratio)``. The
    standard pre-serving analysis (dynamic batching by length class):
    a high waste ratio in a bucket says its range should be split or
    its members packed (:func:`pack_sequences_bestfit`) instead of
    padded.

    Determinism: everything is integer arithmetic until the single
    final ratio (exact-int division, one rounded double per bucket).
    Scale: one projection + one bucket-keyed partial-combined aggregate
    — the shuffle carries ≤ log2(max_len) rows per partition. Empty
    docs count as length 1 (they still occupy a slot when batched).
    """
    t = F.trim(F.lower(F.col(text_col)))
    n_tok = F.when(F.length(t) == 0, F.lit(1)).otherwise(
        F.size(F.split(t, r"\s+"))
    )
    # exponent via bit length (length of bin(n-1)), NOT ceil(log2(n)):
    # float log2 can land a hair above/below an integer on exact powers
    # of two and the two engines need not agree — bin() is exact integer
    # logic on both. 2^k maps n=1 -> 1, 2 -> 2, 3..4 -> 4, ...
    k = F.when(n_tok <= 1, F.lit(0)).otherwise(
        F.length(F.bin((n_tok - 1).cast("bigint")))
    )
    cap = F.least(
        F.pow(F.lit(2.0), k.cast("double")).cast("bigint"),
        F.lit(max_bucket_cap).cast("bigint"),
    )
    buck = df.select(
        n_tok.cast("bigint").alias("n_tok"),
        cap.alias("bucket_cap"),
    )
    return (
        buck.groupBy("bucket_cap")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum(F.col("bucket_cap") - F.col("n_tok")).alias(
                "padded_tokens"
            ),
        )
        .select(
            "bucket_cap",
            "n_docs",
            "total_tokens",
            "padded_tokens",
            F.round(
                F.col("padded_tokens").cast("double")
                / (
                    F.col("bucket_cap").cast("double")
                    * F.col("n_docs").cast("double")
                ),
                6,
            ).alias("pad_waste_ratio"),
        )
    )


def rehydrate_sequences(
    docs: DataFrame,
    assignment: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Serving-side materializer for :func:`with_sequence_packing`: joins
    text back by id and reconstructs every packed training sequence at
    TOKEN level, including documents whose tail overflows into later
    sequences (the assignment has one row per doc — the continuation
    spans are derived here). Returns one row per ``(shard, seq)`` with
    ``(n_docs, n_tokens_filled, text_fp)`` where ``text_fp`` fingerprints
    the exact ordered token stream — the end-to-end proof that
    pack-then-materialize loses or duplicates nothing.

    ``assignment``'s ``token_col`` MUST equal the whitespace token count
    of ``trim(text)`` (the packing convention) or spans will misalign;
    zero-token documents occupy no tokens and are excluded from
    reconstruction.

    Scale: the ONLY stage that touches text is the final per-sequence
    concat, and each doc's text is sliced map-side into just the pieces
    that land in each sequence — the shuffle carries (shard, seq)-keyed
    pieces once, pre-subdivided by the existing shard partitioning. The
    span fan-out per doc is ceil(n_tokens/budget)+1 rows, bounded.
    """
    t = F.trim(F.col(text_col))
    toks = F.when(
        F.length(t) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(t, r"\s+"))
    joined = docs.select(F.col(id_col), toks.alias("_tk")).join(
        assignment.filter(F.col(token_col) > 0), id_col
    )
    start = F.col("seq") * budget + F.col("offset_in_seq")
    last_seq = F.floor(
        (start + F.col(token_col) - 1) / F.lit(budget)
    )
    spans = joined.select(
        F.col(id_col),
        "_tk",
        "shard",
        F.col(token_col).alias("_n"),
        start.alias("_start"),
        F.explode(F.sequence(F.col("seq"), last_seq)).alias("s"),
    )
    gstart = F.greatest(F.col("s") * budget, F.col("_start"))
    gend = F.least(
        (F.col("s") + 1) * budget, F.col("_start") + F.col("_n")
    )
    pieces = spans.select(
        "shard",
        F.col("s").alias("seq"),
        (gstart - F.col("s") * budget).alias("_off"),
        F.col(id_col).alias("_id"),
        (gend - gstart).alias("_flen"),
        F.array_join(
            F.slice(
                F.col("_tk"),
                (gstart - F.col("_start") + 1).cast("int"),
                (gend - gstart).cast("int"),
            ),
            " ",
        ).alias("_piece"),
    )
    ordered = F.array_sort(
        F.collect_list(F.struct("_off", "_id", "_piece"))
    )
    return pieces.groupBy("shard", "seq").agg(
        F.count("*").alias("n_docs"),
        F.sum("_flen").alias("n_tokens_filled"),
        F.md5(
            F.array_join(
                F.transform(ordered, lambda x: x["_piece"]), " "
            )
        ).alias("text_fp"),
    )
