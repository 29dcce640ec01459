"""Corpus curation operators for training-data pipelines:
deterministic hash sampling and token-budget shard packing.

Both are single-shuffle, partition-layout-independent, and
DuckDB-expressible so each carries an oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analyzer import doc_len_col, tokens_col

# 60-bit hash fraction denominator (15 hex digits — same keyspace as
# the dedup hash trick, fits a signed int64 exactly)
_HASH_DEN = float(1 << 60)


def _hash_frac(key: F.Column, seed: int) -> F.Column:
    """Deterministic uniform [0,1) fraction from (key, seed) — stable
    under any repartitioning, unlike ``F.rand`` whose stream depends
    on partition layout (a correctness bug at scale: recomputing a
    stage must not change which docs were sampled)."""
    h = F.conv(F.substring(F.md5(F.concat_ws(":", key, F.lit(seed))), 1, 15), 16, 10)
    return h.cast("double") / F.lit(_HASH_DEN)


def sample_hash(
    docs: DataFrame,
    rate: float | None = None,
    seed: int = 0,
    strata_col: str | None = None,
    strata_rates: dict[str, float] | None = None,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic sample: keep a row iff hash(key, seed) < rate.

    With ``strata_col``/``strata_rates``, the rate varies per stratum
    (e.g. per-language quality-weighted sampling — upsample rare
    languages, downsample boilerplate-heavy sources); strata missing
    from the dict fall back to ``rate`` (or 0.0 if no default).
    Pure codegen'd expressions — no shuffle at all; composes with any
    downstream op."""
    if rate is None and not strata_rates:
        raise ValueError("sample_hash needs rate= or strata_rates=")
    if strata_rates and strata_col is None:
        raise ValueError("strata_rates requires strata_col")
    frac = _hash_frac(F.col(key_col), seed)
    if strata_rates:
        expr = F.lit(float(rate if rate is not None else 0.0))
        for value, r in sorted(strata_rates.items()):
            expr = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(expr)
        keep = frac < expr
    else:
        keep = frac < F.lit(float(rate))
    return docs.where(keep)


def pack_shards(
    docs: DataFrame,
    budget: int,
    field: str = "text",
    order_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each doc to a training shard so consecutive docs (in
    ``order_col`` order) fill ~``budget`` tokens per shard:
    ``shard_id = floor(exclusive_prefix_token_sum / budget)`` — the
    greedy sequence-packing layout step of a training-data pipeline
    (a doc straddling a boundary belongs to the shard where it
    starts, so shards can exceed budget by at most one doc).

    The global prefix sum does NOT use a global window (which would
    funnel 10^12 rows through one task): same two-pass partition-
    offset scheme as docID assignment (``docids.py``) — a range
    shuffle, a per-partition running sum, and an O(#partitions)
    driver-side prefix folded back in via broadcast join.

    Returns (order_col, n_tokens, shard_id).
    """
    spark = docs.sparkSession
    if num_partitions is None:
        num_partitions = max(4, spark.sparkContext.defaultParallelism)

    # NULL text counts as 0 tokens (a NaN would poison the cumsum);
    # the order column's type is taken from the input so non-long
    # keys (string conv_id, timestamps) work
    order_type = docs.schema[order_col].dataType.simpleString()
    sized = docs.select(
        F.col(order_col),
        F.coalesce(doc_len_col(F.col(field)), F.lit(0)).alias("n_tokens"),
    )
    ordered = (
        sized.repartitionByRange(num_partitions, order_col)
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )

    # per-partition running sum as an Arrow-batched cumsum — NOT a
    # window PARTITION BY _pid, which would insert a second hash
    # exchange (Catalyst can't prove _pid matches the range layout);
    # mapInPandas is narrow, so the range shuffle stays the only one
    def _local_cumsum(it):
        run = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            c = pdf["n_tokens"].cumsum() + run
            run = int(c.iloc[-1])
            yield pdf.assign(_lcum=c)

    # persisted so the offsets aggregate and the final output observe
    # the same layout/cumsums; Spark's ContextCleaner reclaims the
    # cache once the returned DataFrame is no longer referenced
    local = ordered.mapInPandas(
        _local_cumsum,
        schema=f"{order_col} {order_type}, n_tokens long, _pid int, _lcum long",
    ).persist()

    part_totals = (
        local.groupBy("_pid")
        .agg(F.max("_lcum").alias("_tot"))
        .orderBy("_pid")
        .collect()  # one row per partition — tiny by construction
    )
    offsets, running = [], 0
    for r in part_totals:
        offsets.append((r["_pid"], running))
        running += int(r["_tot"])
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")

    out = (
        local.join(F.broadcast(off_df), "_pid")
        # integer `div`, not `/`: double division loses exactness once
        # the prefix sum passes 2^53 — reachable at the 10^12-doc
        # design scale (same idiom as the build's span keys)
        .withColumn(
            "shard_id",
            F.expr(f"(_off + _lcum - n_tokens) div {int(budget)}"),
        )
        .select(order_col, "n_tokens", "shard_id")
    )
    return out


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    field: str = "text",
    n: int = 8,
    round_to: int = 6,
) -> DataFrame:
    """Benchmark decontamination: per-document overlap of token
    n-grams with a benchmark/eval set — the GPT-2/GPT-3 style
    train-test overlap check (Radford et al. 2019 §4; Brown et al.
    2020 appendix C use 8-grams, the default here).  A training doc
    sharing even one n-gram with an eval document is flagged so
    pipelines can drop or audit it before training.

    Output (one row per input doc, including short ones):
    ``doc_id``, ``n_grams`` (DISTINCT n-grams in the doc; 0 when the
    doc has fewer than n tokens), ``n_hit`` (distinct n-grams also
    present anywhere in the benchmark), ``contamination_frac``
    (n_hit / n_grams), ``contaminated`` (n_hit > 0).

    Shape: n-gram arrays are built ROW-LOCALLY on both sides
    (sequence/transform over the non-empty token sequence), hashed
    to the portable 60-bit md5 family (8 B per gram instead of the
    gram string), exploded, and per-doc deduplicated by a
    groupBy(doc_id, gram) whose map-side partial aggregation
    collapses each doc's duplicates before the shuffle.  The
    benchmark side reduces to a DISTINCT hash set and is explicitly
    ``F.broadcast`` — eval suites are small next to a training
    corpus (10^6 distinct 8-grams ≈ 8 MB); for a benchmark too big
    to broadcast, drop the hint and the same plan shuffle-joins.
    Left join + flag aggregation keeps never-contaminated docs in
    the output.  ``explode_outer`` keeps sub-n-token docs.  No
    Python in the plan."""

    def grams(df: DataFrame) -> DataFrame:
        toks = F.filter(tokens_col(F.col(field)), lambda t: t != "")
        base = df.select("doc_id", toks.alias("_toks"))
        nt = F.size(F.col("_toks"))
        # join n consecutive tokens, hash to 60 bits (same md5
        # family as ops/dedup so engines agree byte-for-byte);
        # sequence(1, 0) would step downward — guard short docs
        arr = F.when(
            nt >= n,
            F.expr(
                f"transform(sequence(1, size(_toks) - {n} + 1),"
                f" i -> cast(conv(substring(md5(concat_ws(' ',"
                f" slice(_toks, i, {n}))), 1, 15), 16, 10) as bigint))"
            ),
        ).otherwise(F.array().cast("array<bigint>"))
        return base.select("doc_id", F.explode_outer(arr).alias("gram"))

    doc_grams = (
        grams(docs)
        .groupBy("doc_id", "gram")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    bench_set = (
        grams(benchmark)
        .where(F.col("gram").isNotNull())
        .select("gram")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = doc_grams.join(F.broadcast(bench_set), "gram", "left")
    agg = joined.groupBy("doc_id").agg(
        F.count(F.col("gram")).cast("long").alias("n_grams"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_hit"),
    )
    return agg.select(
        "doc_id",
        "n_grams",
        "n_hit",
        F.round(
            F.when(
                F.col("n_grams") > 0,
                F.col("n_hit").cast("double") / F.col("n_grams"),
            ).otherwise(0.0),
            round_to,
        ).alias("contamination_frac"),
        (F.col("n_hit") > 0).alias("contaminated"),
    )


# PII patterns chosen for engine-portable semantics: pure character
# classes + \b, no lookaround/backreferences, so Java regex (Spark)
# and RE2 (DuckDB oracle) match identical spans
PII_PATTERNS = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
}


def scrub_pii(docs: DataFrame, field: str = "text") -> DataFrame:
    """PII redaction + audit counts — the standard pre-training
    scrub (emails, IPv4 addresses, US-style phone numbers replaced
    with ``<EMAIL>``/``<IPV4>``/``<PHONE>`` placeholders), as done
    in public corpus pipelines (e.g. the BigScience ROOTS and
    RefinedWeb preprocessing describe exactly this regex-redaction
    pass).

    Output: ``doc_id``, redacted ``text``, per-type match counts
    (``n_email``, ``n_ipv4``, ``n_phone``) and their ``n_pii`` sum.
    Counts are measured on the ORIGINAL text per type, so a span
    matching two patterns is counted by both (audit semantics);
    replacement applies in the fixed order email → ipv4 → phone.

    Scale: one zero-shuffle projection of JVM regex expressions —
    at 10^12 docs this is a pure map stage
    that pipelines into whatever sink follows.  The pattern table is
    deliberately \\b/character-class-only so the DuckDB oracle (RE2)
    and Spark (Java regex) agree byte-for-byte."""
    txt = F.col(field)
    counts = {
        name: F.size(F.regexp_extract_all(txt, F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    }
    red = txt
    for name, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    # two-stage projection: n_pii reads the already-computed count
    # columns instead of re-running the three extract-alls (sibling
    # aliases aren't referenceable within one select)
    staged = docs.select(
        "doc_id",
        red.alias(field),
        counts["email"],
        counts["ipv4"],
        counts["phone"],
    )
    return staged.select(
        "*",
        (F.col("n_email") + F.col("n_ipv4") + F.col("n_phone"))
        .cast("long")
        .alias("n_pii"),
    )
