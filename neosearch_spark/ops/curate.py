"""Corpus curation operators for training-data pipelines:
deterministic hash sampling and token-budget shard packing.

Both are single-shuffle, partition-layout-independent, and
DuckDB-expressible so each carries an oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analyzer import doc_len_col

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
