"""Deterministic, scalable docID assignment.

The reference keys documents by a caller-supplied uint64 docID
(``/root/reference/lib/neosearch/index/index.go:124-144``); our
corpus invariant (input_hint) requires a stable docID derived from
``(conv_id, turn_idx)`` ordering.

A naive ``row_number().over(Window.orderBy(...))`` funnels the whole
table through ONE task — a non-starter at 10^12 rows.  Instead we use
the classic two-pass partition-offset scheme, all DataFrame-side:

1. range-repartition + sort within partitions by the ordering key
   (one shuffle; the range partitioner samples boundaries so skewed
   conv sizes still spread);
2. ``monotonically_increasing_id`` gives a per-partition-dense local
   row number (low 33 bits are a per-partition counter);
3. a tiny per-partition (count, min_id) aggregate (one row per
   partition) is cumulated driver-side and broadcast-joined back to
   add global offsets.

Result: dense 0..N-1 docIDs in exact (conv_id, turn_idx) order, cost
= one range shuffle + one O(#partitions) aggregate.  Verified
against row_number on small data in tests/test_docids.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_doc_ids(
    df: DataFrame, order_cols: list[str] | None = None, num_partitions: int | None = None
) -> DataFrame:
    """Add a dense ``doc_id`` (long, 0-based) in ``order_cols`` order.

    The returned DataFrame carries the exact row count as a
    ``_nsq_n_rows`` attribute (the offsets pass counted every
    partition anyway) — ``IndexBuilder.build`` reads it to skip its
    own count() pre-pass.  It is a plain Python attribute on THIS
    DataFrame object only: any further transformation returns a new
    DataFrame without it, which is safe — every consumer falls back
    to counting when the attribute is absent — but strips the
    optimization, so apply filters/projections BEFORE this call."""
    if order_cols is None:
        order_cols = ["conv_id", "turn_idx"]
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = max(4, spark.sparkContext.defaultParallelism)

    ordered = df.repartitionByRange(num_partitions, *order_cols).sortWithinPartitions(
        *order_cols
    )
    with_mid = ordered.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_mid", F.monotonically_increasing_id()
    )
    # Cache: the offsets aggregate and the final output must observe the
    # SAME partition layout / local ids.
    with_mid = with_mid.persist()

    part_stats = (
        with_mid.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"), F.min("_mid").alias("_minmid"))
        .orderBy("_pid")
        .collect()  # one row per partition — tiny by construction
    )
    offsets = {}
    running = 0
    for r in part_stats:
        offsets[r["_pid"]] = (running, r["_minmid"])
        running += r["_cnt"]

    off_df = spark.createDataFrame(
        [(pid, off, minmid) for pid, (off, minmid) in offsets.items()],
        "_pid int, _off long, _minmid long",
    )
    out = (
        with_mid.join(F.broadcast(off_df), "_pid")
        .withColumn("doc_id", F.col("_off") + (F.col("_mid") - F.col("_minmid")))
        .drop("_pid", "_mid", "_off", "_minmid")
    )
    # the offsets pass already counted every partition — carry the
    # exact total so IndexBuilder.build can skip its own count()
    # pre-pass over the corpus (one fewer full input scan per build;
    # the attribute dies with any further transformation, and build
    # falls back to counting)
    out._nsq_n_rows = running
    return out


def assign_doc_ids_small(df: DataFrame, order_cols: list[str] | None = None) -> DataFrame:
    """Single-task window variant — ONLY for tiny test fixtures and
    as the correctness oracle for assign_doc_ids."""
    if order_cols is None:
        order_cols = ["conv_id", "turn_idx"]
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn("doc_id", F.row_number().over(w).cast("long") - 1)
