"""Structured-Streaming surfaces.

The reference has NO stream processing (SURVEY §2.9) — its closest
analog is incremental single-document ``Index.Add``
(``/root/reference/lib/neosearch/index/index.go:124-144``).  The
Spark-native successor of that write path is micro-batch ingest:

- ``stream_ingest``: readStream over a growing transcript directory →
  ``foreachBatch`` appends tf/doc_len DELTA tables next to the base
  index (cheap, no block rewrite per batch — LSM-style);
- ``compact_deltas``: folds accumulated deltas into the block index
  by rebuilding ONLY the (term, span) groups the deltas touch —
  the distributed analog of an LSM compaction;
- ``query-side merge`` is not needed after compaction (the index is
  again a single consistent block table).

Plus a standard watermarked windowed aggregation over the events
stream (``windowed_event_counts``) to cover the streaming-agg
surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analyzer import doc_len_col
from .build import IndexBuilder, _tf_stream


def transcript_schema() -> str:
    return (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, doc_id long"
    )


def stream_ingest(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    analyzed_fields: list[str] | None = None,
):
    """Start a streaming query appending tf/doc_len deltas for new
    transcript files.  Caller stops the query; ``compact_deltas``
    folds deltas into blocks.  Input rows must carry pre-assigned
    doc_ids (streaming docID assignment = monotonic per source
    partition; the batch path's dense assignment doesn't apply to
    unbounded input)."""
    analyzed_fields = analyzed_fields or ["text"]
    src = (
        spark.readStream.schema(transcript_schema())
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def sink(batch: DataFrame, epoch_id: int) -> None:
        tf = _tf_stream(batch, analyzed_fields, [])
        tf.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(
            os.path.join(index_dir, "tf_delta")
        )
        batch.select(
            "doc_id", doc_len_col(F.col(analyzed_fields[0])).alias("dl")
        ).withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(
            os.path.join(index_dir, "doc_len_delta")
        )

    return (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_deltas(spark: SparkSession, index_dir: str, span: int | None = None) -> int:
    """Fold delta tables into the block index.

    Only (term, span) groups present in the delta are rebuilt: the
    base blocks for touched groups are decoded, merged with delta
    postings, re-encoded; untouched blocks are carried over as-is
    (file-level identity — at Iceberg scale this is a partition
    overwrite of touched term-buckets only).  Returns #touched
    groups."""
    import json

    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    span = span or int(manifest["params"]["span"])

    delta_dir = os.path.join(index_dir, "tf_delta")
    if not os.path.exists(delta_dir):
        return 0
    tf_delta = spark.read.parquet(delta_dir).drop("epoch")
    dl_delta = spark.read.parquet(os.path.join(index_dir, "doc_len_delta")).drop("epoch")

    # refresh corpus stats first: materialize the merged doc_len to a
    # tmp dir IMMEDIATELY (lazy plans over a directory we later swap
    # would re-list deleted files), then derive stats from the tmp
    dl_base = spark.read.parquet(os.path.join(index_dir, "doc_len"))
    dl_all = dl_base.unionByName(dl_delta).dropDuplicates(["doc_id"])
    doc_len_tmp = os.path.join(index_dir, "doc_len") + "_tmp"
    dl_all.write.mode("overwrite").parquet(doc_len_tmp)
    dl_new = spark.read.parquet(doc_len_tmp)
    stats = dl_new.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.sum("dl").alias("total_tokens"),
        F.max("dl").alias("max_dl"),
    )
    stats_tmp = os.path.join(index_dir, "stats") + "_tmp"
    stats.write.mode("overwrite").parquet(stats_tmp)
    avgdl = float(spark.read.parquet(stats_tmp).collect()[0]["avgdl"])

    blocks_path = os.path.join(index_dir, "blocks")
    base = spark.read.parquet(blocks_path)

    delta_k = (
        tf_delta.withColumn("span_id", (F.col("doc_id") / span).cast("long"))
        .withColumnRenamed("term", "term")
    )
    touched = delta_k.select("field", "term", "span_id").distinct()

    # decode touched base blocks back to the tf stream (vectorized
    # batch-concatenated decode, shared with maintenance.delete_docs)
    from .maintenance import _explode_blocks_stream

    touched_base = base.join(touched, ["field", "term", "span_id"])
    base_tf = _explode_blocks_stream(touched_base)
    # append-only ingest assumed: base and delta doc sets are disjoint
    merged_tf = (
        base_tf.unionByName(delta_k.select("field", "term", "doc_id", "tf", "dl"))
        .groupBy("field", "term", "doc_id", "dl")
        .agg(F.sum("tf").alias("tf"))
        .withColumn("span_id", (F.col("doc_id") / span).cast("long"))
    )

    nparts = max(4, spark.sparkContext.defaultParallelism)
    arranged = (
        merged_tf.repartitionByRange(nparts, "field", "term", "span_id")
        .sortWithinPartitions("field", "term", "span_id", "doc_id")
        .withColumn("part_id", F.spark_partition_id())
    )

    from .build import BLOCK_SCHEMA, carry_encoder, term_bucket_expr

    boundaries = manifest["params"].get("bucket_boundaries", [])
    rebuilt = arranged.mapInPandas(
        carry_encoder(avgdl=avgdl, span=span), schema=BLOCK_SCHEMA
    ).withColumn("bucket", term_bucket_expr(F.col("term"), boundaries))
    untouched = base.join(touched, ["field", "term", "span_id"], "left_anti")
    new_blocks = untouched.unionByName(rebuilt)

    import shutil

    blocks_tmp = blocks_path + "_tmp"
    (
        new_blocks.repartition(max(len(boundaries) + 1, 1), "bucket")
        .sortWithinPartitions("field", "term", "span_id")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(blocks_tmp)
    )

    terms_tmp = os.path.join(index_dir, "terms") + "_tmp"
    terms = (
        spark.read.parquet(blocks_tmp)
        .groupBy("bucket", "field", "term")
        .agg(
            F.sum("n_docs").cast("long").alias("df"),
            F.max("max_tf_norm").alias("max_tf_norm"),
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
        )
        .sortWithinPartitions("field", "term")
    )
    terms.write.mode("overwrite").option(
        "parquet.block.size", 1024 * 1024
    ).partitionBy("bucket").parquet(terms_tmp)

    n_touched = touched.count()

    # all outputs materialized — swap under a manifest tombstone so a
    # crash mid-swap leaves an index that refuses to open rather than
    # serving a torn view (the Iceberg-scale equivalent is a single
    # snapshot commit)
    from .maintenance import swap_tables

    swap_tables(
        index_dir,
        [
            ("blocks", blocks_tmp),
            ("terms", terms_tmp),
            ("doc_len", doc_len_tmp),
            ("stats", stats_tmp),
        ],
        op="compact_deltas",
        compact_deltas={"touched_groups": int(n_touched)},
    )
    shutil.rmtree(delta_dir)
    shutil.rmtree(os.path.join(index_dir, "doc_len_delta"))
    return n_touched


def windowed_event_counts(
    events: DataFrame, window: str = "5 minutes", slide: str | None = None, watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation (streaming or
    batch DataFrame — same expression)."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
    )
