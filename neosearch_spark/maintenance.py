"""Index maintenance: row-level document deletion and crash-safe
multi-table swaps.

The reference supports key deletion at the store layer
(``/root/reference/lib/neosearch/store/goleveldb/writer.go:54-65``)
and engine layer (``/root/reference/lib/neosearch/engine/engine.go:
148-150``); this module supplies the distributed successor: remove a
set of doc_ids from a built index — the natural follow-through to
dedup ("now drop the losers from the index").

Scale design:
- Only blocks in SPANS containing deleted docs are touched (span =
  doc_id // span is knowable from the id alone — no index probe);
  blocks in untouched spans carry over by identity.  Deleting d docs
  rewrites O(d/span · terms-per-span) blocks, independent of corpus
  size.
- Deleted ids apply as an anti-join against the decoded tf stream —
  never a driver-side list.
- All rewritten tables (blocks/terms/docs/doc_len/stats) materialize
  to tmp dirs first, then swap under a manifest tombstone: the
  manifest marks ``swap_in_progress`` before the first rename and
  clears it after the last, so a crash mid-swap leaves an index that
  REFUSES to open instead of serving a torn view.  (At Iceberg scale
  the whole swap is one snapshot commit; the tombstone is the
  sandbox-parquet stand-in.)
- Stale block-max bounds stay provably conservative: per-posting
  scores are recomputed from tf/dl at query time, and untouched
  blocks keep their ``enc_avgdl`` so the query-side inflation
  ``max(1, avgdl_now/enc_avgdl)`` keeps every pruning bound an upper
  bound after avgdl shifts (see build.py).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _load_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "manifest.json")) as f:
        return json.load(f)


def _save_manifest(index_dir: str, m: dict) -> None:
    p = os.path.join(index_dir, "manifest.json")
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=2, default=str)
    os.replace(tmp, p)


def check_not_torn(manifest: dict, index_dir: str) -> None:
    """Refuse to use an index whose last multi-table swap did not
    complete (crash between directory renames)."""
    if manifest.get("swap_in_progress"):
        raise RuntimeError(
            f"index at {index_dir} has a torn table swap "
            f"({manifest['swap_in_progress']}); restore from the "
            "previous snapshot or rebuild"
        )


def swap_tables(index_dir: str, pairs: list[tuple[str, str]], op: str,
                crash_after: int | None = None, **manifest_extra) -> None:
    """Atomically-ish replace index tables: tombstone the manifest,
    rename every (tmp_dir → final) pair, clear the tombstone.

    ``crash_after`` is a test hook: raise after that many renames to
    simulate a crash mid-swap."""
    m = _load_manifest(index_dir)
    check_not_torn(m, index_dir)
    m["swap_in_progress"] = {"op": op, "tables": [name for name, _ in pairs]}
    _save_manifest(index_dir, m)
    for i, (name, tmp) in enumerate(pairs):
        if crash_after is not None and i >= crash_after:
            raise RuntimeError(f"injected crash after {i} swaps")
        final = os.path.join(index_dir, name)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
    del m["swap_in_progress"]
    for k, v in manifest_extra.items():
        m.setdefault("maintenance", []).append({k: v})
    _save_manifest(index_dir, m)


def _explode_blocks_stream(blocks: DataFrame) -> DataFrame:
    """Decode blocks back to the (field, term, doc_id, tf, dl)
    stream, fully vectorized: all block buffers in an Arrow batch are
    concatenated and varint-decoded ONCE (buffers self-delimit), then
    the per-block delta chains are rebased with one cumsum + repeat —
    the same pattern as query._decode, no per-block Python loop."""
    from .codec import _varint_decode

    def explode(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            n_docs = pdf["n_docs"].to_numpy(dtype=np.int64)
            deltas = _varint_decode(b"".join(pdf["docs_enc"].tolist()))
            cum = np.cumsum(deltas.astype(np.int64))
            starts = np.concatenate(([0], np.cumsum(n_docs)[:-1]))
            base = np.repeat(
                cum[starts] - deltas[starts].astype(np.int64), n_docs
            )
            yield pd.DataFrame(
                {
                    "field": np.repeat(pdf["field"].to_numpy(), n_docs),
                    "term": np.repeat(pdf["term"].to_numpy(), n_docs),
                    "doc_id": cum - base,
                    "tf": _varint_decode(
                        b"".join(pdf["tfs_enc"].tolist())
                    ).astype(np.int64),
                    "dl": _varint_decode(
                        b"".join(pdf["dls_enc"].tolist())
                    ).astype(np.int64),
                }
            )

    return blocks.select(
        "field", "term", "n_docs", "docs_enc", "tfs_enc", "dls_enc"
    ).mapInPandas(
        explode,
        schema="field string, term string, doc_id long, tf long, dl long",
    )


def delete_docs(
    spark: SparkSession,
    index_dir: str,
    ids: DataFrame,
    crash_after: int | None = None,
) -> dict:
    """Remove the given doc_ids (DataFrame with a ``doc_id`` column)
    from a built index: doc store, doc_len, stats, touched blocks,
    terms.  Returns counters {n_deleted, touched_spans, n_blocks_touched}.

    Idempotent: deleting already-absent ids rewrites the touched
    spans to identical content."""
    from .build import BLOCK_SCHEMA, carry_encoder, term_bucket_expr

    m = _load_manifest(index_dir)
    check_not_torn(m, index_dir)
    span = int(m["params"]["span"])
    boundaries = m["params"].get("bucket_boundaries", [])

    ids = ids.select(F.col("doc_id").cast("long")).distinct()
    n_deleted = ids.count()

    # --- docs + doc_len: anti-join rewrite (Iceberg: row-level delete)
    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    docs_tmp = os.path.join(index_dir, "docs") + "_tmp"
    docs.join(ids, "doc_id", "left_anti").write.mode("overwrite").parquet(docs_tmp)

    dl = spark.read.parquet(os.path.join(index_dir, "doc_len"))
    dl_tmp = os.path.join(index_dir, "doc_len") + "_tmp"
    dl.join(ids, "doc_id", "left_anti").write.mode("overwrite").parquet(dl_tmp)

    stats = spark.read.parquet(dl_tmp).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.sum("dl").alias("total_tokens"),
        F.max("dl").alias("max_dl"),
    )
    stats_tmp = os.path.join(index_dir, "stats") + "_tmp"
    stats.write.mode("overwrite").parquet(stats_tmp)
    avgdl = float(spark.read.parquet(stats_tmp).collect()[0]["avgdl"])

    # --- blocks: rewrite only spans containing deleted docs
    blocks = spark.read.parquet(os.path.join(index_dir, "blocks"))
    spans = ids.select(
        (F.col("doc_id") / span).cast("long").alias("span_id")
    ).distinct()
    touched = blocks.join(F.broadcast(spans), "span_id")
    untouched = blocks.join(F.broadcast(spans), "span_id", "left_anti")

    surviving_tf = (
        _explode_blocks_stream(touched)
        .join(ids, "doc_id", "left_anti")
        .withColumn("span_id", (F.col("doc_id") / span).cast("long"))
    )
    nparts = max(4, spark.sparkContext.defaultParallelism)
    arranged = (
        surviving_tf.repartitionByRange(nparts, "field", "term", "span_id")
        .sortWithinPartitions("field", "term", "span_id", "doc_id")
        .withColumn("part_id", F.spark_partition_id())
    )
    rebuilt = arranged.mapInPandas(
        carry_encoder(avgdl=avgdl, span=span), schema=BLOCK_SCHEMA
    ).withColumn("bucket", term_bucket_expr(F.col("term"), boundaries))
    blocks_tmp = os.path.join(index_dir, "blocks") + "_tmp"
    n_touched_blocks = touched.count()
    (
        untouched.unionByName(rebuilt)
        .repartition(max(len(boundaries) + 1, 1), "bucket")
        .sortWithinPartitions("field", "term", "span_id")
        .write.mode("overwrite")
        .option("parquet.block.size", 8 * 1024 * 1024)
        .partitionBy("bucket")
        .parquet(blocks_tmp)
    )

    # --- terms: re-aggregate from the new blocks
    terms_tmp = os.path.join(index_dir, "terms") + "_tmp"
    (
        spark.read.parquet(blocks_tmp)
        .groupBy("bucket", "field", "term")
        .agg(
            F.sum("n_docs").cast("long").alias("df"),
            F.max("max_tf_norm").alias("max_tf_norm"),
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
        )
        .sortWithinPartitions("field", "term")
        .write.mode("overwrite")
        .option("parquet.block.size", 1024 * 1024)
        .partitionBy("bucket")
        .parquet(terms_tmp)
    )

    counters = {
        "n_deleted": int(n_deleted),
        "touched_spans": int(spans.count()),
        "n_blocks_touched": int(n_touched_blocks),
    }
    swap_tables(
        index_dir,
        [
            ("blocks", blocks_tmp),
            ("terms", terms_tmp),
            ("docs", docs_tmp),
            ("doc_len", dl_tmp),
            ("stats", stats_tmp),
        ],
        op="delete_docs",
        crash_after=crash_after,
        delete_docs=counters,
    )
    return counters
