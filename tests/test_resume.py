"""Checkpoint-resume: kill after each stage → resume → identical
index + intact counters (north_rule; SURVEY §5d)."""

from __future__ import annotations

import json
import os

import pytest

from neosearch_spark.build import IndexBuilder
from neosearch_spark.docids import assign_doc_ids
from neosearch_spark.synth import synth_transcripts


def index_signature(spark, d):
    """Canonical content signature of an index directory."""
    import pyspark.sql.functions as F

    blocks = spark.read.parquet(os.path.join(d, "blocks"))
    sig = (
        blocks.select(
            F.md5(
                F.concat_ws(
                    "|", "field", "term", "span_id", F.base64("docs_enc"), F.base64("tfs_enc")
                )
            ).alias("h")
        )
        .agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")).alias("s"))
        .collect()[0]["s"]
    )
    terms = spark.read.parquet(os.path.join(d, "terms")).count()
    return (str(sig), terms)


@pytest.fixture(scope="module")
def docs(spark):
    return assign_doc_ids(synth_transcripts(spark, 300, seed=23)).cache()


@pytest.mark.parametrize("crash_after", ["docs", "stats", "blocks"])
def test_crash_resume_identical(spark, docs, tmp_path, crash_after):
    ref_dir = str(tmp_path / "ref")
    IndexBuilder(ref_dir, span=64).build(docs)
    want = index_signature(spark, ref_dir)

    crash_dir = str(tmp_path / f"crash_{crash_after}")
    b = IndexBuilder(crash_dir, span=64)
    b.build(docs, stop_after=crash_after)
    m = json.load(open(os.path.join(crash_dir, "manifest.json")))
    done_before = set(m["stages"])
    assert "counters" not in done_before
    stamp_before = {s: m["stages"][s]["finished_at"] for s in done_before}

    IndexBuilder(crash_dir, span=64).build(docs, resume=True)
    assert index_signature(spark, crash_dir) == want

    m2 = json.load(open(os.path.join(crash_dir, "manifest.json")))
    assert set(m2["stages"]) == set(IndexBuilder.STAGES)
    # completed stages were NOT re-run (their stamps unchanged)
    for s in done_before:
        assert m2["stages"][s]["finished_at"] == stamp_before[s], s


def test_counters_lineage(spark, docs, tmp_path):
    d = str(tmp_path / "cnt")
    IndexBuilder(d, span=64).build(docs)
    m = json.load(open(os.path.join(d, "manifest.json")))
    counters = spark.read.parquet(os.path.join(d, "counters")).collect()
    assert sum(r["n_postings"] for r in counters) == m["stages"]["counters"]["total_postings"]
    assert sum(r["bytes"] for r in counters) == m["stages"]["counters"]["total_bytes"]
    assert all(r["part_id"] >= 0 for r in counters)


def test_incomplete_index_refuses_to_open(spark, docs, tmp_path):
    """Batch-visibility analog (reference neosearch_test.go:733-826):
    a mid-build index must refuse to serve, not expose a partial
    view."""
    from neosearch_spark.query import SparkIndex

    d = str(tmp_path / "incomplete")
    IndexBuilder(d, span=64).build(docs, stop_after="blocks")
    with pytest.raises(RuntimeError, match="incomplete"):
        SparkIndex(spark, d)
