"""Deterministic docID assignment: distributed two-pass ==
row_number oracle; stable under parallelism changes (scaling
prerequisite)."""

from __future__ import annotations

from neosearch_spark.docids import assign_doc_ids, assign_doc_ids_small
from neosearch_spark.synth import synth_transcripts


def _ids(df):
    return [
        (r["conv_id"], r["turn_idx"], r["doc_id"])
        for r in df.select("conv_id", "turn_idx", "doc_id").orderBy("doc_id").collect()
    ]


def test_matches_window_oracle(spark):
    tr = synth_transcripts(spark, 500, seed=3)
    assert _ids(assign_doc_ids(tr)) == _ids(assign_doc_ids_small(tr))


def test_dense_and_ordered(spark):
    tr = synth_transcripts(spark, 300, seed=5)
    got = _ids(assign_doc_ids(tr))
    assert [g[2] for g in got] == list(range(300))
    keys = [(g[0], g[1]) for g in got]
    assert keys == sorted(keys)


def test_stable_across_partitioning(spark):
    tr = synth_transcripts(spark, 400, seed=7)
    a = _ids(assign_doc_ids(tr, num_partitions=2))
    b = _ids(assign_doc_ids(tr, num_partitions=16))
    assert a == b
