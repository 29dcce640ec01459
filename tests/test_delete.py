"""Row-level document deletion (the reference's Writer.Delete /
engine delete analog, ``store/goleveldb/writer.go:54-65``,
``engine/engine.go:148-150``) + crash-safe table swaps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neosearch_spark.build import IndexBuilder
from neosearch_spark.docids import assign_doc_ids
from neosearch_spark.maintenance import delete_docs
from neosearch_spark.oracle import OracleIndex
from neosearch_spark.query import SparkIndex
from neosearch_spark.synth import synth_transcripts

N_TURNS = 500


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    docs = assign_doc_ids(synth_transcripts(spark, N_TURNS, seed=21))
    d = str(tmp_path_factory.mktemp("del_idx"))
    IndexBuilder(d, span=64).build(docs)
    rows = docs.select("doc_id", "text").collect()
    texts = {r["doc_id"]: r["text"] for r in rows}
    return d, texts


def _sig(spark, d):
    return (
        spark.read.parquet(d + "/blocks")
        .select(
            F.md5(
                F.concat_ws(
                    "|", "field", "term", "span_id",
                    F.base64("docs_enc"), F.base64("tfs_enc"),
                    F.base64("dls_enc"),
                )
            ).alias("h")
        )
        .agg(
            F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")).alias("s")
        )
        .collect()[0]["s"]
    )


def test_delete_matches_filtered_oracle(spark, built):
    d, texts = built
    deleted = {3, 7, 11, 120, 121, 122, 300}
    counters = delete_docs(
        spark, d, spark.createDataFrame([(i,) for i in deleted], "doc_id long")
    )
    assert counters["n_deleted"] == len(deleted)
    assert counters["touched_spans"] <= len(deleted)
    si = SparkIndex(spark, d)
    oi = OracleIndex({k: v for k, v in texts.items() if k not in deleted})

    # stats reflect the filtered corpus
    assert si.n_docs == oi.n_docs
    assert abs(si.avgdl - oi.avgdl) < 1e-9

    # every query path agrees with an oracle built on the filtered
    # corpus, and never returns a deleted doc
    for t in ["tok1", "tok2", "tok17"]:
        got = [r["doc_id"] for r in si.term_docs(t).collect()]
        assert got == oi.term(t), t
        assert not (set(got) & deleted)
    got_p = [r["doc_id"] for r in si.prefix_docs("tok1").collect()]
    assert got_p == oi.prefix("tok1")
    want = oi.bm25_topk("tok1 tok3", 10)
    got = [
        (r["doc_id"], r["score"])
        for r in si.bm25_topk("tok1 tok3", 10).collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-9
    assert not ({g[0] for g in got} & deleted)


def test_delete_only_touches_deleted_spans(spark, built):
    d, _ = built
    # spans 64-wide; doc 3,7,11 -> span 0; 120-122 -> span 1; 300 -> span 4
    blocks = spark.read.parquet(d + "/blocks")
    touched_spans = {0, 1, 4}
    # untouched spans must still contain postings (carried by identity)
    remaining = {
        r["span_id"]
        for r in blocks.select("span_id").distinct().collect()
    }
    assert remaining - touched_spans, "untouched spans must survive"


def test_delete_idempotent(spark, built):
    d, _ = built
    before = _sig(spark, d)
    delete_docs(
        spark, d, spark.createDataFrame([(3,), (300,)], "doc_id long")
    )
    assert _sig(spark, d) == before


def test_crash_mid_swap_refuses_to_open(spark, tmp_path):
    docs = assign_doc_ids(synth_transcripts(spark, 120, seed=5))
    d = str(tmp_path / "crash_idx")
    IndexBuilder(d, span=32).build(docs)
    with pytest.raises(RuntimeError, match="injected crash"):
        delete_docs(
            spark, d,
            spark.createDataFrame([(1,), (2,)], "doc_id long"),
            crash_after=1,
        )
    with pytest.raises(RuntimeError, match="torn table swap"):
        SparkIndex(spark, d)
    with pytest.raises(RuntimeError, match="torn table swap"):
        delete_docs(spark, d, spark.createDataFrame([(3,)], "doc_id long"))
