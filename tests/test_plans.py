"""Physical-plan assertions: the properties that make this engine
scale must be visible in `explain` output (SURVEY §4) — filters
reach the parquet scan, small sides broadcast, no Python in the
built-in-only paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neosearch_spark import fts
from neosearch_spark.build import IndexBuilder
from neosearch_spark.query import SparkIndex
from neosearch_spark.synth import synth_transcripts
from neosearch_spark.docids import assign_doc_ids


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("plan_idx"))
    docs = assign_doc_ids(synth_transcripts(spark, 300, seed=13))
    IndexBuilder(d, span=64).build(docs)
    return SparkIndex(spark, d)


def test_term_filter_pushed_to_blocks_scan(idx):
    plan = plan_of(idx.blocks.where(F.col("term") == "tok1"))
    assert "PushedFilters" in plan
    assert "EqualTo(term,tok1)" in plan


def test_prefix_filter_pushed(idx):
    plan = plan_of(idx.blocks.where(F.col("term").startswith("tok")))
    assert "StringStartsWith(term,tok)" in plan


def test_get_docs_broadcasts_id_side(spark, idx):
    ids = spark.createDataFrame([(1,), (2,)], "doc_id long")
    plan = plan_of(idx.get_docs(ids))
    assert "BroadcastHashJoin" in plan


def test_direct_bm25_broadcasts_stats_and_df(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok1") for i in range(50)], "doc_id long, text string"
    )
    plan = plan_of(fts.bm25_scores(docs, ["tok1", "tok2"]))
    # stats (n_docs/avgdl/df) come back as a broadcast 1-row crossJoin
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # r5 zero-shuffle scoring: tf is a row-local array expression, so
    # the plan has NO shuffle join and NO hash-partitioned exchange —
    # the only exchanges are the broadcast and the 1-row stats agg's
    # single-partition exchange
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_boolean_term_ops_are_single_scan(spark):
    """r5: the direct boolean ops are row-local array predicates —
    one filter scan, no explode/distinct/groupBy exchange, no join;
    the only exchange is the final doc_id sort's range partitioning."""
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok1") for i in range(50)], "doc_id long, text string"
    )
    for df in [
        fts.matching_docs(docs, "tok1"),
        fts.and_docs(docs, ["tok1", "tok2"]),
        fts.or_docs(docs, ["tok1", "tok2"]),
        fts.not_docs(docs, ["tok1"], ["tok2"]),
        fts.xor_docs(docs, ["tok1"], ["tok2"]),
        fts.prefix_docs(docs, "tok"),
    ]:
        plan = plan_of(df)
        assert "Exchange hashpartitioning" not in plan
        assert "Join" not in plan  # no SortMerge/Hash/NestedLoop join of any kind
        assert "HashAggregate" not in plan  # no distinct


def test_builtin_paths_have_no_python_eval(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok1") for i in range(50)], "doc_id long, text string"
    )
    for df in [
        fts.matching_docs(docs, "tok1"),
        fts.bm25_topk(docs, ["tok1"], 5),
        fts.prefix_docs(docs, "tok"),
    ]:
        plan = plan_of(df)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    # whole-stage codegen active on the scoring plan (AQE only shows codegen
    # spans in the *final* plan, so execute before inspecting)
    scored = fts.bm25_scores(docs, ["tok1"])
    scored.collect()
    # "*(n) Op" is the simple-string marker for a whole-stage-codegen span
    assert "*(" in plan_of(scored)


def test_doc_scan_prunes_columns(spark, idx):
    plan = plan_of(idx.docs.select("doc_id", "conv_id"))
    # pruned scan reads exactly the two projected columns (order is scan-order)
    assert (
        "ReadSchema: struct<doc_id:bigint,conv_id:string>" in plan
        or "ReadSchema: struct<conv_id:string,doc_id:bigint>" in plan
    )


def test_docid_range_pushed_to_docs_scan(idx):
    # numeric range predicate reaches the doc-store scan (big-endian
    # key-order analog, engine_test.go:71-174); the docs stage is
    # written doc_id-sorted so row-group min/max stats prune it
    plan = plan_of(idx.range_docs(10, 20))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(doc_id,10)" in plan
    assert "LessThanOrEqual(doc_id,20)" in plan


def test_range_term_prunes_spans_before_decode(idx):
    # term + span-interval predicates both reach the blocks scan —
    # the posting-side range pruning (only blocks overlapping the
    # doc range are decoded).  The simple plan string truncates long
    # PushedFilters lists; use the formatted explain.
    df = idx.term_docs_in_range("tok1", 10, 120)
    plan = df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "EqualTo(term,tok1)" in plan
    assert "GreaterThanOrEqual(span_id,0)" in plan
    assert "LessThanOrEqual(span_id,1)" in plan


def test_explain_query_dry_run_no_jobs(idx):
    # the _analyze analog returns a plan containing the pushed term
    # predicate without running anything
    out = idx.explain_query("tok1 tok2")
    assert out["query_terms"] == ["tok1", "tok2"]
    assert "PushedFilters" in out["block_scan_plan"]
    assert "tok1" in out["block_scan_plan"]


def test_bucket_partition_pruning(idx):
    # bucketed block layout: a term lookup restricts the scan to its
    # bucket DIRECTORY (partition pruning), visible as a bucket
    # predicate in the scan's partition filters
    assert idx.bucket_boundaries, "index should carry bucket boundaries"
    df = idx.term_docs("tok1")
    plan = df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "bucket" in plan

    # driver-side bucket must match the build's codegen'd tree
    from neosearch_spark.build import term_bucket_expr
    from pyspark.sql import functions as F

    spark = df.sparkSession
    some_terms = [r["term"] for r in idx.terms.select("term").limit(200).collect()]
    got = (
        spark.createDataFrame([(t,) for t in some_terms], "term string")
        .select("term", term_bucket_expr(F.col("term"), idx.bucket_boundaries))
        .collect()
    )
    for r in got:
        assert r["bucket"] == idx._bucket_of(r["term"]), r["term"]


def test_float_bool_predicates_pushed(spark, tmp_path):
    """Typed float and bool predicates reach the parquet scan — the
    delegation that replaces the reference's ``<field>_float.idx`` /
    ``<field>_bool.idx`` typed inverted indexes (``index.go:419-440``:
    numeric/bool keys exist only to make typed lookups cheap on the
    LSM; Catalyst predicate pushdown + row-group stats provide the
    same property natively)."""
    p = str(tmp_path / "typed_tbl")
    spark.range(100).select(
        F.col("id"),
        (F.col("id") * 0.5).alias("score"),
        (F.col("id") % 2 == 0).alias("flag"),
    ).write.parquet(p)
    df = spark.read.parquet(p).where((F.col("score") >= 10.0) & F.col("flag"))
    plan = plan_of(df)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(score,10.0)" in plan
    assert "EqualTo(flag,true)" in plan
    assert sorted(r["id"] for r in df.collect()) == [
        i for i in range(100) if i * 0.5 >= 10.0 and i % 2 == 0
    ]


def test_pack_shards_single_range_shuffle(spark):
    """Regression guard: the local cumsum must stay a narrow
    mapInPandas over the range layout — a window PARTITION BY pid
    would insert a second (hash) exchange behind the range one."""
    from neosearch_spark.ops import curate

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(100)], "doc_id long, text string"
    )
    plan = (
        curate.pack_shards(docs, budget=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(_pid" not in plan
    assert "rangepartitioning(doc_id" in plan
