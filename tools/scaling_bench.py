"""Two-cluster-size scaling evidence (north_rule: efficiency ≥ 0.8
from N to 4N executors; sandbox substitute per BASELINE.md §2 —
same job at local[8] and local[32], same input).

Runs the full index build + BM25 query workload in a fresh
subprocess per parallelism level (separate JVMs so the level is
honest), verifies both levels produce the IDENTICAL index content
signature, and writes BENCH/BASELINE.md.

Usage: python3 tools/scaling_bench.py [n_turns]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from neosearch_spark.session import get_spark
from neosearch_spark.build import IndexBuilder
from neosearch_spark.docids import assign_doc_ids
from neosearch_spark.query import SparkIndex
from neosearch_spark.synth import synth_transcripts
import pyspark.sql.functions as F

cores = int(sys.argv[1]); n_turns = int(sys.argv[2]); out = sys.argv[3]
spark = get_spark(f"scale{{cores}}", cores=cores, shuffle_partitions=cores)
spark.range(1000).selectExpr("sum(id)").collect()  # warm
# identical input table at both levels, materialized OUTSIDE the
# timed region (the metric is build throughput over an existing
# transcripts table, not generator speed)
corpus = f"/tmp/scale_corpus_{{n_turns}}"
if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
    synth_transcripts(spark, n_turns, seed=42).write.mode("overwrite").parquet(corpus)
# small untimed warm-up build (JIT/codegen per stage shape)
warm = f"/tmp/scale_warm_{{cores}}"
shutil.rmtree(warm, ignore_errors=True)
IndexBuilder(warm, exact_fields=["role", "tool"]).build(
    assign_doc_ids(synth_transcripts(spark, 20_000, seed=7))
)
idx = f"/tmp/scale_idx_{{cores}}"
shutil.rmtree(idx, ignore_errors=True)
t0 = time.time()
docs = assign_doc_ids(spark.read.parquet(corpus))
IndexBuilder(idx, exact_fields=["role", "tool"]).build(docs)
build_sec = time.time() - t0
si = SparkIndex(spark, idx)
qs = ["tok1 tok3 tok17", "tok2 tok9 tok100 tok5000", "tok1"]
t0 = time.time()
res = []
for q in qs:
    res.append([(r["doc_id"], round(r["score"], 9)) for r in si.bm25_topk(q, 10).collect()])
query_sec = time.time() - t0
# content signature: same index at any parallelism
sig = (
    spark.read.parquet(idx + "/blocks")
    .select(F.md5(F.concat_ws("|", "field", "term", "span_id", F.base64("docs_enc"), F.base64("tfs_enc"))).alias("h"))
    .agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")).alias("s"))
    .collect()[0]["s"]
)
json.dump({{"cores": cores, "build_sec": build_sec, "query_sec": query_sec,
           "turns_per_sec": n_turns / build_sec, "sig": str(sig),
           "results": res}}, open(out, "w"))
spark.stop()
"""


def run_level(cores: int, n_turns: int) -> dict:
    out = f"/tmp/scale_out_{cores}.json"
    script = WORKER.format(repo=REPO)
    subprocess.run(
        [sys.executable, "-c", script, str(cores), str(n_turns), out],
        check=True,
        cwd=REPO,
    )
    with open(out) as f:
        return json.load(f)


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    lo = run_level(8, n_turns)
    hi = run_level(32, n_turns)
    assert lo["sig"] == hi["sig"], "index content differs across parallelism levels!"
    assert lo["results"] == hi["results"], "query results differ across levels!"
    # normalized throughput ratio: (tps@32 / 4) / tps@8
    eff = (hi["turns_per_sec"] / 4.0) / lo["turns_per_sec"]
    q_speedup = lo["query_sec"] / hi["query_sec"]
    md = f"""# BENCH/BASELINE — measured numbers (round 1)

Generated {time.strftime('%Y-%m-%d %H:%M:%S')} by tools/scaling_bench.py.
Input: deterministic synthetic transcripts, {n_turns:,} turns (seed 42),
identical at both levels; index content signatures verified identical;
BM25 top-10 results verified identical (rank + scores to 9dp).

## Two-cluster-size scaling evidence (north_rule, sandbox substitute)

| level | cores | build sec | turns/sec | 3-query BM25 sec |
|---|---|---|---|---|
| N      | 8  | {lo['build_sec']:.1f} | {lo['turns_per_sec']:,.0f} | {lo['query_sec']:.2f} |
| 4N     | 32 | {hi['build_sec']:.1f} | {hi['turns_per_sec']:,.0f} | {hi['query_sec']:.2f} |

- **Scaling efficiency (build)** = (turns/sec@32 ÷ 4) / turns/sec@8 =
  **{eff:.3f}** (target ≥ 0.8)
- Query speedup 8→32 cores: {q_speedup:.2f}×
- Determinism across levels: index signature match = True,
  query rank+score match = True

## Reference comparison

The reference publishes no numbers (BASELINE.md §1). Its ingest is a
single-threaded read-modify-write MergeSet per posting (store/
utils.go:39-93) with LevelDB WriteBatch flushes; our build is a
sort-merge aggregation at {hi['turns_per_sec']:,.0f} turns/sec on 32
local cores.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"efficiency": round(eff, 3), "lo": lo["turns_per_sec"], "hi": hi["turns_per_sec"]}))


if __name__ == "__main__":
    main()
