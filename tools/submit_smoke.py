"""spark-submit --py-files packaging smoke (north_rule: "run via
spark-submit --py-files ... on a multi-executor cluster").

Zips the ``neosearch_spark`` package, launches a driver script via
``spark-submit --py-files neosearch_spark.zip`` on local[4] (the
sandbox's stand-in for a cluster master), builds a small index from a
synthesized corpus, runs a BM25 query and a boolean query, and
asserts results arrive.  Proves the engine has no import-path or
driver-only dependency that would break cluster submission.

Usage: python3 tools/submit_smoke.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = r"""
import json, shutil, sys
# NOTE: neosearch_spark comes ONLY from --py-files (no sys.path hack)
from pyspark.sql import SparkSession
from neosearch_spark.build import IndexBuilder
from neosearch_spark.docids import assign_doc_ids
from neosearch_spark.query import SparkIndex
from neosearch_spark.synth import synth_transcripts

spark = (
    SparkSession.builder.appName("submit_smoke")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
docs = assign_doc_ids(synth_transcripts(spark, 2000, seed=3))
idx = "/tmp/submit_smoke_idx"
shutil.rmtree(idx, ignore_errors=True)
IndexBuilder(idx, exact_fields=["role"]).build(docs)
si = SparkIndex(spark, idx)
top = [(r["doc_id"], round(r["score"], 6)) for r in si.bm25_topk("tok1 tok3", 5).collect()]
n_and = si.and_docs(["tok1", "tok2"]).count()
print("SMOKE_RESULT " + json.dumps({"topk": top, "n_and": n_and}))
spark.stop()
"""


def main() -> int:
    pkg_zip = "/tmp/neosearch_spark.zip"
    if os.path.exists(pkg_zip):
        os.remove(pkg_zip)
    with zipfile.ZipFile(pkg_zip, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "neosearch_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))

    driver_path = "/tmp/submit_smoke_driver.py"
    with open(driver_path, "w") as f:
        f.write(DRIVER)

    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", pkg_zip,
            driver_path,
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    result = None
    for line in proc.stdout.splitlines():
        if line.startswith("SMOKE_RESULT "):
            result = json.loads(line[len("SMOKE_RESULT "):])
    if proc.returncode != 0 or result is None:
        sys.stderr.write(proc.stderr[-2000:])
        print(json.dumps({"ok": False}))
        return 1
    ok = len(result["topk"]) == 5 and result["n_and"] > 0
    print(json.dumps({"ok": ok, **result}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
