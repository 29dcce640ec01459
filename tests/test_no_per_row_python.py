"""input_hint guard: no per-row Python UDFs anywhere in the engine
(SURVEY §7 de-risk #6).  Vectorized pandas_udf / mapInPandas /
applyInPandas are the only allowed Python surfaces."""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "neosearch_spark"


def test_no_row_at_a_time_udf():
    bad = []
    for p in PKG.rglob("*.py"):
        src = p.read_text()
        # F.udf( / @udf( — the row-at-a-time API
        if re.search(r"(?<!pandas_)\budf\s*\(", src):
            bad.append(str(p))
        # .rdd.getNumPartitions() is plan metadata (no per-row path);
        # any other .rdd usage is banned
        rdd_uses = re.findall(r"\.rdd\b(?!\.getNumPartitions\(\))", src)
        if rdd_uses or "flatMap(" in src or "mapPartitions(" in src:
            bad.append(str(p) + " (rdd api)")
        if re.search(r"\bfor\s+\w+\s+in\s+\w+\.collect\(\)", src):
            # driver-side loops over collect() of non-tiny data are
            # reviewed individually; none should exist in operators
            # docids: partition-stats collect is O(#partitions);
            # cli: JSON-formats an already-limited result set
            if p.name not in ("docids.py", "cli.py"):
                bad.append(str(p) + " (collect loop)")
    assert not bad, bad
