"""north_rule evidence: the engine runs via ``spark-submit
--py-files`` with the package provided ONLY through the zip (no
sys.path injection) — no driver-only imports or path assumptions
that would break cluster submission."""

from __future__ import annotations

import json
import shutil
import subprocess
import sys

import pytest


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_smoke(repo_root):
    proc = subprocess.run(
        [sys.executable, str(repo_root / "tools" / "submit_smoke.py")],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["ok"] is True
    assert len(out["topk"]) == 5
    assert out["n_and"] > 0
