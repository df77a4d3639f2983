"""Determinism under parallelism (SURVEY.md §5.5): the full crawl
produces byte-identical ordering/seen/log/emitted digests at
different local parallelism levels. Subprocess-per-level because two
SparkContexts in one interpreter break the accumulator channel."""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "determinism_check.py"),
         str(cores), "5"],
        capture_output=True, text=True, check=True, cwd=ROOT, timeout=600)
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_crawl_is_parallelism_invariant():
    a = _run(2)
    b = _run(8)
    assert a["pages_ok"] > 0
    for key in ("ordering", "seen", "fetch_log", "emitted", "pages_ok",
                "rounds"):
        assert a[key] == b[key], f"{key} differs across parallelism"
