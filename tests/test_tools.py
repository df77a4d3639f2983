"""Pure-Python tests for the bench tooling (no Spark session)."""

import importlib.util
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_scale_bench():
    # load by path: tools/ is not a package, and importing the module
    # must not trigger main()
    spec = importlib.util.spec_from_file_location(
        "crawl_scale_bench",
        os.path.join(ROOT, "tools", "crawl_scale_bench.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("crawl_scale_bench", mod)
    spec.loader.exec_module(mod)
    return mod


def test_merge_ladder_replaces_named_rungs_keeps_rest():
    m = _load_scale_bench()
    prior = {
        "generated_at_commit": "oldc",
        "ladder": [
            {"rung": "mid", "wall_sec_n": 100.0},
            {"rung": "high", "wall_sec_n": 200.0},
            {"rung": "curated", "wall_sec_n": 300.0},
        ],
    }
    fresh = [{"rung": "curated", "wall_sec_n": 250.0,
              "generated_at_commit": "newc"}]
    out = m.merge_ladder(fresh, prior, ["mid", "high", "xhigh", "curated"])
    by = {e["rung"]: e for e in out}
    # canonical order, absent rung (xhigh) skipped
    assert [e["rung"] for e in out] == ["mid", "high", "curated"]
    # fresh entry wins and keeps its own provenance
    assert by["curated"]["wall_sec_n"] == 250.0
    assert by["curated"]["generated_at_commit"] == "newc"
    # prior entries kept, inheriting the prior top-level commit
    assert by["mid"]["wall_sec_n"] == 100.0
    assert by["mid"]["generated_at_commit"] == "oldc"


def test_merge_ladder_no_prior_artifact():
    m = _load_scale_bench()
    fresh = [{"rung": "curated", "generated_at_commit": "c"}]
    assert m.merge_ladder(fresh, None, ["mid", "curated"]) == fresh


def test_merge_ladder_malformed_prior_is_ignored():
    m = _load_scale_bench()
    fresh = [{"rung": "mid", "generated_at_commit": "c"}]
    out = m.merge_ladder(fresh, {"ladder": "not-a-list"}, ["mid"])
    assert out == fresh
