"""Bench-harness plumbing that has bitten before: cross-round control
comparison must never compare a round to itself (ADVICE r06)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)
)))


def test_controls_vs_prev_excludes_current_round(monkeypatch):
    """ADVICE r06: once the driver writes BENCH_r{N}.json, a bench
    re-run inside round N must compare against an EARLIER round, not
    its own freshly-recorded controls (ratios ≈ 1.0 would silently
    defeat drift adjudication)."""
    import bench

    # r06 exists on disk and carries controls; pretending we're IN
    # round 6 must skip it and fall back to r05
    monkeypatch.setenv("ATLAS_BENCH_CUR_ROUND", "6")
    out = bench._controls_vs_prev({"cpu_tasks_per_sec": 100.0})
    assert out is not None and out["prev"] == "BENCH_r05.json"

    # and without the cap-at-current guard engaged, the newest
    # PREVIOUS round is used (PROGRESS.jsonl says the current round)
    monkeypatch.delenv("ATLAS_BENCH_CUR_ROUND")
    here = os.path.dirname(os.path.abspath(bench.__file__))
    with open(os.path.join(here, "PROGRESS.jsonl")) as f:
        cur = [json.loads(x) for x in f if x.strip()][-1]["round"]
    out = bench._controls_vs_prev({"cpu_tasks_per_sec": 100.0})
    assert out is not None
    picked = int(out["prev"].split("_r")[1].split(".")[0])
    assert picked < cur
