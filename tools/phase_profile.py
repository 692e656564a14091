"""Per-phase epoch accounting for the CDC replay at one parallelism
width — the itemized floor behind the scaling number (VERDICT r03 #1:
either recover the per-epoch delta to the bare-scan floor, or account
for it phase by phase).

Phases (from LakehouseSink.merge's phase_ms instrumentation):
  win_elect    narrow election agg + Arrow winners collect (1 job)
  stats_driver winner-relation pandas stats on the driver (serialized)
  write        fetch join + guard + bucketed parquet write (1 job,
               includes the full-width batch rescan — the scan floor)
  commit       manifest publish (fsync + link, serialized IO)
  gap          duration_ms − the above: scheduling, plan compile,
               schema alignment, python driver glue

Also measures the machine's own floors at the same width, same files:
  scan_narrow  pyarrow read of (repo,path,seq,op) only — election floor
  scan_full    pyarrow full-column read — fetch/write scan floor

Usage: python tools/phase_profile.py WIDTH [EVENTS]
Prints one JSON line; run per width, compare columns.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scan_narrow(path: str) -> int:
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["repo", "path", "seq", "op"])
    return t.num_rows


def _scan_full(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_table(path).num_rows


def _floor(width: int, files: list[str], fn) -> float:
    best = None
    for _ in range(3):
        t0 = time.monotonic()
        with mp.Pool(width) as p:
            p.map(fn, files)
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def profile(width: int, events: int, files_per_epoch: int = 32) -> dict:
    env = dict(os.environ)
    env.setdefault("ATLAS_SPARK_DRIVER_MEM", "32g")
    env["ATLAS_DEBUG_EPOCHS"] = "1"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--replay-only", "--cpus", str(width), "--events", str(events),
         "--files-per-epoch", str(files_per_epoch)],
        capture_output=True, text=True, check=True, cwd=REPO, env=env,
    )
    epochs = [
        json.loads(l[len("EPOCH "):])
        for l in out.stdout.splitlines() if l.startswith("EPOCH ")
    ]
    bench = json.loads(
        [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    )
    # keep only the best timed run's epochs: epochs print for every
    # warmup + timed run; take the consecutive window with the lowest
    # total duration (one window per replay = epochs applied per run)
    per_run = bench["epochs"]
    windows = [
        epochs[i:i + per_run] for i in range(0, len(epochs), per_run)
        if len(epochs[i:i + per_run]) == per_run
    ]
    best = min(windows, key=lambda w: sum(e["duration_ms"] for e in w))
    agg: dict[str, int] = {}
    for e in best:
        for k, v in e["phase_ms"].items():
            agg[k] = agg.get(k, 0) + v
        agg["duration_ms"] = agg.get("duration_ms", 0) + e["duration_ms"]
    agg["gap_ms"] = agg["duration_ms"] - sum(
        v for k, v in agg.items() if k not in ("duration_ms", "gap_ms")
    )
    return {"width": width, "files_per_epoch": files_per_epoch,
            "bench": bench, "phase_ms_best_run": agg}


def main() -> None:
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    events = int(sys.argv[2]) if len(sys.argv) > 2 else 64_000_000
    files_per_epoch = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    sys.path.insert(0, REPO)
    from bench import ensure_changelog

    log_dir = ensure_changelog(events)
    files = sorted(
        os.path.join(log_dir, f) for f in os.listdir(log_dir)
        if f.endswith(".parquet")
    )
    res = profile(width, events, files_per_epoch)
    res["scan_narrow_sec"] = _floor(width, files, _scan_narrow)
    res["scan_full_sec"] = _floor(width, files, _scan_full)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
