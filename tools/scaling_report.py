"""N-vs-4N scaling evidence → BENCH/BASELINE.md.

Runs the identical CDC replay at local[8] and local[32] (separate JVMs,
same input, cores as the executor-count proxy per BASELINE.md) and
reports steady-state throughput at both plus scaling efficiency
  eff = (throughput_32 / throughput_8) / (32 / 8),  target ≥ 0.8.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, events: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--replay-only", "--cpus", str(cpus), "--events", str(events)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    r8 = run(8, events)
    r32 = run(32, events)
    eff = (r32["events_per_sec"] / r8["events_per_sec"]) / (32 / 8)
    md = f"""# BENCH — atlas_spark CDC replay scaling (N vs 4N)

Same job, same input ({events:,} change events, 64 parquet files,
{r8['epochs']} epochs, schema evolution + 5% deletes + 20% hot-repo skew +
1% duplicate delivery), identical code — run at two parallelism levels
(`local[8]` vs `local[32]`; cores stand in for executor count per
BASELINE.md, no real cluster in this sandbox).  Steady-state timing:
untimed warmup replays per JVM until run-to-run improvement < 15%
(max 5), then the timed run — a 10^10-event stream runs thousands of
epochs, so steady state is the honest number.

| parallelism | wall (s) | events/s | final rows |
|---|---|---|---|
| local[8]  (N)  | {r8['replay_sec']} | {r8['events_per_sec']:,.0f} | {r8['final_rows']:,} |
| local[32] (4N) | {r32['replay_sec']} | {r32['events_per_sec']:,.0f} | {r32['final_rows']:,} |

**Scaling efficiency = ({r32['events_per_sec']:,.0f} / {r8['events_per_sec']:,.0f}) / 4 = {eff:.2f}**
(target ≥ 0.8 per BASELINE.json north rule — {"MET" if eff >= 0.8 else "NOT MET"})

Reference baseline (erikhoward/atlas, BASELINE.md): 17–33 records/s,
network-bound per-row HTTP + per-row INSERT.  This engine's columnar
MERGE replay sustains **{r32['events_per_sec']:,.0f} events/s** on one node at
local[32] — ~{r32['events_per_sec']/33:,.0f}× the reference ceiling.

Raw JSON:
```json
{json.dumps(r8)}
{json.dumps(r32)}
```
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
