"""Bench harness (driver contract + scaling evidence).

Default mode: runs the headline CDC replay (synthetic changelog →
converged lake table, oracle-verified cardinality) plus a set of
catalog queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value" (sec), "unit", "queries", "sf", ...}.

``--replay-only --cpus N`` prints the replay JSON only — used by
tools/scaling_report.py's width ladder (local[1..16], the sandbox
proxy for N vs 4N executors; BASELINE.md scaling rule).  Timed
replays are best-of-5 after steady-state warmups; see the ladder
report for the same-window machine controls.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_EVENTS = int(os.environ.get("ATLAS_BENCH_EVENTS", "4000000"))
BENCH_DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_data")

QUERY_NAMES = [
    "q_lww_latest",
    "q_watermark_agg",
    "q_sha256_content",
    "q_minhash_signature",
    "q_ngram_jaccard",
    "q_embedding_topk",
    "q_json_extract",
    "q_salted_agg",
    "q_state_diff",
]


_CHUNK_EVENTS = 16_000_000


def _gen_chunk(args) -> int:
    """One deterministic chunk (seed + repo namespace per chunk) —
    worker for the parallel big-corpus path."""
    chunk_id, n_events, n_files, out = args
    from atlas_spark.changelog import ChangelogSpec, generate_changelog

    spec = ChangelogSpec(
        n_events=n_events,
        n_repos=200,
        paths_per_repo=500,
        delete_frac=0.05,
        hot_repo_frac=0.20,
        schema_evolution=True,
        out_of_order_deletes=50,
        duplicate_frac=0.01,
        seed=42 + chunk_id,
    )
    df = generate_changelog(spec)
    df["repo"] = f"c{chunk_id}_" + df["repo"]
    import numpy as np
    parts = np.array_split(df, n_files)
    for i, part in enumerate(parts):
        part.to_parquet(
            os.path.join(out, f"changelog-{chunk_id:02d}{i:03d}.parquet"),
            index=False,
        )
    return len(df)


def ensure_changelog(n_events: int, n_files: int = 64) -> str:
    """Generate (once, cached) the deterministic bench changelog.

    Above _CHUNK_EVENTS the corpus is produced as parallel chunks,
    each with its own seed and a disjoint repo namespace (`c{k}_…`),
    so per-key LWW semantics are unaffected by seq reuse across
    chunks — the single-threaded pandas generator would otherwise
    take ~30 min for a 64M-event corpus."""
    out = os.path.join(BENCH_DATA, f"changelog_{n_events}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    if n_events > _CHUNK_EVENTS:
        import multiprocessing as mp

        n_chunks = (n_events + _CHUNK_EVENTS - 1) // _CHUNK_EVENTS
        per = n_events // n_chunks
        fper = max(1, n_files // n_chunks)
        jobs = [(c, per, fper, out) for c in range(n_chunks)]
        # 2 workers: a 16M-row pandas chunk peaks ~20 GB; 4 concurrent
        # chunks OOM-killed a worker on the 128 GB box (and a killed
        # Pool worker hangs map() forever — classic footgun)
        with mp.Pool(min(n_chunks, 2)) as pool:
            counts = pool.map(_gen_chunk, jobs)
        total = sum(counts)
    else:
        from atlas_spark.changelog import (
            ChangelogSpec,
            generate_changelog,
            write_changelog,
        )

        spec = ChangelogSpec(
            n_events=n_events,
            n_repos=200,
            paths_per_repo=500,
            delete_frac=0.05,
            hot_repo_frac=0.20,
            schema_evolution=True,
            out_of_order_deletes=50,
            duplicate_frac=0.01,
        )
        df = generate_changelog(spec)
        write_changelog(df, out, n_files=n_files)
        total = len(df)
    with open(marker, "w") as f:
        f.write(str(total))
    return out


def _replay_once(spark, log_dir: str, n_buckets: int = 64,
                 files_per_epoch: int = 32):
    """One full replay into a throwaway table; returns (wall_s, summary)."""
    from atlas_spark.plans.schema_evolution import DEFAULT_RULES
    from atlas_spark.sinks import LakehouseSink
    from atlas_spark.streaming import ReplayRunner

    decl = list(DEFAULT_RULES.typed_columns.items())
    root = tempfile.mkdtemp(prefix="atlas_bench_timed_")
    try:
        sink = LakehouseSink(spark, root, n_buckets=n_buckets)
        sink.ensure(declared_columns=decl)
        runner = ReplayRunner(spark, sink, files_per_epoch=files_per_epoch)
        t0 = time.monotonic()
        s = runner.run(log_dir)
        return time.monotonic() - t0, s
    finally:
        shutil.rmtree(root, ignore_errors=True)


def replay_server(spark, log_dir: str, files_per_epoch: int = 32) -> None:
    """Interleaved-ladder worker (VERDICT r05 task #1): keep THIS
    width's JVM alive, warm it to steady state once, then run exactly
    one timed replay per ``run`` line on stdin, printing one JSON line
    per run.  The orchestrator (tools/scaling_report.py --interleaved)
    alternates ``run`` between a w1 server and a w4 server so each
    efficiency pair is measured minutes apart inside one VM window —
    per-width machine drift cancels by construction instead of by
    post-hoc normalization."""
    prev = None
    for _ in range(3):  # adaptive untimed JIT warmup, capped
        dt, _ = _replay_once(spark, log_dir, files_per_epoch=files_per_epoch)
        if prev is not None and dt > prev * 0.85:
            break
        prev = dt
    print("READY", flush=True)
    for line in sys.stdin:
        cmd = line.strip()
        if cmd == "run":
            # Force a full GC between timed runs: Spark's ContextCleaner
            # frees broadcast/shuffle state only when driver GC collects
            # the weak refs, and a 32g heap GCs rarely — without this
            # the JVM creeps to its heap cap over ~8 replays and late
            # runs measure GC churn, not the engine (observed: w4 runs
            # degrading 41→85 s across one ladder while w1 held steady)
            spark.sparkContext._jvm.System.gc()
            dt, s = _replay_once(spark, log_dir,
                                 files_per_epoch=files_per_epoch)
            print(json.dumps({
                "replay_sec": round(dt, 3),
                "events": s.rows_in,
                "events_per_sec": round(s.rows_in / dt, 1),
                "epochs": s.epochs_applied,
            }), flush=True)
        else:  # quit / EOF
            break


def run_replay(spark, log_dir: str, n_buckets: int = 64,
               files_per_epoch: int = 32) -> dict:
    from atlas_spark.plans.schema_evolution import DEFAULT_RULES
    from atlas_spark.sinks import LakehouseSink
    from atlas_spark.streaming import ReplayRunner

    # the corpus's evolution rules are known to the operator — declare
    # the evolved columns at CREATE TABLE time (DDL-ensure) so no
    # replay pays the full payload-column presence probe
    decl = list(DEFAULT_RULES.typed_columns.items())

    root = tempfile.mkdtemp(prefix="atlas_bench_sink_")
    try:
        # Steady-state measurement: a cold local JVM spends tens of
        # seconds on class-loading + tiered C2 JIT of the pipeline
        # (measured: cold 57s vs warm 3s for the identical job), and
        # full compilation needs several complete runs.  A 10^10-event
        # production stream runs thousands of epochs, so steady state
        # is the honest number — warm up with UNTIMED replays until the
        # run-to-run improvement falls under 15% (max 5), then time.
        prev = None
        for _ in range(5):
            warm_root = tempfile.mkdtemp(prefix="atlas_bench_warm_")
            try:
                wsink = LakehouseSink(spark, warm_root, n_buckets=n_buckets)
                wsink.ensure(declared_columns=decl)
                t0 = time.monotonic()
                ReplayRunner(
                    spark, wsink, files_per_epoch=files_per_epoch
                ).run(log_dir)
                dt = time.monotonic() - t0
            finally:
                shutil.rmtree(warm_root, ignore_errors=True)
            if prev is not None and dt > prev * 0.85:
                break
            prev = dt

        # Timed: BEST of 5 runs.  A single post-warmup run still
        # varies ±50% on this VM (GC phase, page-cache writeback,
        # noisy-neighbor bandwidth drift landing inside the window —
        # the r02 ladder once measured local[8] slower than local[4]
        # on single runs); the best of 5 is the honest sustained
        # steady-state rate a thousand-epoch stream would see.  All
        # raw times are reported.
        raw = []
        best = None
        for _ in range(5):
            # Same inter-run GC as replay_server: ContextCleaner frees
            # broadcast/shuffle state only on driver GC, and a 32g
            # fixed heap left alone creeps toward its cap across the
            # warmup+timed runs sharing this JVM — late runs then
            # measure collector churn (the r05 run set spanned
            # 9.2-21.5 s inside one best-of-5 window)
            spark.sparkContext._jvm.System.gc()
            root_i = tempfile.mkdtemp(prefix="atlas_bench_timed_")
            try:
                sink = LakehouseSink(spark, root_i, n_buckets=n_buckets)
                sink.ensure(declared_columns=decl)
                runner = ReplayRunner(
                    spark, sink, files_per_epoch=files_per_epoch
                )
                t0 = time.monotonic()
                s = runner.run(log_dir)
                dt = time.monotonic() - t0
                raw.append(round(dt, 3))
                if best is None or dt < best[0]:
                    best = (dt, s, sink.read().count())  # count untimed
            finally:
                shutil.rmtree(root_i, ignore_errors=True)
        dt, s, final_rows = best
        return {
            "replay_sec": round(dt, 3),
            "replay_sec_runs": raw,
            "events": s.rows_in,
            "events_per_sec": round(s.rows_in / dt, 1),
            "epochs": s.epochs_applied,
            "final_rows": final_rows,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _burn(_):
    x = 0
    for i in range(20_000_000):
        x += i * i
    return x


def _scan_one(path: str) -> int:
    import pyarrow.parquet as pq

    t = pq.read_table(path)  # full decompress + Arrow materialization
    return t.num_rows


def machine_controls(cpus: int, sf_dir: str) -> dict:
    """Same-window machine ceilings (the ladder's controls, VERDICT r04
    task #2): a pure-multiprocessing CPU burn and a pure-pyarrow scan of
    the sf tables.  Recorded beside every driver bench so a cross-round
    total drift can be attributed to the VM window (controls drifted
    too) vs the engine (controls steady) without re-adjudicating noise.
    Best-of-3 each — a control measures the ceiling, not one window."""
    import glob
    import multiprocessing as mp

    files = sorted(glob.glob(os.path.join(sf_dir, "*.parquet")))
    # repeat the file list so every pool slot has work at wide cpus
    reps = max(1, (cpus * 2) // max(1, len(files)))
    files = files * reps
    cpu_best = scan_best = 0.0
    for _ in range(3):
        t0 = time.monotonic()
        with mp.Pool(cpus) as p:
            p.map(_burn, range(cpus * 2))
        cpu_best = max(cpu_best, (cpus * 2) / (time.monotonic() - t0))
    with mp.Pool(cpus) as p:
        p.map(_scan_one, files)  # warm page cache, untimed
    for _ in range(3):
        t0 = time.monotonic()
        with mp.Pool(cpus) as p:
            p.map(_scan_one, files)
        scan_best = max(scan_best, len(files) / (time.monotonic() - t0))
    return {
        "cpu_tasks_per_sec": round(cpu_best, 2),
        "scan_files_per_sec": round(scan_best, 2),
    }


def _controls_vs_prev(controls: dict) -> dict | None:
    """Ratio of this run's machine controls to the newest recorded
    round's (``BENCH_r*.json`` beside this script) — VERDICT r05 task
    #5: with control-vs-control deltas in the JSON, cross-round drift
    adjudication is mechanical (ratio ≈ engine-relevant window shift;
    a query moving WITH the ratio is the box, against it the engine)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = sorted(
        glob.glob(os.path.join(here, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    # never compare the in-progress round's controls to themselves
    # (ADVICE r06: once the driver writes BENCH_r{N}.json, a re-run
    # within round N would read ratios ≈ 1.0 and silently defeat the
    # drift adjudication) — the current round comes from the driver's
    # progress log, overridable via ATLAS_BENCH_CUR_ROUND
    cur_round = None
    try:
        cur_round = int(os.environ["ATLAS_BENCH_CUR_ROUND"])
    except (KeyError, ValueError):
        try:
            with open(os.path.join(here, "PROGRESS.jsonl")) as f:
                for line in f:
                    if not line.strip():
                        continue
                    # keep the LAST line that carries a round; a
                    # trailing round-less or malformed line must not
                    # reset the guard to None (that would silently
                    # re-enable the compare-to-self defeat)
                    try:
                        r = json.loads(line).get("round")
                    except json.JSONDecodeError:
                        continue
                    if r is not None:
                        cur_round = r
        except OSError:
            cur_round = None
    for path in reversed(rounds):
        n = int(re.search(r"_r(\d+)", path).group(1))
        if cur_round is not None and n >= cur_round:
            continue
        try:
            with open(path) as f:
                doc = json.load(f)
            # the driver wraps bench's JSON line under "parsed"
            prev = (doc.get("parsed") or doc).get("controls")
        except (OSError, json.JSONDecodeError, AttributeError):
            continue
        if not prev:
            continue  # rounds before r05 carried no controls
        out = {"prev": os.path.basename(path)}
        for k, cur in controls.items():
            p = prev.get(k)
            if p:
                out[f"{k}_ratio"] = round(cur / p, 3)
        return out
    return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replay-only", action="store_true")
    ap.add_argument("--replay-server", action="store_true",
                    help="interleaved-ladder worker: warm up, print "
                         "READY, then one timed replay per 'run' stdin "
                         "line (see tools/scaling_report.py)")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--events", type=int, default=BENCH_EVENTS)
    ap.add_argument("--files-per-epoch", type=int, default=32,
                    help="epoch granularity for --replay-only/--replay-"
                         "server: 64 files / N = epochs per replay (the "
                         "many-epoch amortization shape, VERDICT r05 #4)")
    args = ap.parse_args()

    cpus = args.cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from atlas_spark.session import get_spark

    spark = get_spark("atlas_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    log_dir = ensure_changelog(args.events)

    if args.replay_server:
        replay_server(spark, log_dir,
                      files_per_epoch=args.files_per_epoch)
        spark.stop()
        return

    replay = run_replay(spark, log_dir,
                        files_per_epoch=args.files_per_epoch)

    if args.replay_only:
        print(json.dumps({"cpus": cpus, **replay}))
        spark.stop()
        return

    # merge-on-read variant (JVM already warm): SAME epoch shape as the
    # CoW replay so the numbers compare write paths, not epoch counts —
    # r02 ran MoR at files_per_epoch=8 vs CoW at 32 and concluded MoR
    # was slower when it was just paying 4× the per-epoch fixed cost.
    from atlas_spark.sinks import LakehouseSink
    from atlas_spark.streaming import ReplayRunner

    mor_sec = mor_eps = None
    for _ in range(3):  # MoR-specific plans need their own JIT warmup
        mor_root = tempfile.mkdtemp(prefix="atlas_bench_mor_")
        try:
            msink = LakehouseSink(spark, mor_root, n_buckets=64, mode="mor")
            from atlas_spark.plans.schema_evolution import DEFAULT_RULES
            msink.ensure(
                declared_columns=list(DEFAULT_RULES.typed_columns.items())
            )
            t0 = time.monotonic()
            ms = ReplayRunner(spark, msink, files_per_epoch=32).run(log_dir)
            dt = time.monotonic() - t0
            if mor_sec is None or dt < mor_sec:
                mor_sec = round(dt, 3)
                mor_eps = round(ms.rows_in / dt, 1)
        finally:
            shutil.rmtree(mor_root, ignore_errors=True)

    from atlas_spark.operators import QUERIES

    # Per-query: one untimed warmup (JIT + page cache + Arrow init for
    # that query's plan shape) then BEST of 3 timed runs.  BENCH_r04 vs
    # r03 read as a 24% "regression" that was a ±30% VM window landing
    # on single-shot timings (VERDICT r04 "what's wrong" #3) — best-of-3
    # with raw runs reported makes the driver JSON window-resistant.
    queries: dict[str, float] = {"cdc_replay": replay["replay_sec"]}
    query_runs: dict[str, list[float]] = {
        "cdc_replay": replay["replay_sec_runs"]
    }
    for name in QUERY_NAMES:
        QUERIES[name](spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()  # warmup, untimed
        raw = []
        for _ in range(3):
            t0 = time.monotonic()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            raw.append(round(time.monotonic() - t0, 3))
        queries[name] = min(raw)
        query_runs[name] = raw

    controls = machine_controls(cpus, sf_dir)
    controls_vs_prev = _controls_vs_prev(controls)
    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "cdc_replay_plus_catalog_sec",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "query_runs": query_runs,
                "controls": controls,
                "controls_vs_prev": controls_vs_prev,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "replay_events": replay["events"],
                "replay_events_per_sec": replay["events_per_sec"],
                "replay_final_rows": replay["final_rows"],
                "mor_replay_sec": mor_sec,
                "mor_events_per_sec": mor_eps,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
