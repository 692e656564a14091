"""Hard-kill (SIGKILL) mid-epoch resume rehearsal at the 64M bench
corpus (VERDICT r03 #4: the recorded rehearsal was 4M + graceful
SIGTERM; this one kills the JVM with -9 IN the epoch window, so the
crash can land anywhere — including between the sink commit and the
control-table write, the window ``backfill_from_manifest`` exists for).

Protocol:
  1. pristine single-pass CLI replay → root_clean (the reference
     state — the pandas oracle is a row loop, unusable at 64M; an
     uninterrupted replay of the same engine is the byte-level
     reference the north rule's "matches the reference replay" needs,
     and the 4M rehearsal already pinned engine == pandas-oracle).
  2. CLI replay → root_kill with 8 epochs (8M events each); poll the
     manifest until epoch K commits, wait INTO epoch K+1's window,
     then ``kill -9`` the process group.
  3. plain re-run of the same CLI command: fenced epochs skip, the
     interrupted epoch re-applies, the rest follow.
  4. verify_state(kill_table, clean_table): full-outer key join on
     (repo, path) comparing the per-row sha256(content) invariant —
     0 missing / 0 unexpected / 0 hash mismatches required.

Usage: python tools/kill_resume_rehearsal.py [EVENTS] [KILL_AFTER_S]
Prints one JSON line for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _cfg(path: str, log_dir: str, root: str, files_per_epoch: int,
         emit_changes: bool = False) -> str:
    cfg = os.path.join(path, "engine.toml")
    with open(cfg, "w") as f:
        f.write(
            "[source]\n"
            f'changelog_dir = "{log_dir}"\n'
            f"files_per_epoch = {files_per_epoch}\n"
            "[sink]\n"
            f'table_root = "{root}"\n'
            "n_buckets = 64\n"
            + ("emit_changes = true\n" if emit_changes else "")
        )
    return cfg


def _replay(cfg: str, env: dict) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, "-m", "atlas_spark.cli", "replay", "-c", cfg],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, start_new_session=True,
    )


def _committed(root: str) -> int:
    cur = os.path.join(root, "_manifests", "CURRENT")
    try:
        with open(cur) as f:
            v = int(f.read().strip())
        while os.path.exists(
            os.path.join(root, "_manifests", f"manifest.{v + 1:08d}.json")
        ):
            v += 1
        with open(
            os.path.join(root, "_manifests", f"manifest.{v:08d}.json")
        ) as f:
            return json.load(f)["committed_epoch_max"]
    except (FileNotFoundError, ValueError):
        return -1


def main() -> None:
    # --emit-changes: run the KILL side with the change feed on, so the
    # SIGKILL can land anywhere including the commit→emit window, and
    # verify post-resume that the feed is gap-free and diff-equal for
    # every committed merge (VERDICT r06 #3 at the 64M scale)
    emit = "--emit-changes" in sys.argv
    if emit:
        sys.argv.remove("--emit-changes")
    events = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000_000
    kill_after = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    from bench import ensure_changelog

    log_dir = ensure_changelog(events)
    env = dict(os.environ)
    env.setdefault("ATLAS_SPARK_DRIVER_MEM", "32g")
    env.setdefault("SPARK_GRAFT_CPUS", "16")

    work = tempfile.mkdtemp(prefix="atlas_rehearsal_")
    out: dict = {"events": events, "files_per_epoch": 8}
    try:
        # 1. pristine reference replay
        root_clean = os.path.join(work, "clean")
        cfg_clean = _cfg(work, log_dir, root_clean, 8)
        t0 = time.monotonic()
        p = _replay(cfg_clean, env)
        clean_log = p.communicate()[0]
        assert p.returncode == 0, clean_log[-2000:]
        out["clean_replay_sec"] = round(time.monotonic() - t0, 1)

        # 2. kill -9 mid-epoch
        root_kill = os.path.join(work, "kill")
        kdir = os.path.join(work, "k")
        os.makedirs(kdir, exist_ok=True)
        cfg_kill = _cfg(kdir, log_dir, root_kill, 8, emit_changes=emit)
        out["emit_changes"] = emit
        p = _replay(cfg_kill, env)
        target = 2  # let epochs 0..2 commit, kill inside epoch 3
        while _committed(root_kill) < target:
            if p.poll() is not None:
                raise SystemExit("replay finished before the kill window")
            time.sleep(0.25)
        time.sleep(kill_after)  # land INSIDE the next epoch's window
        assert p.poll() is None, "replay already done — kill_after too long"
        os.killpg(os.getpgid(p.pid), signal.SIGKILL)
        p.wait()
        out["killed_after_epoch"] = _committed(root_kill)
        out["kill_signal"] = "SIGKILL (kill -9, process group)"

        # 3. plain re-run converges
        p = _replay(cfg_kill, env)
        resume_log = p.communicate()[0]
        assert p.returncode == 0, resume_log[-2000:]
        tail = [l for l in resume_log.splitlines() if "epochs applied" in l]
        out["resume_summary"] = tail[-1] if tail else ""

        # 4. byte-identical convergence vs the pristine table
        from atlas_spark.session import get_spark
        from atlas_spark.sinks import LakehouseSink
        from atlas_spark.verification import verify_state

        spark = get_spark("rehearsal_verify", master="local[16]",
                          shuffle_partitions=32)
        clean = LakehouseSink(spark, root_clean).read()
        ksink = LakehouseSink(spark, root_kill, emit_changes=emit)
        killed = ksink.read()
        rep = verify_state(killed, clean)
        out["verify"] = {
            "expected_rows": rep.expected_rows,
            "actual_rows": rep.actual_rows,
            "missing": rep.missing,
            "unexpected": rep.unexpected,
            "hash_mismatch": rep.hash_mismatch,
            "passed": rep.passed,
        }
        feed_ok = True
        if emit:
            # gap-free + diff-equal change feed for EVERY committed
            # merge version, whatever window the SIGKILL landed in
            missing = ksink.backfill_changes()
            out["feed_backfilled_after_resume"] = missing
            if missing:
                # the resumed CLI replay is REQUIRED to have repaired
                # any commit→emit gap itself — if our own sweep found
                # one, the runner's resume repair is broken, which is
                # the exact regression this rehearsal exists to catch
                feed_ok = False
            checked = 0
            head = ksink.manifest()["version"]
            for v in range(1, head + 1):
                mv = ksink.manifest(v)
                ep = mv.get("epoch_id", -1)
                if ep < 0 or mv.get("compaction"):
                    continue
                emitted = ksink.changes(ep).drop(
                    "_pre_content_sha256", "_pre_seq"
                )
                d = ksink.diff(v - 1, v).localCheckpoint()
                delta = emitted.exceptAll(d).count() \
                    + d.exceptAll(emitted).count()
                if delta:
                    feed_ok = False
                checked += 1
            out["feed_epochs_checked"] = checked
            out["feed_matches_diff"] = feed_ok
        spark.stop()
        print(json.dumps(out))
        if not rep.passed or not feed_ok:
            raise SystemExit(1)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
