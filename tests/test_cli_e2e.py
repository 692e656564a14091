"""CLI end-to-end: init → replay → status → fenced replay → verify
(pass + fail) → compact → full-mode guard, via subprocesses with real
exit codes.  One table, one test — each CLI call boots a JVM, so they
are consolidated (small heap via env to speed startup)."""

import json
import os
import subprocess
import sys

from atlas_spark.changelog import (
    ChangelogSpec,
    expected_state_pdf,
    generate_changelog,
    write_changelog,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ENV = {**os.environ, "ATLAS_SPARK_DRIVER_MEM": "2g"}


def _cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "atlas_spark.cli", *args],
        capture_output=True, text=True, cwd=REPO, timeout=300, env=_ENV,
    )


def test_cli_lifecycle(tmp_path):
    changelog = generate_changelog(
        ChangelogSpec(n_events=300, n_repos=4, paths_per_repo=6)
    )
    log_dir = str(tmp_path / "log")
    write_changelog(changelog, log_dir, n_files=2)
    table = str(tmp_path / "table")
    base = (
        f'[source]\nchangelog_dir = "{log_dir}"\nfiles_per_epoch = 1\n'
        "{mode}"
        f'[sink]\ntable_root = "{table}"\nn_buckets = 4\n'
        f'[spark]\nmaster = "local[2]"\nshuffle_partitions = 2\n'
    )
    cfg = tmp_path / "engine.toml"
    cfg.write_text(base.format(mode=""))

    r = _cli("replay", "-c", str(cfg))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "epochs applied=2" in r.stdout

    r2 = _cli("status", "-c", str(cfg))
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "last_epoch=1" in r2.stdout
    assert "✅ completed" in r2.stdout  # glyph column (status.rs parity)

    # --epoch/--bucket filters narrow the tables (status.rs:46-66 analog)
    r2f = _cli("status", "-c", str(cfg), "--epoch", "0", "--bucket", "0")
    assert r2f.returncode == 0, r2f.stderr[-2000:]
    wm_lines = [l for l in r2f.stdout.splitlines() if "✅" in l]
    assert wm_lines and all("|1  " not in l for l in wm_lines)

    # --json: one machine-readable doc with summary + watermarks +
    # per-bucket lag + metrics (status.rs:93-127 lag-detail parity)
    rj = _cli("status", "-c", str(cfg), "--json")
    assert rj.returncode == 0, rj.stderr[-2000:]
    doc = json.loads(rj.stdout.strip().splitlines()[-1])
    assert doc["last_epoch"] == 1 and doc["buckets"] == 4
    assert doc["watermarks"] and all(
        w["status"] in ("completed", "in_progress", "interrupted",
                        "recovered") for w in doc["watermarks"])
    lags = {r["partition_id"]: r["seq_lag"] for r in doc["bucket_lag"]}
    assert lags and min(lags.values()) == 0 and all(
        v >= 0 for v in lags.values())
    assert doc["metrics"] and doc["metrics"][0]["rows_in"] > 0

    # second replay: everything fenced
    r3 = _cli("replay", "-c", str(cfg))
    assert r3.returncode == 0
    assert "epochs applied=0 skipped=2" in r3.stdout

    # verify against the oracle snapshot: PASS, then a tampered FAIL
    expected = expected_state_pdf(changelog)
    exp_path = str(tmp_path / "expected.parquet")
    expected[["repo", "path", "content_sha256"]].to_parquet(exp_path)
    r4 = _cli("verify", "-c", str(cfg), "-e", exp_path)
    assert r4.returncode == 0 and "PASS" in r4.stdout, r4.stdout + r4.stderr[-500:]
    expected.iloc[1:][["repo", "path", "content_sha256"]].to_parquet(exp_path)
    r5 = _cli("verify", "-c", str(cfg), "-e", exp_path)
    assert r5.returncode == 1 and "FAIL" in r5.stdout

    r6 = _cli("compact", "-c", str(cfg))
    assert r6.returncode == 0 and "compacted" in r6.stdout

    # full mode refuses an already-populated table
    cfg.write_text(base.format(mode='mode = "full"\n'))
    r7 = _cli("replay", "-c", str(cfg))
    assert r7.returncode == 2 and "fresh" in r7.stderr

    # manifest sane after all of it
    with open(os.path.join(table, "_manifests", "CURRENT")) as f:
        v = int(f.read())
    with open(os.path.join(table, "_manifests", f"manifest.{v:08d}.json")) as f:
        m = json.load(f)
    assert m["committed_epoch_max"] == 1


def test_cli_replay_confirms_changed_stream_identity(tmp_path):
    """Pointing `replay` at a DIFFERENT changelog than the one a table
    was built from must refuse (exit 2) unless --yes accepts the new
    stream identity (reference export.rs:147-172 confirm analog)."""
    cl = generate_changelog(ChangelogSpec(n_events=120, n_repos=3,
                                          paths_per_repo=5))
    log_a = str(tmp_path / "log_a")
    log_b = str(tmp_path / "log_b")
    write_changelog(cl, log_a, n_files=1)
    write_changelog(cl, log_b, n_files=2)  # different slicing/names
    table = str(tmp_path / "table")

    def cfg_for(log_dir):
        p = tmp_path / "engine.toml"
        p.write_text(
            f'[source]\nchangelog_dir = "{log_dir}"\nfiles_per_epoch = 1\n'
            f'[sink]\ntable_root = "{table}"\nn_buckets = 4\n'
            f'[spark]\nmaster = "local[2]"\nshuffle_partitions = 2\n'
        )
        return str(p)

    r = _cli("replay", "-c", cfg_for(log_a))
    assert r.returncode == 0, r.stderr[-2000:]

    # rotated/re-sliced changelog, no --yes, non-interactive → exit 2
    r2 = _cli("replay", "-c", cfg_for(log_b))
    assert r2.returncode == 2, (r2.stdout, r2.stderr[-2000:])
    assert "fingerprint mismatch" in r2.stderr

    # --yes accepts the new identity (the epoch-plan guard still
    # protects against silent re-slicing of COMMITTED epochs, so the
    # run aborts loudly rather than corrupting — but the refusal is
    # no longer the fingerprint's)
    r3 = _cli("replay", "-c", cfg_for(log_b), "--yes")
    assert "fingerprint mismatch" not in (r3.stderr or "")
