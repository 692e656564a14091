"""CLI end-to-end: init → replay → status → replay again (fenced) →
compact, via subprocesses with real exit codes."""

import json
import os
import subprocess
import sys

from atlas_spark.changelog import ChangelogSpec, generate_changelog, write_changelog

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "atlas_spark.cli", *args],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )


def test_cli_replay_status_compact(tmp_path):
    log_dir = str(tmp_path / "log")
    write_changelog(
        generate_changelog(
            ChangelogSpec(n_events=300, n_repos=4, paths_per_repo=6)
        ),
        log_dir, n_files=2,
    )
    table = str(tmp_path / "table")
    cfg = tmp_path / "engine.toml"
    cfg.write_text(
        f'[source]\nchangelog_dir = "{log_dir}"\nfiles_per_epoch = 1\n'
        f'[sink]\ntable_root = "{table}"\nn_buckets = 4\n'
        f'[spark]\nmaster = "local[2]"\nshuffle_partitions = 2\n'
    )

    r = _cli("replay", "-c", str(cfg))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "epochs applied=2" in r.stdout

    r2 = _cli("status", "-c", str(cfg))
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "last_epoch=1" in r2.stdout

    # second replay: everything fenced
    r3 = _cli("replay", "-c", str(cfg))
    assert r3.returncode == 0
    assert "epochs applied=0 skipped=2" in r3.stdout

    r4 = _cli("compact", "-c", str(cfg))
    assert r4.returncode == 0
    assert "compacted" in r4.stdout

    # manifest sane after all of it
    with open(os.path.join(table, "_manifests", "CURRENT")) as f:
        v = int(f.read())
    with open(
        os.path.join(table, "_manifests", f"manifest.{v:08d}.json")
    ) as f:
        m = json.load(f)
    assert m["committed_epoch_max"] == 1


def test_cli_verify(tmp_path):
    from atlas_spark.changelog import expected_state_pdf

    changelog = generate_changelog(
        ChangelogSpec(n_events=200, n_repos=3, paths_per_repo=5)
    )
    log_dir = str(tmp_path / "log")
    write_changelog(changelog, log_dir, n_files=2)
    table = str(tmp_path / "table")
    cfg = tmp_path / "engine.toml"
    cfg.write_text(
        f'[source]\nchangelog_dir = "{log_dir}"\nfiles_per_epoch = 2\n'
        f'[sink]\ntable_root = "{table}"\nn_buckets = 4\n'
        f'[spark]\nmaster = "local[2]"\nshuffle_partitions = 2\n'
    )
    assert _cli("replay", "-c", str(cfg)).returncode == 0

    expected = expected_state_pdf(changelog)
    exp_path = str(tmp_path / "expected.parquet")
    expected[["repo", "path", "content_sha256"]].to_parquet(exp_path)
    r = _cli("verify", "-c", str(cfg), "-e", exp_path)
    assert r.returncode == 0 and "PASS" in r.stdout, r.stdout + r.stderr[-500:]

    # tamper: drop a row from expected → verify fails
    expected.iloc[1:][["repo", "path", "content_sha256"]].to_parquet(exp_path)
    r2 = _cli("verify", "-c", str(cfg), "-e", exp_path)
    assert r2.returncode == 1 and "FAIL" in r2.stdout


def test_cli_full_mode_refuses_existing_table(tmp_path):
    log_dir = str(tmp_path / "log")
    write_changelog(
        generate_changelog(ChangelogSpec(n_events=100, n_repos=2, paths_per_repo=4)),
        log_dir, n_files=1,
    )
    table = str(tmp_path / "table")
    cfg = tmp_path / "engine.toml"
    base = (
        f'[source]\nchangelog_dir = "{log_dir}"\nfiles_per_epoch = 1\n'
        f'{{mode}}'
        f'[sink]\ntable_root = "{table}"\nn_buckets = 2\n'
        f'[spark]\nmaster = "local[2]"\nshuffle_partitions = 2\n'
    )
    cfg.write_text(base.format(mode=""))
    assert _cli("replay", "-c", str(cfg)).returncode == 0
    cfg.write_text(base.format(mode='mode = "full"\n'))
    r = _cli("replay", "-c", str(cfg))
    assert r.returncode == 2
    assert "fresh" in r.stderr
