"""CDC fan-out (round 7): a replica reconstructed purely from the
emitted change feed must equal the source byte-for-byte — including
tombstones, LWW guard behavior for late events, evolved columns, and
its own re-emitted feed.  This is simultaneously the completeness
proof for the feed: nothing dropped, nothing misclassified.
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from atlas_spark.operators.replicate import feed_to_changelog, replicate
from atlas_spark.sinks import LakehouseSink

COLS = ["seq", "op", "repo", "path", "commit", "lang", "content"]


def _cl(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=COLS))


def _mk(spark, tmp_path, name, n_buckets=4, **kw):
    s = LakehouseSink(spark, str(tmp_path / name), n_buckets=n_buckets,
                      emit_changes=True, **kw)
    s.ensure()
    return s


def _state(sink):
    return sorted(
        tuple(r) for r in sink.read(include_tombstones=True)
        .select("repo", "path", "seq", "is_deleted", "commit", "lang",
                "content", "content_sha256")
        .collect()
    )


def test_replica_equals_source_through_epochs(spark, tmp_path):
    src = _mk(spark, tmp_path, "src")
    dst = _mk(spark, tmp_path, "dst")
    src.merge(_cl(spark, [
        (1, "U", "r1", "a", "c1", "py", "x" * 10),
        (2, "U", "r1", "b", "c2", "py", "y" * 20),
        (3, "U", "r2", "c", "c3", "go", "z" * 5),
    ]), 0)
    src.merge(_cl(spark, [
        (10, "U", "r1", "a", "c4", "py", "x" * 30),
        (11, "D", "r1", "b", "c5", "py", ""),
    ]), 1)
    out = replicate(src, dst)
    assert out["applied_epochs"] == [0, 1]
    assert _state(dst) == _state(src)
    # idempotent: a re-sync fences every epoch to a no-op
    assert replicate(src, dst)["applied_epochs"] == []
    assert _state(dst) == _state(src)
    # incremental: only the new epoch moves
    src.merge(_cl(spark, [(20, "U", "r2", "d", "c6", "go", "w")]), 2)
    assert replicate(src, dst)["applied_epochs"] == [2]
    assert _state(dst) == _state(src)


def test_replica_preserves_lww_guard_for_late_events(spark, tmp_path):
    """The replica must keep the tombstone's seq, so a late-but-older
    upsert merged DIRECTLY into the replica stays dead there exactly
    as it would on the source."""
    src = _mk(spark, tmp_path, "src")
    dst = _mk(spark, tmp_path, "dst")
    src.merge(_cl(spark, [(5, "U", "r1", "a", "c1", "py", "xx")]), 0)
    src.merge(_cl(spark, [(9, "D", "r1", "a", "c2", "py", "")]), 1)
    replicate(src, dst)
    assert _state(dst) == _state(src)
    late = _cl(spark, [(7, "U", "r1", "a", "c3", "py", "resurrect?")])
    src.merge(late, 2)
    dst.merge(late, 2)
    assert _state(dst) == _state(src)
    live = dst.read().filter(F.col("path") == "a").count()
    assert live == 0  # still dead on both


def test_replica_feed_equals_source_feed(spark, tmp_path):
    """The replica re-emits its own change feed; per epoch it must
    match the source's (modulo pre-image identity, whose seq is the
    same but recomputed) — misclassification anywhere would surface
    here."""
    src = _mk(spark, tmp_path, "src")
    dst = _mk(spark, tmp_path, "dst")
    src.merge(_cl(spark, [(1, "U", "r1", "a", "c1", "py", "xx"),
                          (2, "U", "r2", "b", "c2", "go", "yy")]), 0)
    src.merge(_cl(spark, [(3, "U", "r1", "a", "c3", "py", "zzz"),
                          (4, "D", "r2", "b", "c4", "go", "")]), 1)
    replicate(src, dst)
    for ep in (0, 1):
        a = sorted(tuple(r) for r in src.changes(ep).collect())
        b = sorted(tuple(r) for r in dst.changes(ep).collect())
        assert a == b


def test_replica_carries_evolved_columns(spark, tmp_path):
    src = _mk(spark, tmp_path, "src")
    dst = _mk(spark, tmp_path, "dst")
    src.merge(_cl(spark, [(1, "U", "r1", "a", "c1", "py", "xx")]), 0)
    b2 = _cl(spark, [(2, "U", "r1", "b", "c2", "py", "yy")]).withColumn(
        "lines", F.lit(42).cast("bigint")
    )
    src.merge(b2, 1)
    replicate(src, dst)
    got = {r["path"]: r["lines"] for r in dst.read().collect()}
    assert got == {"a": None, "b": 42}


def test_replica_own_manifest_pruning_does_not_fake_lag(spark, tmp_path):
    """The replica watermark is its HEAD manifest's epoch id, so
    pruning the REPLICA's old manifests (its own retention) must not
    make a current replica look permanently behind."""
    src = _mk(spark, tmp_path, "src")
    dst = _mk(spark, tmp_path, "dst")
    for e in range(4):
        src.merge(_cl(spark, [(e + 1, "U", "r1", f"p{e}",
                               f"c{e}", "py", f"v{e}")]), e)
    replicate(src, dst)
    dst.vacuum(retain_versions=1, min_age_seconds=0.0)
    # still recognized as current…
    assert replicate(src, dst)["applied_epochs"] == []
    # …and future epochs still flow
    src.merge(_cl(spark, [(9, "U", "r2", "q", "c9", "go", "w")]), 4)
    assert replicate(src, dst)["applied_epochs"] == [4]
    assert _state(dst) == _state(src)


def test_replicate_behind_pruned_retention_raises(spark, tmp_path):
    src = _mk(spark, tmp_path, "src")
    dst = _mk(spark, tmp_path, "dst")
    src.merge(_cl(spark, [(1, "U", "r1", "a", "c1", "py", "xx")]), 0)
    src.merge(_cl(spark, [(2, "U", "r1", "b", "c2", "py", "yy")]), 1)
    src.vacuum(retain_versions=1, min_age_seconds=0.0, retain_changes=1)
    with pytest.raises(RuntimeError, match="re-seed"):
        replicate(src, dst)


def test_replicate_stream_follows_and_reports_lag(spark, tmp_path):
    """Continuous replication: the change-feed stream is the trigger,
    replicate() is the sync (a micro-batch may carry a partial epoch,
    so batch CONTENT is never merged directly).  Redelivered triggers
    are fenced no-ops; lag reads 0 after each drain."""
    from atlas_spark.operators.replicate import (
        replicate_stream, replication_lag,
    )

    src = _mk(spark, tmp_path, "src")
    dst = _mk(spark, tmp_path, "dst")
    ckpt = str(tmp_path / "ck")
    src.merge(_cl(spark, [(1, "U", "r1", "a", "c1", "py", "xx"),
                          (2, "U", "r2", "b", "c2", "go", "yy")]), 0)
    assert replication_lag(src, dst)["pending_epochs"] == 1
    q = replicate_stream(src, dst, ckpt)
    q.awaitTermination(120)
    assert _state(dst) == _state(src)
    lag = replication_lag(src, dst)
    assert lag["pending_epochs"] == 0
    assert lag["replica_head_epoch"] == lag["source_head_epoch"] == 0
    # next epoch arrives; a restarted follower drains only the new one
    src.merge(_cl(spark, [(3, "D", "r1", "a", "c3", "py", "")]), 1)
    q = replicate_stream(src, dst, ckpt)
    q.awaitTermination(120)
    assert _state(dst) == _state(src)
    assert replication_lag(src, dst)["pending_epochs"] == 0


def test_cli_replicate_end_to_end(tmp_path):
    """CLI surface: replay with the feed on, then `replicate --to`
    builds the replica and prints applied epochs + lag; a feed-less
    config is refused at exit 2."""
    import json
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "PYTHONPATH": repo}

    def run(*args):
        return subprocess.run(
            [_sys.executable, "-m", "atlas_spark.cli", *args],
            capture_output=True, text=True, env=env, cwd=repo,
        )

    from atlas_spark.changelog import (
        ChangelogSpec, generate_changelog, write_changelog,
    )
    log = str(tmp_path / "log")
    write_changelog(
        generate_changelog(ChangelogSpec(n_events=200, n_repos=3,
                                         paths_per_repo=6)),
        log, n_files=2,
    )
    cfgp = tmp_path / "engine.toml"
    cfgp.write_text(
        f'[source]\nchangelog_dir = "{log}"\nfiles_per_epoch = 1\n'
        f'[sink]\ntable_root = "{tmp_path / "src"}"\nn_buckets = 4\n'
        "emit_changes = true\n"
    )
    assert run("replay", "-c", str(cfgp)).returncode == 0
    r = run("replicate", "-c", str(cfgp), "--to", str(tmp_path / "dst"))
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["pending_epochs"] == 0 and out["applied_epochs"]

    nofeed = tmp_path / "nofeed.toml"
    nofeed.write_text(
        f'[source]\nchangelog_dir = "{log}"\n'
        f'[sink]\ntable_root = "{tmp_path / "src"}"\n'
    )
    r2 = run("replicate", "-c", str(nofeed), "--to",
             str(tmp_path / "dst2"))
    assert r2.returncode == 2
    assert "emit_changes" in r2.stderr


def test_clobber_delete_with_null_post_seq_applies_on_replica(spark, tmp_path):
    """An OCC-rebase CoW clobber emits a D whose post image is all
    NULL (the key is ABSENT from the new state, so seq is NULL too) —
    the projected delete must coalesce onto the pre-image seq, or the
    replica's LWW election keeps a row the source dropped."""
    src = _mk(spark, tmp_path, "src", n_buckets=1)
    dst = _mk(spark, tmp_path, "dst", n_buckets=1)
    src.merge(_cl(spark, [(1, "U", "r", "x", "c1", "py", "v1")]), 0)

    rival = LakehouseSink(spark, str(tmp_path / "src"), n_buckets=1,
                          emit_changes=True)
    orig = src.commit_store.put_if_absent
    fired = {"done": False}

    def racy(name, data):
        if not fired["done"] and name.startswith("manifest."):
            fired["done"] = True
            rival.merge(_cl(spark, [(5, "U", "r", "z", "c5", "py",
                                     "vz")]), 1)
        return orig(name, data)

    src.commit_store.put_if_absent = racy
    src.merge(_cl(spark, [(9, "U", "r", "x", "c9", "py", "v9")]), 2)
    src.commit_store.put_if_absent = orig
    assert fired["done"]
    # the clobber D for z rides epoch 2's feed with a NULL post seq
    d = [r for r in src.changes(2).collect() if r["path"] == "z"]
    assert len(d) == 1 and d[0]["_change"] == "D" and d[0]["seq"] is None
    cl2 = feed_to_changelog(src.changes(2))
    dz = [r for r in cl2.collect() if r["path"] == "z"]
    assert dz[0]["op"] == "D" and dz[0]["seq"] == 5  # pre-image seq
    # end-to-end: replica LIVE state converges to the clobbered source
    # (the replica holds a TOMBSTONE for z where the CoW clobber left
    # no row at all on the source — conservative: it additionally
    # guards the replica against resurrections)
    replicate(src, dst)
    live = lambda s: sorted(  # noqa: E731
        tuple(r) for r in s.read()
        .select("repo", "path", "seq", "content_sha256").collect()
    )
    assert live(dst) == live(src)
    assert dst.read().filter(F.col("path") == "z").count() == 0
    zrow = dst.read(include_tombstones=True).filter(
        F.col("path") == "z").collect()
    assert len(zrow) == 1 and zrow[0]["is_deleted"]


def test_feed_to_changelog_shape(spark, tmp_path):
    src = _mk(spark, tmp_path, "src")
    src.merge(_cl(spark, [(1, "U", "r1", "a", "c1", "py", "xx")]), 0)
    src.merge(_cl(spark, [(2, "D", "r1", "a", "c2", "py", "")]), 1)
    cl = feed_to_changelog(src.changes(1))
    rows = cl.collect()
    assert len(rows) == 1
    assert rows[0]["op"] == "D" and rows[0]["seq"] == 2
    assert "_change" not in cl.columns and "is_deleted" not in cl.columns
