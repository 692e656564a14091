"""Change-data-feed hardening (round 7).

* ADVICE r06 (medium): the emitted feed must diff against the
  COMMITTED version's parent, so an OCC rebase onto a concurrent
  committer's manifest cannot make the feed diverge from diff(v-1, v).
* VERDICT r06 #3: a crash in the commit→emit window loses only the
  feed file — a resumed replay (and a direct changes() read) must
  detect and regenerate the gap.
* VERDICT r06 #5: MoR's change feed IS diff() (emit is rejected by
  design) — over the same changelog it must equal the CoW emitted
  feed row-for-row.
* ADVICE r06 (low): vacuum retention for ``_changes/`` feed dirs.
"""

import os

import pytest

from atlas_spark.changelog import (
    ChangelogSpec, generate_changelog, write_changelog,
)
from atlas_spark.sinks import LakehouseSink
from atlas_spark.streaming import ReplayRunner

from tests.test_sink_unit import _df

PRE_COLS = ["_pre_content_sha256", "_pre_seq"]


def _feed_rows(sink, epoch_id):
    return sorted(
        tuple(r) for r in sink.changes(epoch_id).drop(*PRE_COLS).collect()
    )


def _diff_rows(sink, version):
    return sorted(
        tuple(r) for r in sink.diff(version - 1, version).collect()
    )


def test_emitted_cdf_matches_diff_under_occ_rebase(spark, tmp_path):
    """ADVICE r06: a concurrent committer lands a DIFFERENT epoch into
    the same bucket between this merge's manifest read and its publish;
    the rebased commit's feed must still equal diff(v-1, v) — i.e. the
    pre-state must be the actually-committed parent, not the
    merge-start snapshot."""
    root = str(tmp_path / "t")
    a = LakehouseSink(spark, root, n_buckets=1, emit_changes=True)
    a.ensure()
    a.merge(_df(spark, [[1, "I", "r", "x", "c1", "py", "v1"],
                        [1, "I", "r", "y", "c1", "py", "w1"]]), 0)

    b = LakehouseSink(spark, root, n_buckets=1, emit_changes=True)
    orig = a.commit_store.put_if_absent
    fired = {"done": False}

    def racy(name, data):
        if not fired["done"] and name.startswith("manifest."):
            fired["done"] = True
            # rival commits epoch 1 (new key, same bucket) first
            b.merge(_df(spark, [[5, "I", "r", "z", "c5", "py", "vz"]]), 1)
        return orig(name, data)

    a.commit_store.put_if_absent = racy
    m = a.merge(_df(spark, [[9, "U", "r", "x", "c9", "py", "v9"]]), 2)
    assert fired["done"] and m["skipped"] is False
    v = m["version"]
    # the rebase happened: A's commit sits on top of B's
    assert v == a.manifest()["version"]
    assert a.manifest(v - 1)["epoch_id"] == 1
    emitted = _feed_rows(a, 2)
    assert emitted == _diff_rows(a, v)
    # the CoW replace clobbers the rival's key (single-logical-writer
    # ingest contract) — the feed must SAY so, not hide it
    assert ("D",) == tuple(
        r[0] for r in emitted if r[2] == "z"
    ) and len(emitted) == 2


def test_crash_between_commit_and_emit_backfilled_on_resume(spark, tmp_path):
    """VERDICT r06 #3 kill-window rehearsal: the emit runs post-commit,
    so a kill between them leaves a committed epoch with no feed.  A
    resumed replay must backfill the gap; every epoch's feed then
    equals diff(v-1, v)."""
    cl = generate_changelog(ChangelogSpec(
        n_events=400, n_repos=4, paths_per_repo=8, delete_frac=0.1,
    ))
    log = str(tmp_path / "log")
    write_changelog(cl, log, n_files=6)
    root = str(tmp_path / "t")
    sink = LakehouseSink(spark, root, n_buckets=4, emit_changes=True)
    sink.ensure()

    class Kill(RuntimeError):
        pass

    orig = sink._emit_epoch_changes

    def crashing(old_files, new_files, fields, epoch_id, sess):
        if epoch_id == 1:
            # the commit for epoch 1 is already durable at this point
            raise Kill("killed between commit and emit")
        return orig(old_files, new_files, fields, epoch_id, sess)

    sink._emit_epoch_changes = crashing
    with pytest.raises(Kill):
        ReplayRunner(spark, sink, files_per_epoch=2).run(log)
    assert sink.last_committed_epoch() == 1
    assert not os.path.exists(
        os.path.join(root, "_changes/epoch=000001/_SUCCESS")
    )

    # fresh process analog: new sink + runner over the same root
    sink2 = LakehouseSink(spark, root, n_buckets=4, emit_changes=True)
    s = ReplayRunner(spark, sink2, files_per_epoch=2).run(log)
    assert s.epochs_skipped == 2  # epochs 0,1 fenced — exactly-once held
    head = sink2.manifest()["version"]
    checked = 0
    for v in range(1, head + 1):
        mv = sink2.manifest(v)
        ep = mv["epoch_id"]
        if ep < 0 or mv.get("compaction"):
            continue
        assert os.path.exists(
            os.path.join(root, f"_changes/epoch={ep:06d}/_SUCCESS")
        ), f"feed missing for epoch {ep}"
        assert _feed_rows(sink2, ep) == _diff_rows(sink2, v), f"epoch {ep}"
        checked += 1
    assert checked >= 3


def test_changes_read_repairs_missing_feed(spark, tmp_path):
    """changes() on a committed epoch whose feed dir was lost
    regenerates it durably (read-repair); an epoch no merge ever
    committed raises FileNotFoundError."""
    import shutil

    root = str(tmp_path / "t")
    sink = LakehouseSink(spark, root, n_buckets=2, emit_changes=True)
    sink.ensure()
    sink.merge(_df(spark, [[1, "I", "r", "a", "c1", "py", "v1"]]), 0)
    sink.merge(_df(spark, [[2, "U", "r", "a", "c2", "py", "v2"],
                           [3, "I", "r", "b", "c3", "py", "v3"]]), 1)
    want = _feed_rows(sink, 1)
    feed_dir = os.path.join(root, "_changes/epoch=000001")
    shutil.rmtree(feed_dir)
    assert _feed_rows(sink, 1) == want  # regenerated transparently
    assert os.path.exists(os.path.join(feed_dir, "_SUCCESS"))  # durably
    with pytest.raises(FileNotFoundError):
        sink.changes(99)


def test_mor_diff_equals_cow_emitted_feed(spark, tmp_path):
    """VERDICT r06 #5: MoR+emit is rejected at construction and its
    change feed IS diff() — replaying the same changelog through both
    modes, MoR's per-version diff (newest-version-wins resolution in
    play) must equal the CoW emitted feed row-for-row."""
    cl = generate_changelog(ChangelogSpec(
        n_events=600, n_repos=5, paths_per_repo=8, delete_frac=0.12,
        duplicate_frac=0.05, out_of_order_deletes=2,
    ))
    log = str(tmp_path / "log")
    write_changelog(cl, log, n_files=8)

    cow = LakehouseSink(spark, str(tmp_path / "cow"), n_buckets=4,
                        emit_changes=True)
    cow.ensure()
    ReplayRunner(spark, cow, files_per_epoch=2).run(log)
    mor = LakehouseSink(spark, str(tmp_path / "mor"), n_buckets=4,
                        mode="mor")
    mor.ensure()
    ReplayRunner(spark, mor, files_per_epoch=2).run(log)

    head = mor.manifest()["version"]
    compared = 0
    for v in range(1, head + 1):
        mv = mor.manifest(v)
        ep = mv["epoch_id"]
        if ep < 0 or mv.get("compaction"):
            continue
        # MoR buckets genuinely accumulate versions → the diff's reads
        # exercise the resolution window, not plain scans
        assert _diff_rows(mor, v) == _feed_rows(cow, ep), f"epoch {ep}"
        compared += 1
    assert compared >= 3
    assert any(
        len(fl) > 1 for fl in mor.manifest()["files"].values()
    ), "test shape too small — no multi-version MoR bucket"


def test_vacuum_retain_changes_prunes_old_feeds(spark, tmp_path):
    """ADVICE r06: emitted feeds otherwise grow without bound — vacuum
    keeps the newest N epoch dirs, age-gates in-flight ones."""
    root = str(tmp_path / "t")
    sink = LakehouseSink(spark, root, n_buckets=2, emit_changes=True)
    sink.ensure()
    for e in range(4):
        sink.merge(
            _df(spark, [[e + 1, "U", "r", "a", f"c{e}", "py", f"v{e}"]]), e
        )
    feeds = lambda: sorted(  # noqa: E731
        e for e in os.listdir(os.path.join(root, "_changes"))
        if e.startswith("epoch=")
    )
    assert len(feeds()) == 4
    # young feeds are protected by the in-flight guard
    out = sink.vacuum(retain_changes=1)  # default 1 h min age
    assert out["changes_pruned"] == 0 and len(feeds()) == 4
    # retention larger than the epoch count keeps EVERYTHING (the
    # unclamped negative slice used to delete the oldest feeds)
    out = sink.vacuum(retain_changes=9, min_age_seconds=0)
    assert out["changes_pruned"] == 0 and len(feeds()) == 4
    out = sink.vacuum(retain_changes=2, min_age_seconds=0)
    assert out["changes_pruned"] == 2
    assert feeds() == ["epoch=000002", "epoch=000003"]
    # retained feeds still read fine; vacuum is idempotent
    assert len(_feed_rows(sink, 3)) == 1
    assert sink.vacuum(retain_changes=2,
                       min_age_seconds=0)["changes_pruned"] == 0
    # a deliberately pruned feed is REFUSED, not resurrected from
    # snapshots (that would silently undo the retention), and the
    # resume-path sweep honors the same boundary
    with pytest.raises(FileNotFoundError, match="pruned"):
        sink.changes(0)
    assert sink.backfill_changes() == []
    assert feeds() == ["epoch=000002", "epoch=000003"]


def test_feed_prune_stops_at_inflight_epoch(spark, tmp_path):
    """The prune walks oldest-first and STOPS at the first in-flight
    (young) feed: the retention marker must never cover an epoch that
    was not actually deleted — a skipped young feed that then crashes
    before `_SUCCESS` must stay repairable, not be refused as
    vacuumed."""
    root = str(tmp_path / "t")
    sink = LakehouseSink(spark, root, n_buckets=2, emit_changes=True)
    sink.ensure()
    for e in range(3):
        sink.merge(
            _df(spark, [[e + 1, "U", "r", "a", f"c{e}", "py", f"v{e}"]]), e
        )
    # age epochs 1..2, keep epoch 0 "in-flight" (fresh mtimes)
    import time as _t
    nowt = _t.time()
    for e in (1, 2):
        d = os.path.join(root, f"_changes/epoch={e:06d}")
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (nowt - 7200, nowt - 7200))
    d0 = os.path.join(root, "_changes/epoch=000000")
    for f in os.listdir(d0):
        os.utime(os.path.join(d0, f), (nowt, nowt))
    out = sink.vacuum(retain_changes=1, min_age_seconds=3600)
    # epoch 0 is young -> the walk stops there; epoch 1 survives too
    assert out["changes_pruned"] == 0
    assert sink._changes_retention() == -1
    assert len(_feed_rows(sink, 0)) >= 1  # still readable, not refused


def test_feed_prune_via_store_plane_matches_driver(spark, tmp_path):
    """The feed prune must ride the object-store data plane under
    ``listing="store"`` (an os.listdir would silently no-op on a real
    object store): same surviving epoch dirs as the FS path, and the
    retention boundary is recorded so pruned epochs stay refused."""
    import functools
    import shutil as _sh

    from atlas_spark.sinks.commit_store import DirS3Client, S3DataPlane

    a_root, c_root = str(tmp_path / "a"), str(tmp_path / "c")
    a = LakehouseSink(spark, a_root, n_buckets=2, emit_changes=True)
    a.ensure()
    for e in range(4):
        a.merge(
            _df(spark, [[e + 1, "U", "r", "x", f"c{e}", "py", f"v{e}"]]), e
        )
    _sh.copytree(a_root, c_root)
    plane = S3DataPlane(
        "bucket", "",
        client_factory=functools.partial(DirS3Client, c_root, 3),
    )
    c = LakehouseSink(spark, c_root, n_buckets=2, emit_changes=True,
                      data_plane=plane)
    ra = a.vacuum(retain_changes=2, min_age_seconds=0, listing="driver")
    rc = c.vacuum(retain_changes=2, min_age_seconds=0, listing="store")
    assert ra["changes_pruned"] == rc["changes_pruned"] == 2

    def eps(root):
        return sorted(
            e for e in os.listdir(os.path.join(root, "_changes"))
            if e.startswith("epoch=")
        )

    assert eps(a_root) == eps(c_root) == ["epoch=000002", "epoch=000003"]
    for s in (a, c):
        with pytest.raises(FileNotFoundError, match="pruned"):
            s.changes(1)
        assert s.backfill_changes() == []


def test_backfill_skips_unregenerable_epoch_above_retention(spark, tmp_path):
    """A feed lost ABOVE the retention boundary whose parent manifest
    was pruned by retain_versions cannot be regenerated by design —
    backfill must skip it (retention artifact) instead of crashing the
    resume path, and changes() reports it unrecoverable."""
    import shutil as _sh

    root = str(tmp_path / "t")
    sink = LakehouseSink(spark, root, n_buckets=2, emit_changes=True)
    sink.ensure()
    for e in range(3):
        sink.merge(
            _df(spark, [[e + 1, "U", "r", "y", f"c{e}", "py", f"v{e}"]]), e
        )
    # prune manifests only (no feed retention marker), then lose the
    # oldest feed out-of-band
    sink.vacuum(retain_versions=1, min_age_seconds=0)
    _sh.rmtree(os.path.join(root, "_changes/epoch=000000"))
    assert sink.backfill_changes() == []  # skip, not crash
    with pytest.raises(FileNotFoundError):
        sink.changes(0)
    # the newest feed still reads
    assert len(_feed_rows(sink, 2)) == 1
