"""Kill-between-epochs + restart → byte-identical final state, no
double-apply (exactly-once via the manifest epoch fence)."""

from atlas_spark.changelog import ChangelogSpec, generate_changelog, write_changelog
from atlas_spark.sinks import LakehouseSink
from atlas_spark.streaming import ControlTables, ReplayRunner

from tests.test_replay_core import check_against_oracle


def test_kill_and_resume_converges(spark, tmp_path):
    spec = ChangelogSpec(
        n_events=1600, n_repos=12, paths_per_repo=30,
        delete_frac=0.10, out_of_order_deletes=10, duplicate_frac=0.02,
    )
    changelog = generate_changelog(spec)
    log_dir = str(tmp_path / "changelog")
    write_changelog(changelog, log_dir, n_files=8)

    root = str(tmp_path / "table")
    sink = LakehouseSink(spark, root, n_buckets=8)
    sink.ensure()
    control = ControlTables(root)
    runner = ReplayRunner(spark, sink, control, files_per_epoch=2)

    # first run: killed after 2 of 4 epochs
    s1 = runner.run(log_dir, stop_after_epochs=2)
    assert s1.epochs_applied == 2
    assert sink.last_committed_epoch() == 1

    # restart with FRESH objects (nothing in memory survives the kill)
    sink2 = LakehouseSink(spark, root, n_buckets=8)
    control2 = ControlTables(root)
    runner2 = ReplayRunner(spark, sink2, control2, files_per_epoch=2)
    s2 = runner2.run(log_dir)
    assert s2.epochs_skipped == 2
    assert s2.epochs_applied == 2
    check_against_oracle(spark, sink2, changelog)

    # third run: everything fenced, nothing reapplied, state unchanged
    v_before = sink2.manifest()["version"]
    s3 = ReplayRunner(spark, sink2, control2, files_per_epoch=2).run(log_dir)
    assert s3.epochs_applied == 0 and s3.epochs_skipped == 4
    assert sink2.manifest()["version"] == v_before
    check_against_oracle(spark, sink2, changelog)


def test_redelivered_epoch_is_fenced(spark, tmp_path):
    """Directly re-merge an already-committed epoch → skipped no-op
    (foreachBatch redelivery after crash-before-checkpoint)."""
    spec = ChangelogSpec(n_events=500, n_repos=5, paths_per_repo=10)
    changelog = generate_changelog(spec)
    log_dir = str(tmp_path / "changelog")
    write_changelog(changelog, log_dir, n_files=2)

    root = str(tmp_path / "table")
    sink = LakehouseSink(spark, root, n_buckets=4)
    sink.ensure()
    runner = ReplayRunner(spark, sink, files_per_epoch=2)
    runner.run(log_dir)
    v = sink.manifest()["version"]

    df = spark.read.parquet(log_dir)
    from atlas_spark.streaming.runner import prepare_batch
    res = sink.merge(prepare_batch(df, runner.rules), epoch_id=0)
    assert res["skipped"] is True
    assert sink.manifest()["version"] == v


def test_interrupted_epoch_marked_on_resume(spark, tmp_path):
    spec = ChangelogSpec(n_events=400, n_repos=4, paths_per_repo=8)
    changelog = generate_changelog(spec)
    log_dir = str(tmp_path / "changelog")
    write_changelog(changelog, log_dir, n_files=4)

    root = str(tmp_path / "table")
    sink = LakehouseSink(spark, root, n_buckets=4)
    sink.ensure()
    control = ControlTables(root)
    # simulate crash mid-epoch: started but never completed
    control.mark_started(7)
    runner = ReplayRunner(spark, sink, control, files_per_epoch=2)
    s = runner.run(log_dir)
    assert 7 in s.interrupted_recovered
    wm = control.watermarks_df(spark)
    statuses = {
        r["epoch_id"]: r["status"]
        for r in wm.select("epoch_id", "status").distinct().collect()
    }
    assert statuses[7] == "interrupted"
    assert statuses[0] == "completed"


def test_crash_between_commit_and_control_write_backfills(spark, tmp_path):
    """Data commit precedes control writes; a crash in between leaves a
    fenced epoch with no watermark row — resume must backfill it as
    `recovered` (SURVEY §7.3 hard part #1)."""
    import os

    spec = ChangelogSpec(n_events=400, n_repos=4, paths_per_repo=8)
    changelog = generate_changelog(spec)
    log_dir = str(tmp_path / "changelog")
    write_changelog(changelog, log_dir, n_files=4)

    root = str(tmp_path / "table")
    sink = LakehouseSink(spark, root, n_buckets=4)
    sink.ensure()
    control = ControlTables(root)
    runner = ReplayRunner(spark, sink, control, files_per_epoch=2)
    runner.run(log_dir)
    # simulate the crash: epoch 1's control file never got written
    os.remove(control._wm_path(1))
    os.remove(control._metric_path(1))

    control2 = ControlTables(root)
    runner2 = ReplayRunner(spark, sink, control2, files_per_epoch=2)
    runner2.run(log_dir)
    wm = control2.watermarks_df(spark)
    statuses = {
        r["epoch_id"]: r["status"]
        for r in wm.select("epoch_id", "status").distinct().collect()
    }
    assert statuses[1] == "recovered"
    assert statuses[0] == "completed"


def test_plan_recorded_before_commit_covers_crash_window(spark, tmp_path):
    """ADVICE r01: the epoch→files plan must be appended BEFORE the sink
    commit, so a crash inside the commit can't leave a committed epoch
    invisible to the resume re-slicing guard — and re-recording the same
    epoch on resume must be idempotent (no duplicate lines)."""
    import json
    import os

    import pytest

    spec = ChangelogSpec(n_events=600, n_repos=5, paths_per_repo=10)
    changelog = generate_changelog(spec)
    log_dir = str(tmp_path / "changelog")
    write_changelog(changelog, log_dir, n_files=6)

    root = str(tmp_path / "table")
    sink = LakehouseSink(spark, root, n_buckets=4)
    sink.ensure()
    runner = ReplayRunner(spark, sink, ControlTables(root), files_per_epoch=2)

    orig_merge = sink.merge

    def crash_on_epoch_2(batch, epoch_id, **kw):
        if epoch_id == 2:
            raise RuntimeError("simulated crash mid-commit")
        return orig_merge(batch, epoch_id, **kw)

    sink.merge = crash_on_epoch_2
    with pytest.raises(RuntimeError, match="simulated crash"):
        runner.run(log_dir)
    sink.merge = orig_merge

    plan_path = os.path.join(root, "_control", "epoch_plan.jsonl")
    with open(plan_path) as f:
        entries = [json.loads(x) for x in f]
    # epoch 2's plan was recorded even though its commit crashed
    assert {e["epoch_id"] for e in entries} == {0, 1, 2}

    # resume with fresh objects: completes, and the re-record of epoch 2
    # (identical files) is skipped — exactly one line per epoch
    sink2 = LakehouseSink(spark, root, n_buckets=4)
    runner2 = ReplayRunner(spark, sink2, ControlTables(root), files_per_epoch=2)
    runner2.run(log_dir)
    with open(plan_path) as f:
        entries = [json.loads(x) for x in f]
    assert sorted(e["epoch_id"] for e in entries) == [0, 1, 2]
    check_against_oracle(spark, sink2, changelog)


def test_resume_with_changed_epoch_plan_refuses(spark, tmp_path):
    """Fencing is by ordinal epoch id: resuming with a different
    files_per_epoch would silently skip unapplied files — must raise."""
    import pytest

    spec = ChangelogSpec(n_events=400, n_repos=4, paths_per_repo=8)
    changelog = generate_changelog(spec)
    log_dir = str(tmp_path / "changelog")
    write_changelog(changelog, log_dir, n_files=8)

    root = str(tmp_path / "table")
    sink = LakehouseSink(spark, root, n_buckets=4)
    sink.ensure()
    ReplayRunner(spark, sink, files_per_epoch=2).run(
        log_dir, stop_after_epochs=2
    )

    bad = ReplayRunner(spark, sink, files_per_epoch=4)  # changed!
    with pytest.raises(ValueError, match="epoch plan mismatch"):
        bad.run(log_dir)

    # original plan resumes fine; late-appended files extend the plan
    ok = ReplayRunner(spark, sink, files_per_epoch=2)
    s = ok.run(log_dir)
    assert s.epochs_applied == 2 and s.epochs_skipped == 2
    check_against_oracle(spark, sink, changelog)


def test_fingerprint_not_rerecorded_until_plan_guard_passes(spark, tmp_path):
    """ADVICE r03 (cli): accepting a new stream identity must not
    record it before the epoch-plan guard — an aborted run would leave
    the table pointing at a changelog it never applied, making a retry
    against the ORIGINAL changelog spuriously mismatch."""
    spec = ChangelogSpec(n_events=200, n_repos=4, paths_per_repo=8)
    changelog = generate_changelog(spec)
    log_dir = str(tmp_path / "changelog")
    write_changelog(changelog, log_dir, n_files=4)

    root = str(tmp_path / "table")
    sink = LakehouseSink(spark, root, n_buckets=4)
    sink.ensure()
    ReplayRunner(spark, sink, files_per_epoch=2).run(log_dir)
    original_fp = ReplayRunner(spark, sink).recorded_fingerprint()
    assert original_fp is not None

    # a "rotated" changelog with a different epoch plan (4 files per
    # epoch) AND different first-epoch identity
    log2 = str(tmp_path / "changelog2")
    write_changelog(generate_changelog(
        ChangelogSpec(n_events=200, n_repos=4, paths_per_repo=8, seed=99)
    ), log2, n_files=4)

    bad = ReplayRunner(spark, sink, files_per_epoch=4)
    bad.accept_new_fingerprint = True    # what cmd_replay --yes sets
    import pytest as _pytest
    with _pytest.raises(ValueError, match="epoch plan mismatch"):
        bad.run(log2)
    # the abort must NOT have re-recorded the identity
    assert ReplayRunner(spark, sink).recorded_fingerprint() == original_fp

    # a retry against the ORIGINAL changelog works without --yes
    ok = ReplayRunner(spark, sink, files_per_epoch=2)
    s = ok.run(log_dir)
    assert s.epochs_applied == 0 and s.epochs_skipped == 2

    # and an accepted run whose guard PASSES does re-record: same file
    # slicing, different content fingerprint (fresh table dir)
    root2 = str(tmp_path / "table2")
    sink2 = LakehouseSink(spark, root2, n_buckets=4)
    sink2.ensure()
    ReplayRunner(spark, sink2, files_per_epoch=2).run(log_dir)
    acc = ReplayRunner(spark, sink2, files_per_epoch=2)
    acc.accept_new_fingerprint = True
    acc.run(log2)
    assert (
        ReplayRunner(spark, sink2).recorded_fingerprint()
        == acc.changelog_fingerprint(log2)
    )
