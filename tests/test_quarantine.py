"""Dead-letter quarantine (W3), dry-run (W6), graceful stop (O5)."""

import pandas as pd

from atlas_spark.changelog import ChangelogSpec, generate_changelog, write_changelog
from atlas_spark.sinks import LakehouseSink
from atlas_spark.streaming import ControlTables, ReplayRunner


def _setup(spark, tmp_path, corrupt=False, **runner_kw):
    spec = ChangelogSpec(n_events=600, n_repos=5, paths_per_repo=10)
    changelog = generate_changelog(spec)
    if corrupt:
        # poison some rows: null key, bogus op
        changelog.loc[10, "repo"] = None
        changelog.loc[20, "op"] = "X"
        changelog.loc[30, "path"] = None
    log_dir = str(tmp_path / "changelog")
    write_changelog(changelog, log_dir, n_files=4)
    root = str(tmp_path / "table")
    sink = LakehouseSink(spark, root, n_buckets=4)
    sink.ensure()
    runner = ReplayRunner(
        spark, sink, ControlTables(root), files_per_epoch=2, **runner_kw
    )
    return changelog, log_dir, sink, runner


def test_quarantine_diverts_bad_rows(spark, tmp_path):
    rejects_dir = str(tmp_path / "rejects")
    changelog, log_dir, sink, runner = _setup(
        spark, tmp_path, corrupt=True,
        quarantine=True, rejects_dir=rejects_dir,
    )
    s = runner.run(log_dir)
    assert s.rejects == 3
    assert s.rows_in == 597  # merged rows exclude the poisoned ones
    rej = spark.read.parquet(rejects_dir)
    assert rej.count() == 3
    assert "_epoch_id" in rej.columns
    # good rows all landed
    good = changelog.drop(index=[10, 20, 30])
    from atlas_spark.changelog.oracle import expected_state_pdf
    expected = expected_state_pdf(good)
    assert sink.read().count() == len(expected)


def test_null_op_row_is_quarantined_not_silently_dropped(spark, tmp_path):
    """ADVICE r01 (high): op=NULL makes the raw validity conjunction
    evaluate to SQL NULL — without coalesce(..., false) the row escapes
    BOTH filter(valid) and filter(~valid): never merged, never
    dead-lettered, rejects undercounted.  It must land in quarantine."""
    spec = ChangelogSpec(n_events=200, n_repos=3, paths_per_repo=5)
    changelog = generate_changelog(spec)
    changelog.loc[7, "op"] = None           # three-valued-logic trap
    changelog["seq"] = changelog["seq"].astype("Int64")  # keep parquet int64
    changelog.loc[11, "seq"] = pd.NA        # null seq, same trap
    log_dir = str(tmp_path / "changelog")
    write_changelog(changelog, log_dir, n_files=2)
    root = str(tmp_path / "table")
    sink = LakehouseSink(spark, root, n_buckets=4)
    sink.ensure()
    rejects_dir = str(tmp_path / "rejects")
    runner = ReplayRunner(
        spark, sink, ControlTables(root), files_per_epoch=2,
        quarantine=True, rejects_dir=rejects_dir,
    )
    s = runner.run(log_dir)
    assert s.rejects == 2
    assert s.rows_in == 198
    rej = spark.read.parquet(rejects_dir)
    assert rej.count() == 2
    # dead-letter rows carry the failure taxonomy (BulkInsertFailure
    # error-detail analog)
    reasons = {r["_reason"] for r in rej.select("_reason").collect()}
    assert reasons == {"bad_op", "null_seq"}
    # and the table state matches the fold over the 198 good rows
    from atlas_spark.changelog.oracle import expected_state_pdf
    good = changelog.drop(index=[7, 11])
    assert sink.read().count() == len(expected_state_pdf(good))


def test_quarantine_adds_no_extra_job_when_clean(spark, tmp_path):
    """The reject count rides the merge pass via df.observe — an
    all-good epoch must cost the same number of Spark jobs with
    quarantine on as off (VERDICT r01 #8)."""

    def run_and_count_jobs(subdir, **kw):
        spec = ChangelogSpec(n_events=300, n_repos=4, paths_per_repo=6)
        changelog = generate_changelog(spec)
        log_dir = str(tmp_path / subdir / "changelog")
        write_changelog(changelog, log_dir, n_files=2)
        root = str(tmp_path / subdir / "table")
        sink = LakehouseSink(spark, root, n_buckets=4)
        sink.ensure()
        runner = ReplayRunner(
            spark, sink, ControlTables(root), files_per_epoch=2, **kw
        )
        tracker = spark.sparkContext.statusTracker()
        before = set(tracker.getJobIdsForGroup(None) or [])
        runner.run(log_dir)
        after = set(tracker.getJobIdsForGroup(None) or [])
        return len(after - before)

    n_off = run_and_count_jobs("off", quarantine=False)
    n_on = run_and_count_jobs(
        "on", quarantine=True, rejects_dir=str(tmp_path / "on" / "rej")
    )
    assert n_on == n_off


def test_dry_run_commits_nothing(spark, tmp_path):
    _, log_dir, sink, runner = _setup(spark, tmp_path, dry_run=True)
    s = runner.run(log_dir)
    assert s.rows_in == 600            # compute happened
    assert sink.last_committed_epoch() == -1
    assert sink.read().count() == 0
    assert sink.manifest()["version"] == 0


def test_graceful_stop_between_epochs(spark, tmp_path):
    _, log_dir, sink, runner = _setup(spark, tmp_path)
    calls = {"n": 0}

    def stop_after_first():
        calls["n"] += 1
        return calls["n"] > 1  # allow epoch 0, stop before epoch 1

    s = runner.run(log_dir, should_stop=stop_after_first)
    assert s.interrupted is True
    assert s.epochs_applied == 1
    assert sink.last_committed_epoch() == 0
    # resume completes cleanly
    s2 = runner.run(log_dir)
    assert s2.epochs_applied == 1 and s2.epochs_skipped == 1
