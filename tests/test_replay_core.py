"""End-to-end: changelog replay converges to the oracle, byte-for-byte
on sha256(content) per row — the north-star invariant."""

import pandas as pd
import pytest

from atlas_spark.changelog import (
    ChangelogSpec,
    expected_state_pdf,
    generate_changelog,
    write_changelog,
)
from atlas_spark.sinks import LakehouseSink
from atlas_spark.streaming import ControlTables, ReplayRunner
from atlas_spark.verification import verify_state


def run_replay(spark, tmp_path, spec, files_per_epoch=2, n_files=8,
               n_buckets=8):
    changelog = generate_changelog(spec)
    log_dir = str(tmp_path / "changelog")
    write_changelog(changelog, log_dir, n_files=n_files)
    sink = LakehouseSink(spark, str(tmp_path / "table"), n_buckets=n_buckets)
    sink.ensure()
    control = ControlTables(str(tmp_path / "table"))
    runner = ReplayRunner(spark, sink, control, files_per_epoch=files_per_epoch)
    summary = runner.run(log_dir)
    return changelog, sink, control, runner, summary


def check_against_oracle(spark, sink, changelog):
    expected = expected_state_pdf(changelog)
    actual = sink.read()
    exp_df = spark.createDataFrame(
        expected[["repo", "path", "commit", "lang", "content_sha256", "seq"]]
    )
    report = verify_state(actual, exp_df)
    assert report.passed, report
    # commit / lang / seq of the winning event must match too
    a = actual.select("repo", "path", "commit", "lang", "seq").toPandas()
    a = a.sort_values(["repo", "path"]).reset_index(drop=True)
    e = expected[["repo", "path", "commit", "lang", "seq"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, e, check_dtype=False)
    return expected, actual


def test_verify_names_failing_keys(spark):
    """VERDICT r01 #7: at 10^8 rows you need the failing KEYS, not just
    missing=3 — verify_state(with_detail=True) returns the per-key
    relation with reasons; counts come from ONE aggregation pass."""
    actual = spark.createDataFrame(
        [("r1", "a.py", "sha_ok"), ("r1", "b.py", "sha_WRONG"),
         ("r2", "extra.py", "sha_x")],
        "repo string, path string, content_sha256 string",
    )
    expected = spark.createDataFrame(
        [("r1", "a.py", "sha_ok"), ("r1", "b.py", "sha_right"),
         ("r3", "gone.py", "sha_g")],
        "repo string, path string, content_sha256 string",
    )
    report = verify_state(actual, expected, with_detail=True)
    assert not report.passed
    assert (report.expected_rows, report.actual_rows) == (3, 3)
    assert (report.missing, report.unexpected, report.hash_mismatch) == (1, 1, 1)
    fails = {(f["repo"], f["path"]): f for f in report.sample_failures(10)}
    assert fails[("r3", "gone.py")]["reason"] == "missing"
    assert fails[("r2", "extra.py")]["reason"] == "unexpected"
    m = fails[("r1", "b.py")]
    assert m["reason"] == "hash_mismatch"
    assert m["actual_sha256"] == "sha_WRONG"
    assert m["expected_sha256"] == "sha_right"
    # sample respects the cap
    assert len(report.sample_failures(2)) == 2
    # passing report → no detail rows
    ok = verify_state(actual.limit(0), expected.limit(0), with_detail=True)
    assert ok.passed and ok.sample_failures(5) == []


def test_base_replay_matches_oracle(spark, tmp_path):
    spec = ChangelogSpec(n_events=2000, n_repos=20, paths_per_repo=40)
    changelog, sink, control, runner, summary = run_replay(spark, tmp_path, spec)
    assert summary.epochs_applied == 4
    assert summary.rows_in == 2000
    check_against_oracle(spark, sink, changelog)


def test_out_of_order_deletes_survive(spark, tmp_path):
    spec = ChangelogSpec(
        n_events=1500, n_repos=10, paths_per_repo=30,
        delete_frac=0.15, out_of_order_deletes=20,
    )
    changelog, sink, *_ = run_replay(spark, tmp_path, spec)
    # sanity: the scenario actually planted late deletes — a D row whose
    # seq is smaller than an earlier-arriving row's seq for the same key
    d = changelog.reset_index()
    planted = 0
    for key, grp in d.groupby(["repo", "path"]):
        arr = grp.sort_values("index")
        seqs = arr["seq"].to_numpy()
        ops = arr["op"].to_numpy()
        for i in range(1, len(seqs)):
            if ops[i] == "D" and (seqs[:i] > seqs[i]).any():
                planted += 1
    assert planted >= 10
    check_against_oracle(spark, sink, changelog)


def test_duplicate_delivery_idempotent(spark, tmp_path):
    spec = ChangelogSpec(
        n_events=1200, n_repos=10, paths_per_repo=30, duplicate_frac=0.05
    )
    changelog, sink, *_ = run_replay(spark, tmp_path, spec)
    check_against_oracle(spark, sink, changelog)


def test_exact_duplicate_metrics_flag(spark, tmp_path):
    """exact_duplicate_metrics=True pays one distinct-pair shuffle and
    splits true re-deliveries from superseded rows; the default lumps
    them (observability-only — final state identical either way)."""
    from atlas_spark.sinks import LakehouseSink
    from atlas_spark.streaming.runner import prepare_batch, DEFAULT_RULES

    spec = ChangelogSpec(
        n_events=800, n_repos=6, paths_per_repo=15, duplicate_frac=0.10
    )
    changelog = generate_changelog(spec)
    n_dups = int(changelog.duplicated(["repo", "path", "seq"]).sum())
    assert n_dups > 0
    df = spark.createDataFrame(changelog)

    exact = LakehouseSink(spark, str(tmp_path / "t1"), n_buckets=4,
                          exact_duplicate_metrics=True)
    exact.ensure()
    r1 = exact.merge(prepare_batch(df, DEFAULT_RULES), 0)
    assert r1["duplicates_skipped"] == n_dups

    lumped = LakehouseSink(spark, str(tmp_path / "t2"), n_buckets=4)
    lumped.ensure()
    r2 = lumped.merge(prepare_batch(df, DEFAULT_RULES), 0)
    assert r2["duplicates_skipped"] == 0
    assert (
        r2["superseded_in_batch"]
        == r1["superseded_in_batch"] + r1["duplicates_skipped"]
    )
    # same state bytes either way
    a = exact.read().select("repo", "path", "content_sha256").toPandas()
    b = lumped.read().select("repo", "path", "content_sha256").toPandas()
    key = ["repo", "path"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True))


def test_hot_key_skew_replay(spark, tmp_path):
    spec = ChangelogSpec(
        n_events=2000, n_repos=20, paths_per_repo=40, hot_repo_frac=0.30
    )
    changelog, sink, *_ = run_replay(spark, tmp_path, spec)
    assert (changelog["repo"] == "repo_000").mean() > 0.25
    check_against_oracle(spark, sink, changelog)


def test_empty_changelog(spark, tmp_path):
    spec = ChangelogSpec(n_events=0, n_repos=1, paths_per_repo=1)
    with pytest.raises(Exception):
        # zero events: generator yields empty frame; replay of an empty
        # dir is a no-op — exercise the empty-table read path instead
        generate_changelog(spec).iloc[0]
    sink = LakehouseSink(spark, str(tmp_path / "table"), n_buckets=4)
    sink.ensure()
    assert sink.read().count() == 0
    assert sink.last_committed_epoch() == -1
