"""Schema evolution mid-stream: column add (lines:int), type widen
(int→bigint), key rename (author→committer) — final state must match
the oracle including evolved columns, and the sha256 invariant must be
computed on the content string, never the evolved payload."""

import json

import pandas as pd

from atlas_spark.changelog import (
    ChangelogSpec,
    expected_state_pdf,
    generate_changelog,
    write_changelog,
)
from atlas_spark.sinks import LakehouseSink
from atlas_spark.streaming import ControlTables, ReplayRunner

from tests.test_replay_core import check_against_oracle


def test_schema_evolution_replay(spark, tmp_path):
    spec = ChangelogSpec(
        n_events=2000, n_repos=15, paths_per_repo=30,
        schema_evolution=True, delete_frac=0.05,
    )
    changelog = generate_changelog(spec)
    # sanity on the corpus itself
    p_first = json.loads(changelog.iloc[0]["payload"])
    p_last = json.loads(changelog.iloc[-1]["payload"])
    assert "lines" not in p_first and "author" in p_first
    assert "committer" in p_last and p_last["lines"] > 2**31

    log_dir = str(tmp_path / "changelog")
    write_changelog(changelog, log_dir, n_files=10)
    root = str(tmp_path / "table")
    sink = LakehouseSink(spark, root, n_buckets=8)
    sink.ensure()
    runner = ReplayRunner(spark, sink, ControlTables(root), files_per_epoch=2)
    runner.run(log_dir)

    expected, actual = check_against_oracle(spark, sink, changelog)

    # evolved columns present and equal to oracle normalization
    a = (
        actual.select("repo", "path", "lines", "committer")
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    e = expected[["repo", "path", "lines", "committer"]].reset_index(drop=True)
    a["lines"] = a["lines"].astype("Int64")
    pd.testing.assert_frame_equal(a, e, check_dtype=False)

    # storage-side evolution: manifest schema gained the columns only
    # after they appeared in the data; early epochs' manifests lack them
    manifests = sink.manifest()
    names = [n for n, _ in (tuple(x) for x in manifests["schema"])]
    assert "lines" in names and "committer" in names
    assert dict(tuple(x) for x in manifests["schema"])["lines"] == "bigint"


def test_column_appears_only_when_data_has_it(spark, tmp_path):
    """Early epochs (payload without `lines`) must not add the column;
    the manifest schema evolves at the epoch where data first carries it."""
    spec = ChangelogSpec(
        n_events=1200, n_repos=8, paths_per_repo=20, schema_evolution=True
    )
    changelog = generate_changelog(spec)
    log_dir = str(tmp_path / "changelog")
    write_changelog(changelog, log_dir, n_files=10)
    root = str(tmp_path / "table")
    sink = LakehouseSink(spark, root, n_buckets=4)
    sink.ensure()
    runner = ReplayRunner(spark, sink, files_per_epoch=2)

    epochs = runner.plan_epochs(log_dir)
    # apply only the first epoch (events before the 40% add point)
    df = spark.read.parquet(*epochs[0])
    from atlas_spark.streaming.runner import prepare_batch
    sink.merge(prepare_batch(df, runner.rules), 0)
    names0 = [n for n, _ in (tuple(x) for x in sink.manifest()["schema"])]
    assert "lines" not in names0
    assert "committer" in names0  # author existed from the start → renamed col

    # apply the rest; schema must now include lines
    runner2 = ReplayRunner(spark, sink, files_per_epoch=2)
    runner2.run(log_dir)
    names = [n for n, _ in (tuple(x) for x in sink.manifest()["schema"])]
    assert "lines" in names
    check_against_oracle(spark, sink, changelog)
