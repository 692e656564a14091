"""Long incremental stream: many epochs (the daily-sync shape),
periodic compaction, file-growth bounds, convergence."""

import os

from pyspark.sql import functions as F

from atlas_spark.changelog import ChangelogSpec, generate_changelog, write_changelog
from atlas_spark.sinks import LakehouseSink
from atlas_spark.streaming import ControlTables, ReplayRunner

from tests.test_replay_core import check_against_oracle


def test_eight_epoch_stream_with_compaction(spark, tmp_path):
    spec = ChangelogSpec(
        n_events=2000, n_repos=10, paths_per_repo=20,
        delete_frac=0.10, duplicate_frac=0.02, out_of_order_deletes=10,
    )
    changelog = generate_changelog(spec)
    log_dir = str(tmp_path / "log")
    write_changelog(changelog, log_dir, n_files=12)

    root = str(tmp_path / "t")
    sink = LakehouseSink(spark, root, n_buckets=8)
    sink.ensure()
    runner = ReplayRunner(
        spark, sink, ControlTables(root), files_per_epoch=2, compact_every=3
    )
    s = runner.run(log_dir)
    assert s.epochs_applied == 6
    check_against_oracle(spark, sink, changelog)

    # compaction bounds file growth: without it, each of 8 epochs would
    # add ~1 file per touched bucket; the last compaction at epoch 6
    # leaves ≤ (1 compacted + epochs-since) files per bucket
    m = sink.manifest()
    worst = max(len(fl) for fl in m["files"].values())
    assert worst <= 2, m["files"]
    # mid-stream compaction must KEEP tombstones (a late smaller-seq
    # upsert still has to lose to them); the end-of-replay compaction
    # drops them explicitly
    assert sink.read(include_tombstones=True).count() >= sink.read().count()
    sink.compact(drop_tombstones=True)
    assert sink.read(include_tombstones=True).count() == sink.read().count()


def test_incremental_new_data_after_convergence(spark, tmp_path):
    """Daily-sync shape: converge, then new events arrive; only new
    epochs apply, watermarks advance monotonically."""
    spec = ChangelogSpec(n_events=1200, n_repos=8, paths_per_repo=15)
    changelog = generate_changelog(spec)
    half = len(changelog) // 2
    log_dir = str(tmp_path / "log")
    write_changelog(changelog.iloc[:half], log_dir, n_files=4)

    root = str(tmp_path / "t")
    sink = LakehouseSink(spark, root, n_buckets=8)
    sink.ensure()
    runner = ReplayRunner(spark, sink, ControlTables(root), files_per_epoch=2)
    runner.run(log_dir)
    wm1 = sink.watermarks()

    # day 2: second half lands as new files (names sort later)
    for i, lo in enumerate(range(half, len(changelog), (len(changelog) - half) // 4 + 1)):
        chunk = changelog.iloc[lo : lo + (len(changelog) - half) // 4 + 1]
        chunk.to_parquet(os.path.join(log_dir, f"day2-{i:05d}.parquet"), index=False)

    runner2 = ReplayRunner(spark, sink, ControlTables(root), files_per_epoch=2)
    s2 = runner2.run(log_dir)
    assert s2.epochs_skipped >= 2  # day-1 epochs fenced
    check_against_oracle(spark, sink, changelog)
    wm2 = sink.watermarks()
    for b, v in wm1.items():
        assert wm2.get(b, v) >= v  # monotone watermarks
