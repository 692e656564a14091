"""End-to-end demo: generate a changelog → replay → verify → report.

    python examples/replay_demo.py [workdir]

Generates a 50k-event synthetic changelog (out-of-order deletes,
duplicate delivery, schema evolution, one hot repo), replays it through
the lakehouse sink, verifies every row's sha256(content) against the
single-threaded oracle, and prints the watermark/metrics tables —
the whole engine in one screen.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from atlas_spark.changelog import (
    ChangelogSpec,
    expected_state_pdf,
    generate_changelog,
    write_changelog,
)
from atlas_spark.session import get_spark
from atlas_spark.sinks import LakehouseSink
from atlas_spark.streaming import ControlTables, ReplayRunner
from atlas_spark.verification import verify_state


def main() -> int:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="atlas_demo_")
    print(f"workdir: {work}")
    spark = get_spark("replay_demo")

    spec = ChangelogSpec(
        n_events=50_000, n_repos=40, paths_per_repo=100,
        delete_frac=0.06, duplicate_frac=0.02, out_of_order_deletes=25,
        schema_evolution=True, hot_repo_frac=0.25,
    )
    changelog = generate_changelog(spec)
    log_dir = os.path.join(work, "changelog")
    write_changelog(changelog, log_dir, n_files=16)
    print(f"changelog: {len(changelog):,} events → {log_dir}")

    root = os.path.join(work, "table")
    sink = LakehouseSink(spark, root, n_buckets=16)
    sink.ensure()
    runner = ReplayRunner(spark, sink, ControlTables(root), files_per_epoch=4)
    s = runner.run(log_dir)
    print(
        f"replayed {s.rows_in:,} events in {s.epochs_applied} epochs "
        f"({s.events_per_sec:,.0f} ev/s)"
    )

    expected = expected_state_pdf(changelog)
    report = verify_state(
        sink.read(),
        spark.createDataFrame(expected[["repo", "path", "content_sha256"]]),
    )
    print(
        f"verify: expected={report.expected_rows:,} actual={report.actual_rows:,} "
        f"missing={report.missing} unexpected={report.unexpected} "
        f"hash_mismatch={report.hash_mismatch} → "
        f"{'PASS' if report.passed else 'FAIL'}"
    )

    print("\nwatermarks (last 10):")
    ControlTables(root).watermarks_df(spark).orderBy(
        "epoch_id", "partition_id"
    ).tail(10) and None
    ControlTables(root).metrics_df(spark).orderBy("epoch_id").show(
        truncate=False
    )
    spark.stop()
    return 0 if report.passed else 1


if __name__ == "__main__":
    raise SystemExit(main())
