"""applyInPandasWithState: per-repo running CDC progress across
micro-batches, state persisted in the streaming state store."""

import os

from pyspark.sql import functions as F

from atlas_spark.changelog import ChangelogSpec, generate_changelog, write_changelog
from atlas_spark.streaming.runner import CHANGELOG_DDL
from atlas_spark.streaming.stateful import track_repo_progress


def _run(spark, log_dir, cp):
    acc = []

    def sink(df, eid):
        acc.append(df.collect())

    q = (
        track_repo_progress(
            spark.readStream.schema(CHANGELOG_DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(log_dir)
        )
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = {}
    for rows in acc:
        for r in rows:
            final[r["repo"]] = (r["max_seq"], r["n_events"], r["n_deletes"])
    return final


def _truth(spark, log_dir):
    batch = spark.read.schema(CHANGELOG_DDL).parquet(log_dir)
    return {
        r["repo"]: (r["ms"], r["n"], r["d"])
        for r in batch.groupBy("repo")
        .agg(
            F.max("seq").alias("ms"),
            F.count("*").alias("n"),
            F.sum((F.col("op") == "D").cast("long")).alias("d"),
        )
        .collect()
    }


def test_stateful_tracker_matches_batch_totals(spark, tmp_path):
    spec = ChangelogSpec(n_events=1000, n_repos=6, paths_per_repo=12,
                         delete_frac=0.10)
    changelog = generate_changelog(spec)
    log_dir = str(tmp_path / "log")
    write_changelog(changelog, log_dir, n_files=4)
    cp = str(tmp_path / "cp")

    assert _run(spark, log_dir, cp) == _truth(spark, log_dir)

    # state survives restart: new files arrive; the tracker resumes
    # from the state store and totals keep growing monotonically
    more = generate_changelog(
        ChangelogSpec(n_events=500, n_repos=6, paths_per_repo=12, seed=43)
    )
    more.to_parquet(os.path.join(log_dir, "zz-more.parquet"), index=False)
    final2 = _run(spark, log_dir, cp)
    # updated repos must now match the grand totals over ALL files
    truth2 = _truth(spark, log_dir)
    for repo, vals in final2.items():
        assert vals == truth2[repo], repo
