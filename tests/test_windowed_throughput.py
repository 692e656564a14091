"""Event-time tumbling windows + watermark over the changelog stream."""

from pyspark.sql import functions as F

from atlas_spark.changelog import ChangelogSpec, generate_changelog, write_changelog
from atlas_spark.streaming.runner import CHANGELOG_DDL
from atlas_spark.streaming.windows import windowed_throughput


def test_windowed_counts_match_batch(spark, tmp_path):
    spec = ChangelogSpec(n_events=1200, n_repos=5, paths_per_repo=10,
                         delete_frac=0.10)
    changelog = generate_changelog(spec)
    log_dir = str(tmp_path / "log")
    write_changelog(changelog, log_dir, n_files=4)

    stream = (
        spark.readStream.schema(CHANGELOG_DDL)
        .option("maxFilesPerTrigger", 2)
        .parquet(log_dir)
    )
    acc = []
    q = (
        windowed_throughput(stream, "1 minute", "2 minutes")
        .writeStream.foreachBatch(lambda df, eid: acc.append(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    final = {}
    for rows in acc:
        for r in rows:
            final[(r["window_start"], r["repo"])] = (
                r["n_events"], r["n_deletes"], r["max_seq"]
            )

    batch = spark.read.schema(CHANGELOG_DDL).parquet(log_dir)
    truth = {
        (r["ws"], r["repo"]): (r["n"], r["d"], r["ms"])
        for r in batch.groupBy(
            F.window("ts", "1 minute").alias("w"), "repo"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("op") == "D").cast("long")).alias("d"),
            F.max("seq").alias("ms"),
        )
        .select(F.col("w.start").alias("ws"), "repo", "n", "d", "ms")
        .collect()
    }
    # the generator's disorder is bounded (< 1 s jitter) and files
    # arrive roughly in ts order, so no window should have dropped rows
    assert final == truth
