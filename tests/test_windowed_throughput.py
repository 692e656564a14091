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


def test_late_row_beyond_watermark_is_dropped(spark, tmp_path):
    """A row arriving later than the allowed lateness must NOT update
    its (already finalized) window — the bounded-state trade."""
    import os
    import pandas as pd

    t0 = pd.Timestamp("2026-01-01 00:00:00")

    def mk(rows):
        df = pd.DataFrame(
            {
                "seq": range(len(rows)),
                "op": ["I"] * len(rows),
                "repo": [r[0] for r in rows],
                "path": [f"p{i}" for i in range(len(rows))],
                "commit": ["c" * 40] * len(rows),
                "lang": ["py"] * len(rows),
                "content": ["x"] * len(rows),
                "payload": ["{}"] * len(rows),
                "ts": [r[1] for r in rows],
            }
        )
        df["ts"] = df["ts"].astype("datetime64[us]")  # not ns — schema parity
        return df

    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    # file 1: two rows in window t0, then a row 30 minutes later that
    # advances the watermark far past t0 + 2min lateness
    mk([("r1", t0), ("r1", t0 + pd.Timedelta(seconds=10)),
        ("r1", t0 + pd.Timedelta(minutes=30))]).to_parquet(
        os.path.join(log_dir, "a.parquet"), index=False
    )
    # file 2: keeps the stream moving — the watermark computed from
    # file 1 takes effect only one batch later (propagation lag)
    mk([("r1", t0 + pd.Timedelta(minutes=31))]).to_parquet(
        os.path.join(log_dir, "b.parquet"), index=False
    )
    # file 3: a VERY late row for window t0 — now truly behind the
    # executing watermark
    mk([("r1", t0 + pd.Timedelta(seconds=20))]).to_parquet(
        os.path.join(log_dir, "c.parquet"), index=False
    )

    stream = (
        spark.readStream.schema(CHANGELOG_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(log_dir)
    )
    acc = []
    # APPEND mode: a window emits exactly once, when the watermark
    # passes window_end + lateness; late input beyond the watermark is
    # then dropped (GUARANTEED — update mode only promises best-effort)
    q = (
        windowed_throughput(stream, "1 minute", "2 minutes")
        .writeStream.foreachBatch(lambda df, eid: acc.append(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = [
        (r["window_start"], r["n_events"])
        for rows in acc
        for r in rows
        if r["window_start"].hour == 0 and r["window_start"].minute == 0
    ]
    # window t0 finalized exactly once, counting only the 2 on-time
    # rows — the very late row from file 2 never re-opened it
    assert emitted == [(t0.to_pydatetime(), 2)], emitted
