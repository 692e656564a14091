"""Event-time windowed throughput with late-data watermarking.

The CDC core is key-LWW state (no windowed aggs required by the north
rule), but an ingest engine still wants live event-time throughput:
events per tumbling window per repo, tolerating bounded disorder.
``withWatermark`` bounds state: windows older than the watermark are
finalized and dropped from the state store — without it, a 10^10-event
stream would accrete unbounded window state.

Late rows inside the allowed lateness update their window; rows later
than the watermark are dropped (counted by Spark's
``numDroppedRows``) — the documented trade for bounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_throughput(
    stream_df: DataFrame,
    window_size: str = "1 minute",
    allowed_lateness: str = "2 minutes",
) -> DataFrame:
    """events + deletes per (repo, tumbling event-time window)."""
    return (
        stream_df.withWatermark("ts", allowed_lateness)
        .groupBy(F.window("ts", window_size).alias("w"), F.col("repo"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.col("op") == "D").cast("long")).alias("n_deletes"),
            F.max("seq").alias("max_seq"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "repo",
            "n_events",
            "n_deletes",
            "max_seq",
        )
    )
