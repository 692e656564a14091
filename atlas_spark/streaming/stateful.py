"""Custom stateful streaming operator: per-key CDC progress tracker.

``applyInPandasWithState`` is the engine's escape hatch for stateful
semantics Structured Streaming's built-ins can't express (the task
brief names it for custom stateful operators).  Demo operator: a
per-repo running tracker carrying ``(max_seq, n_events, n_deletes)``
across micro-batches — the streaming analog of the reference's
per-key watermark rows (``src/core/state/watermark.rs:50-79``), kept
in Spark state store instead of a sink table.

State shape and output are Arrow-batched pandas; Python runs once per
key-group per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "repo string, max_seq bigint, n_events bigint, n_deletes bigint"
)
STATE_SCHEMA = "max_seq bigint, n_events bigint, n_deletes bigint"


def _track(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (repo,) = key
    if state.exists:
        max_seq, n_events, n_deletes = state.get
    else:
        max_seq, n_events, n_deletes = -1, 0, 0
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        max_seq = max(max_seq, int(pdf["seq"].max()))
        n_events += len(pdf)
        n_deletes += int((pdf["op"] == "D").sum())
    state.update((max_seq, n_events, n_deletes))
    yield pd.DataFrame(
        {
            "repo": [repo],
            "max_seq": [max_seq],
            "n_events": [n_events],
            "n_deletes": [n_deletes],
        }
    )


def track_repo_progress(stream_df: DataFrame) -> DataFrame:
    """Attach the stateful tracker to a streaming changelog DataFrame.

    Emits one row per repo per micro-batch with the RUNNING totals —
    downstream can sink it as a live progress table."""
    return stream_df.groupBy("repo").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
