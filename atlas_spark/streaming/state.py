"""Queryable control tables: per-partition watermarks + per-epoch metrics.

Structured Streaming checkpoints are opaque; the north rule wants
queryable lineage.  These tables mirror the reference's ``watermarks``
DDL (``/root/reference/migrations/001_initial_schema.sql:77-110``,
``src/core/state/watermark.rs:50-79``) and its ExportSummary /
BatchResult metrics (``src/core/export/summary.rs:33-71``,
``batch.rs:65-93``), as parquet directories any Spark/DuckDB session
can read.

Written driver-side via pyarrow (rows-per-epoch is tiny — one row per
bucket — a Spark write would cost more than the data).  One file per
epoch, named by epoch id, committed by ``os.replace`` → idempotent
under replay: re-running an epoch rewrites an identical-schema file
rather than appending a duplicate.

Status lifecycle matches the reference's enum
(``watermark.rs:11-25``): ``in_progress`` written before the merge,
``completed`` after; a crash leaves ``in_progress`` visible, which a
resume marks ``interrupted``.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

WATERMARK_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("max_seq_applied", pa.int64()),
        ("epoch_id", pa.int64()),
        ("status", pa.string()),
        ("rows_applied", pa.int64()),
        ("started_at", pa.timestamp("us")),
        ("completed_at", pa.timestamp("us")),
    ]
)

METRIC_SCHEMA = pa.schema(
    [
        ("epoch_id", pa.int64()),
        ("rows_in", pa.int64()),
        ("upserts", pa.int64()),
        ("deletes", pa.int64()),
        ("duplicates_skipped", pa.int64()),
        ("duration_ms", pa.int64()),
        ("events_per_sec", pa.float64()),
        ("status", pa.string()),
    ]
)


def _write_atomic(table: pa.Table, path: str) -> None:
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


class ControlTables:
    def __init__(self, root: str):
        self.wm_dir = os.path.join(root, "_control", "watermarks")
        self.metrics_dir = os.path.join(root, "_control", "metrics")
        os.makedirs(self.wm_dir, exist_ok=True)
        os.makedirs(self.metrics_dir, exist_ok=True)

    def _wm_path(self, epoch_id: int) -> str:
        return os.path.join(self.wm_dir, f"epoch-{epoch_id:08d}.parquet")

    def _metric_path(self, epoch_id: int) -> str:
        return os.path.join(self.metrics_dir, f"epoch-{epoch_id:08d}.parquet")

    def mark_started(self, epoch_id: int) -> float:
        t = time.time()
        table = pa.table(
            {
                "partition_id": pa.array([-1], pa.int32()),
                "max_seq_applied": pa.array([None], pa.int64()),
                "epoch_id": pa.array([epoch_id], pa.int64()),
                "status": pa.array(["in_progress"]),
                "rows_applied": pa.array([None], pa.int64()),
                "started_at": pa.array([int(t * 1e6)], pa.timestamp("us")),
                "completed_at": pa.array([None], pa.timestamp("us")),
            },
            schema=WATERMARK_SCHEMA,
        )
        _write_atomic(table, self._wm_path(epoch_id))
        return t

    def mark_completed(
        self,
        epoch_id: int,
        bucket_watermarks: dict[str, int],
        rows_per_bucket: dict[str, int],
        started_at: float,
        status: str = "completed",
    ) -> None:
        buckets = sorted(bucket_watermarks, key=int) or ["-1"]
        now = time.time()
        table = pa.table(
            {
                "partition_id": pa.array([int(b) for b in buckets], pa.int32()),
                "max_seq_applied": pa.array(
                    [bucket_watermarks.get(b) for b in buckets], pa.int64()
                ),
                "epoch_id": pa.array([epoch_id] * len(buckets), pa.int64()),
                "status": pa.array([status] * len(buckets)),
                "rows_applied": pa.array(
                    [rows_per_bucket.get(b, 0) for b in buckets], pa.int64()
                ),
                "started_at": pa.array(
                    [int(started_at * 1e6)] * len(buckets), pa.timestamp("us")
                ),
                "completed_at": pa.array(
                    [int(now * 1e6)] * len(buckets), pa.timestamp("us")
                ),
            },
            schema=WATERMARK_SCHEMA,
        )
        _write_atomic(table, self._wm_path(epoch_id))

    def record_metrics(self, epoch_id: int, rows_in: int, upserts: int,
                       deletes: int, duplicates_skipped: int,
                       duration_ms: int, status: str = "completed") -> None:
        eps = (rows_in / (duration_ms / 1000.0)) if duration_ms > 0 else 0.0
        table = pa.table(
            {
                "epoch_id": pa.array([epoch_id], pa.int64()),
                "rows_in": pa.array([rows_in], pa.int64()),
                "upserts": pa.array([upserts], pa.int64()),
                "deletes": pa.array([deletes], pa.int64()),
                "duplicates_skipped": pa.array([duplicates_skipped], pa.int64()),
                "duration_ms": pa.array([duration_ms], pa.int64()),
                "events_per_sec": pa.array([eps], pa.float64()),
                "status": pa.array([status]),
            },
            schema=METRIC_SCHEMA,
        )
        _write_atomic(table, self._metric_path(epoch_id))

    def mark_interrupted_epochs(self) -> list[int]:
        """On resume: any epoch still ``in_progress`` was interrupted —
        reference analog ``watermark.rs:140-143`` mark_interrupted."""
        out = []
        for fname in sorted(os.listdir(self.wm_dir)):
            if not fname.endswith(".parquet"):
                continue
            path = os.path.join(self.wm_dir, fname)
            t = pq.read_table(path)
            statuses = t.column("status").to_pylist()
            if all(s == "in_progress" for s in statuses):
                data = t.to_pydict()
                data["status"] = ["interrupted"] * len(statuses)
                _write_atomic(pa.table(data, schema=WATERMARK_SCHEMA), path)
                out.append(data["epoch_id"][0])
        return out

    def backfill_from_manifest(self, manifest: dict) -> list[int]:
        """Recovery for the commit-order gap: data commits BEFORE
        control writes (SURVEY §7.3 #1), so a crash in between leaves a
        committed epoch with no watermark/metrics row.  On resume,
        synthesize a `recovered` row from the manifest's cumulative
        per-bucket watermarks for any fenced epoch missing its file."""
        last = manifest.get("committed_epoch_max", -1)
        out = []
        for epoch_id in range(last + 1):
            if os.path.exists(self._wm_path(epoch_id)):
                continue
            wm = {b: int(v) for b, v in manifest.get("watermarks", {}).items()}
            self.mark_completed(epoch_id, wm, {}, time.time(),
                                status="recovered")
            self.record_metrics(epoch_id, 0, 0, 0, 0, 0, status="recovered")
            out.append(epoch_id)
        return out

    # ------------------------------------------------------------ reads
    def watermarks_df(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.wm_dir)

    def metrics_df(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.metrics_dir)
