"""Sink ABC — the engine's write-side contract.

Mirrors the reference's DatabaseClient trait surface
(``/root/reference/src/adapters/database/traits.rs``): ensure-DDL,
idempotent keyed upsert, existence/verification reads — re-expressed
as table-level MERGE.  Two implementations:

* ``LakehouseSink`` (lakehouse.py): manifest-committed parquet table —
  the primary path in this sandbox (PySpark 4.1.2 ships no Iceberg /
  Delta runtime jar and there is no network; SURVEY.md §7.4).
* ``IcebergSink`` (iceberg.py): the cluster-deployment path — emits
  real ``MERGE INTO`` SQL against an Iceberg catalog when the runtime
  jar is present.
"""

from __future__ import annotations

import abc

from pyspark.sql import DataFrame


class Sink(abc.ABC):
    """Keyed CDC sink with exactly-once epoch semantics."""

    @abc.abstractmethod
    def ensure(self) -> None:
        """Create the table / layout if missing (reference analog:
        ``cosmosdb/client.rs:83-206`` ensure containers)."""

    @abc.abstractmethod
    def merge(self, batch_df: DataFrame, epoch_id: int) -> dict:
        """Apply one micro-batch of change events idempotently.

        Must be a no-op (returning ``{"skipped": True}``) if
        ``epoch_id`` was already committed — the foreachBatch
        idempotence fence.  Returns per-batch metrics.
        """

    @abc.abstractmethod
    def read(self) -> DataFrame:
        """Current live table state (tombstones excluded)."""

    @abc.abstractmethod
    def last_committed_epoch(self) -> int:
        """Highest epoch durably committed, -1 if none."""
