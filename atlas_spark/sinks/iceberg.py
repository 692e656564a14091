"""Iceberg sink — the cluster-deployment path (MERGE INTO).

This sandbox's PySpark 4.1.2 ships no ``iceberg-spark-runtime`` jar
and has no network to fetch one (SURVEY.md §7.3 #4), so this class is
exercised only where a real catalog exists; ``is_available`` gates it.
The LakehouseSink (lakehouse.py) implements identical semantics on a
bare filesystem and is the tested primary path here.

Deployment: spark-submit with
  --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
  --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
  --conf spark.sql.catalog.lake.type=hadoop
  --conf spark.sql.catalog.lake.warehouse=<path>
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import Sink
from .lakehouse import _bq
from .retry import with_retries


def is_available(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm  # noqa: SLF001
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


class IcebergSink(Sink):
    """Keyed CDC sink over an Iceberg table.

    Same contract as LakehouseSink: LWW by seq with tombstones, epoch
    fencing via a ``_txn`` control table (the Delta-paper ``txn``
    action pattern — Structured Streaming's foreachBatch idempotence).
    """

    def __init__(self, spark: SparkSession, table: str, n_buckets: int = 64):
        self.spark = spark
        self.table = table  # e.g. "lake.db.repos"
        self.n_buckets = n_buckets
        self.txn_table = f"{table}_txn"

    def ensure(self) -> None:
        self.spark.sql(
            f"""CREATE TABLE IF NOT EXISTS {self.table} (
                repo STRING, path STRING, commit STRING, lang STRING,
                content STRING, content_sha256 STRING, seq BIGINT,
                is_deleted BOOLEAN)
            USING iceberg
            PARTITIONED BY (bucket({self.n_buckets}, repo))
            TBLPROPERTIES (
                'write.merge.mode' = 'merge-on-read',
                'write.distribution-mode' = 'hash')"""
        )
        self.spark.sql(
            f"""CREATE TABLE IF NOT EXISTS {self.txn_table} (
                epoch_id BIGINT, committed_at TIMESTAMP)
            USING iceberg"""
        )

    def last_committed_epoch(self) -> int:
        row = self.spark.sql(
            f"SELECT max(epoch_id) AS e FROM {self.txn_table}"
        ).collect()[0]
        return row["e"] if row["e"] is not None else -1

    def merge(self, batch_df: DataFrame, epoch_id: int) -> dict:
        if epoch_id <= self.last_committed_epoch():
            return {"epoch_id": epoch_id, "skipped": True}

        # evolve schema for any new typed payload columns
        table_cols = {f.name for f in self.spark.table(self.table).schema.fields}
        for f_ in batch_df.schema.fields:
            if f_.name not in table_cols and f_.name not in ("op",) and not f_.name.startswith("_"):
                self.spark.sql(
                    f"ALTER TABLE {self.table} ADD COLUMN "
                    f"{_bq(f_.name)} {f_.dataType.simpleString()}"
                )

        w = Window.partitionBy("repo", "path").orderBy(
            F.col("seq").desc(), F.col("op").asc(), F.col("commit").asc()
        )
        batchw = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("is_deleted", F.col("op") == F.lit("D"))
            .withColumn(
                "content_sha256",
                F.when(F.col("op") == "D", F.lit(None)).otherwise(
                    F.sha2(F.col("content"), 256)
                ),
            )
            .drop("op")
        )
        batchw.createOrReplaceTempView("_atlas_batch")

        cols = [f.name for f in batchw.schema.fields]
        set_clause = ", ".join(f"t.{_bq(c)} = s.{_bq(c)}" for c in cols)
        insert_cols = ", ".join(_bq(c) for c in cols)
        insert_vals = ", ".join(f"s.{_bq(c)}" for c in cols)
        # LWW guard: only newer-or-equal seq may touch a row; tombstones
        # are UPDATEs (is_deleted=true), physically removed by periodic
        # compaction — identical semantics to LakehouseSink.merge.
        # with_retries: Iceberg optimistic commits throw transient
        # CommitFailedException under concurrent writers, and catalog /
        # object-store calls fail transiently; re-running this MERGE is
        # idempotent (the guard re-applies identical values), so bounded
        # retry beats aborting the epoch (bulk.rs:144-185 analog).
        with_retries(lambda: self.spark.sql(
            f"""MERGE INTO {self.table} t
                USING _atlas_batch s
                ON t.repo = s.repo AND t.path = s.path
                WHEN MATCHED AND s.seq >= t.seq THEN UPDATE SET {set_clause}
                WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})"""
        ), label=f"iceberg merge epoch {epoch_id}")
        with_retries(lambda: self.spark.sql(
            f"INSERT INTO {self.txn_table} "
            f"VALUES ({epoch_id}, current_timestamp())"
        ), label=f"iceberg txn append epoch {epoch_id}")
        return {"epoch_id": epoch_id, "skipped": False}

    def read(self) -> DataFrame:
        return self.spark.table(self.table).filter(~F.col("is_deleted"))

    def compact(self, drop_tombstones: bool = False) -> dict:
        """Rewrite small files; tombstones are RETAINED by default.

        Physically deleting a tombstone mid-stream is unsafe: a late
        out-of-order upsert with a smaller seq would then match nothing
        and resurrect the key via the NOT MATCHED → INSERT branch.  The
        tombstone row must stay so the ``s.seq >= t.seq`` guard can
        reject it — same contract as LakehouseSink.compact.  Pass
        ``drop_tombstones=True`` only at end-of-replay, when no earlier
        seq can still arrive."""
        if drop_tombstones:
            self.spark.sql(
                f"DELETE FROM {self.table} WHERE is_deleted = true"
            )
        self.spark.sql(
            f"CALL {self.table.split('.')[0]}.system.rewrite_data_files"
            f"(table => '{self.table}')"
        )
        return {"compacted": True, "tombstones_dropped": drop_tombstones}
