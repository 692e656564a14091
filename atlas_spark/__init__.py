"""atlas_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of erikhoward/atlas
(an incremental openEHR→Cosmos/Postgres sync tool, Rust, ~18.5k LoC)
as an idiomatic Spark engine:

* change-event log (binlog/WAL-style) → key-partitioned MERGE upsert
  into an ACID lake table keyed on ``(repo, path)``, last-writer-wins
  by commit sequence (reference analog: ``ON CONFLICT (id) DO UPDATE``
  at ``src/adapters/postgresql/adapter.rs:133-144``).
* per-epoch exactly-once commits via manifest fencing (reference:
  at-least-once + idempotent upsert, ``src/core/export/batch.rs``).
* watermark / lineage / metrics control tables (reference:
  ``migrations/001_initial_schema.sql:77-110``).
* schema evolution (add / rename / widen) via metadata-driven remaps
  (reference analog: flatten/preserve strategies,
  ``src/core/transform/mod.rs:78-87``).
* vectorized transform surface: builtin ``sha2`` / regex / JSON
  functions + Arrow-batched pandas UDFs only; zero per-row Python.

Everything here derives from public knowledge only: the PySpark API,
the reference repo's observable behavior, and published papers (the
manifest sink follows the Delta Lake VLDB'20 commit protocol reduced
to a local filesystem).
"""

__version__ = "0.1.0"

ENGINE_NAME = "atlas_spark"
