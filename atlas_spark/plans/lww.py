"""Last-writer-wins conflict resolution and payload decode.

The reference gets LWW implicitly from a serial apply loop +
``ON CONFLICT (id) DO UPDATE`` (``/root/reference/src/adapters/
postgresql/adapter.rs:133-144``) and is only correct because its
source yields time-ordered rows.  Under Spark's parallel, possibly
out-of-order delivery we make it explicit:

* **in-batch**: ``row_number() OVER (PARTITION BY repo, path
  ORDER BY seq DESC) = 1`` keeps exactly the newest event per key —
  including the case where a delete and a newer upsert for the same
  key land in one batch.
* **cross-batch**: the sink's MERGE guard ``incoming.seq >= existing.seq``
  (see sinks/lakehouse.py) rejects late, older events — a replayed or
  out-of-order batch can never regress a row.

All expressions are built-in (JVM, whole-stage codegen); no Python in
the hot path.

ASSUMPTION: ``seq`` is a total order over events (a binlog offset /
commit sequence) — two DIFFERENT events never share a seq.  Duplicate
delivery re-sends the identical event (same seq, same bytes), which
the deterministic tiebreak absorbs.  A source emitting conflicting
events at one seq has no well-defined LWW answer in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEY_COLS = ["repo", "path"]


def lww_latest(df: DataFrame, key_cols: list[str] | None = None,
               seq_col: str = "seq") -> DataFrame:
    """Keep only the newest event per key (deterministic tiebreak).

    Duplicate delivery of the same (key, seq) is broken by ``op`` then
    ``commit`` so the pick is stable; duplicated rows are verbatim
    copies anyway (FIXTURES.md duplicate_delivery scenario).
    """
    keys = key_cols or KEY_COLS
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(), F.col("op").asc(), F.col("commit").asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def decode_payload(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Parse the dynamic JSON side-payload into ``map<string,string>``.

    Mirrors the reference's dynamic FLAT-JSON ``content`` map
    (``src/core/transform/preserve.rs:70-74``): schema-on-read,
    arbitrary keys, values kept as strings until the evolution rules
    assign types.  Built-in ``from_json`` — JVM-side, no Python.
    """
    return df.withColumn(
        "_payload_map", F.from_json(F.col(payload_col), "map<string,string>")
    )
