"""Skew handling: hot-key detection and salted two-phase aggregation.

The synthetic corpus gives one repo up to 30% of all events (FIXTURES
hot_key scenario) — the analog of a hot ``ehr_id`` partition in the
reference (its partition key, ``/root/reference/src/adapters/cosmosdb/
client.rs:135-139``; the reference has no mitigation beyond config).

Three layers of defense here, in order of preference:

1. **Structural**: the engine shuffles and buckets on the FULL primary
   key ``hash(repo, path)``, never on ``repo`` alone — a hot repo's
   events spread over all its paths, so the LWW window and the MERGE
   are skew-immune by construction (see sinks/lakehouse.py).
2. **AQE**: ``spark.sql.adaptive.skewJoin.enabled`` splits residual
   skewed shuffle partitions at runtime (session.py).
3. **Salting**: for genuinely per-repo aggregations (watermarks,
   per-repo stats) where one key dominates, the two-phase
   salt → partial-agg → final-agg below bounds any single task's input
   at ~1/salt_buckets of the hot key.  Partial aggregation (map-side
   combine) already helps for algebraic aggs; salting guarantees it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_salt(df: DataFrame, salt_buckets: int, salt_col: str = "_salt",
             from_col: str = "path") -> DataFrame:
    """Deterministic salt derived from a secondary column (not rand(),
    so retries/replays land identically)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(from_col)), F.lit(salt_buckets))
    )


def salted_group_max(df: DataFrame, key: str, value: str, out: str,
                     salt_buckets: int = 32) -> DataFrame:
    """max(value) per key via salt → partial max → final max.

    Semantically identical to ``df.groupBy(key).agg(max(value))`` —
    that equivalence is under test in the driver contract
    (q_salted_agg) — but the first shuffle distributes a hot key over
    ``salt_buckets`` tasks.
    """
    salted = add_salt(df, salt_buckets)
    partial = salted.groupBy(key, "_salt").agg(F.max(value).alias(out))
    return partial.groupBy(key).agg(F.max(out).alias(out))


def hot_keys(df: DataFrame, key: str, threshold_frac: float = 0.10,
             sample_frac: float = 0.05) -> list[str]:
    """Detect keys holding more than ``threshold_frac`` of (sampled)
    rows.  Sampled so the detector itself is cheap at 100 TB; callers
    feed the result into salting decisions or static hot-lists."""
    s = df.sample(fraction=sample_frac, seed=42) if sample_frac < 1.0 else df
    counts = s.groupBy(key).count()
    total = s.count()
    if total == 0:
        return []
    rows = counts.filter(F.col("count") > total * threshold_frac).collect()
    return [r[key] for r in rows]
