"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship CDC demo on sf0.001.
``queries()`` / ``oracle_sql()`` — operator catalog per SURVEY.md §2,
implemented in atlas_spark/operators/catalog.py (Spark) with DuckDB
oracle SQL side-by-side.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from atlas_spark.operators import ORACLES, QUERIES  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the CDC heart — per-key last-writer-wins fold of
    the events changelog joined with per-key watermark aggregates
    (SURVEY §2.6: the window that IS our MERGE, plus the watermark agg).
    """
    from pyspark.sql import functions as F

    latest = QUERIES["q_lww_latest"](spark, SF0001)
    wm = QUERIES["q_watermark_agg"](spark, SF0001)
    return latest.join(wm, "user_id").select(
        "user_id",
        "last_event_id",
        "last_type",
        "last_value",
        "n_events",
        F.col("max_ts_us").alias("watermark_us"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
