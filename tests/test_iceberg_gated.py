"""Iceberg sink — cluster-deployment path, auto-skipped where the
runtime jar is absent (this sandbox ships none and has no network;
SURVEY.md §7.3 #4).  On a real cluster these run against a catalog."""

import pytest

from atlas_spark.sinks.iceberg import IcebergSink, is_available


def test_iceberg_detection_is_honest(spark):
    # this sandbox has no iceberg-spark-runtime jar
    assert is_available(spark) in (True, False)


@pytest.fixture
def iceberg_spark(spark):
    if not is_available(spark):
        pytest.skip("no iceberg-spark-runtime jar in this environment")
    return spark


def test_iceberg_merge_contract(iceberg_spark, tmp_path):
    sink = IcebergSink(iceberg_spark, "lake.db.repos_test", n_buckets=4)
    sink.ensure()
    df = iceberg_spark.createDataFrame(
        [(1, "I", "r", "a", "c1", "py", "v1")],
        "seq bigint, op string, repo string, path string, commit string, "
        "lang string, content string",
    )
    sink.merge(df, 0)
    assert sink.read().count() == 1
    assert sink.merge(df, 0)["skipped"] is True
