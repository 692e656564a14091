"""Skew handling: hot-key detection, salted agg equivalence, and the
structural argument (bucket on full key) under a Zipf-hot corpus."""

from pyspark.sql import functions as F

from atlas_spark.changelog import ChangelogSpec, generate_changelog
from atlas_spark.plans.skew import add_salt, hot_keys, salted_group_max


def test_hot_key_detection(spark):
    spec = ChangelogSpec(n_events=3000, n_repos=20, paths_per_repo=40,
                         hot_repo_frac=0.35)
    df = spark.createDataFrame(generate_changelog(spec))
    hot = hot_keys(df, "repo", threshold_frac=0.20, sample_frac=0.5)
    assert "repo_000" in hot
    assert len(hot) <= 3


def test_salted_group_max_equals_plain(spark):
    spec = ChangelogSpec(n_events=1500, n_repos=10, paths_per_repo=20,
                         hot_repo_frac=0.30)
    df = spark.createDataFrame(generate_changelog(spec))
    salted = {
        r["repo"]: r["max_seq"]
        for r in salted_group_max(df, "repo", "seq", "max_seq", 16).collect()
    }
    plain = {
        r["repo"]: r["mx"]
        for r in df.groupBy("repo").agg(F.max("seq").alias("mx")).collect()
    }
    assert salted == plain


def test_salt_is_deterministic_and_bounded(spark):
    spec = ChangelogSpec(n_events=1000, n_repos=5, paths_per_repo=10)
    df = spark.createDataFrame(generate_changelog(spec))
    a = add_salt(df, 8).select("repo", "path", "_salt").collect()
    b = add_salt(df, 8).select("repo", "path", "_salt").collect()
    assert a == b  # no rand(): retries land identically
    assert all(0 <= r["_salt"] < 8 for r in a)


def test_full_key_bucketing_spreads_hot_repo(spark):
    """The structural defense: bucket = hash(repo, path) spreads a
    30%-hot repo across (nearly) all buckets, so no merge task inherits
    the skew."""
    spec = ChangelogSpec(n_events=3000, n_repos=20, paths_per_repo=40,
                         hot_repo_frac=0.30)
    df = spark.createDataFrame(generate_changelog(spec))
    n_buckets = 16
    dist = (
        df.filter(F.col("repo") == "repo_000")
        .withColumn("b", F.pmod(F.hash("repo", "path"), F.lit(n_buckets)))
        .groupBy("b")
        .count()
        .collect()
    )
    counts = {r["b"]: r["count"] for r in dist}
    assert len(counts) >= n_buckets - 2  # hot repo touches ~every bucket
    total = sum(counts.values())
    assert max(counts.values()) < total * 0.25  # no bucket dominates
