"""Round-8 optimization internals: the size-adaptive merge path, the
overlapped/deferred stats join, and the _tp scan-spread helper —
focused pins so the optimizations can't silently regress or drift
semantically."""

import os

import pandas as pd
from pyspark.sql import functions as F

from atlas_spark.changelog import ChangelogSpec, generate_changelog, write_changelog
from atlas_spark.sinks import LakehouseSink
from atlas_spark.streaming import ReplayRunner


def _batch(spark, n=200, seq0=0):
    rows = [
        (seq0 + i, "D" if i % 17 == 0 else "U", f"r{i % 5}", f"p{i % 40}",
         f"c{seq0 + i}", "py", f"v{seq0 + i}")
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "seq bigint, op string, repo string, path string, commit string, "
        "lang string, content string",
    )


def _state(sink):
    return {
        (r["repo"], r["path"]): (r["seq"], r["content_sha256"])
        for r in sink.read().collect()
    }


def test_input_bytes_picks_bulk_below_threshold(spark, tmp_path):
    """A small input-size hint takes the bulk shape even when the key
    count is broadcast-sized; a large hint (or none) keeps the
    winners-first default."""
    sink = LakehouseSink(spark, str(tmp_path / "a"), n_buckets=4)
    sink.ensure()
    m0 = sink.merge(_batch(spark), 0, input_bytes=1024)
    assert m0["merge_path"] == "bulk"
    m1 = sink.merge(_batch(spark, seq0=1000), 1,
                    input_bytes=sink.bulk_input_bytes_max + 1)
    assert m1["merge_path"] == "broadcast"
    m2 = sink.merge(_batch(spark, seq0=2000), 2)
    assert m2["merge_path"] == "broadcast"


def test_bulk_hint_state_and_metrics_match_broadcast(spark, tmp_path):
    """Same two-epoch merge with and without the small-size hint:
    identical final state AND identical merge metrics (rows_in,
    upserts, watermarks, per-bucket counts)."""
    keys = ["rows_in", "upserts", "duplicates_skipped",
            "superseded_in_batch", "bucket_watermarks", "rows_per_bucket"]
    results = {}
    for name, hint in [("bulk", 1), ("bcast", None)]:
        sink = LakehouseSink(spark, str(tmp_path / name), n_buckets=4)
        sink.ensure()
        ms = [
            sink.merge(_batch(spark), 0, input_bytes=hint),
            sink.merge(_batch(spark, seq0=1000), 1, input_bytes=hint),
        ]
        results[name] = ([{k: m[k] for k in keys} for m in ms], _state(sink))
    assert results["bulk"][0] == results["bcast"][0]
    assert results["bulk"][1] == results["bcast"][1]


def test_deferred_stats_mor_parity(spark, tmp_path):
    """MoR merges defer the stats join past the write (full overlap);
    metrics and state must equal the broadcast-path MoR merge."""
    keys = ["rows_in", "upserts", "bucket_watermarks", "rows_per_bucket"]
    out = {}
    for name, hint in [("fast", 1), ("slow", None)]:
        sink = LakehouseSink(spark, str(tmp_path / name), n_buckets=4,
                             mode="mor")
        sink.ensure()
        ms = [
            sink.merge(_batch(spark), 0, input_bytes=hint),
            sink.merge(_batch(spark, seq0=1000), 1, input_bytes=hint),
        ]
        out[name] = ([{k: m[k] for k in keys} for m in ms], _state(sink))
    assert out["fast"][0] == out["slow"][0]
    assert out["fast"][1] == out["slow"][1]


def test_deferred_stats_empty_batch_early_exit(spark, tmp_path):
    """An all-NULL-key batch on the deferred-stats path (empty table →
    full overlap) must produce the same empty-epoch result shape as
    the synchronous early exit."""
    sink = LakehouseSink(spark, str(tmp_path / "t"), n_buckets=4)
    sink.ensure()
    empty = spark.createDataFrame(
        [(None, "U", None, None, "c0", "py", "v")],
        "seq bigint, op string, repo string, path string, commit string, "
        "lang string, content string",
    )
    res = sink.merge(empty, 0, input_bytes=1)
    assert res["rows_in"] == 0 and res["upserts"] == 0
    assert res["bucket_watermarks"] == {} and res["rows_per_bucket"] == {}
    # the fence still advanced: a later real merge lands on epoch 1
    res1 = sink.merge(_batch(spark), 1, input_bytes=1)
    assert res1["upserts"] > 0


def test_runner_passes_epoch_input_bytes(spark, tmp_path):
    """File-backed replay epochs hand their on-disk size to the sink:
    a tiny corpus must take the bulk path end-to-end."""
    spec = ChangelogSpec(n_events=300, n_repos=3, paths_per_repo=10)
    log = str(tmp_path / "log")
    write_changelog(generate_changelog(spec), log, n_files=2)
    sink = LakehouseSink(spark, str(tmp_path / "t"), n_buckets=4)
    sink.ensure()
    seen = []
    orig = sink.merge

    def spy(batch, epoch_id, **kw):
        seen.append(kw.get("input_bytes"))
        return orig(batch, epoch_id, **kw)

    sink.merge = spy
    ReplayRunner(spark, sink, files_per_epoch=1).run(log)
    assert len(seen) == 2 and all(
        isinstance(b, int) and b > 0 for b in seen
    )


def test_tp_spread_cap_is_a_noop_above_threshold(spark, tmp_path,
                                                 monkeypatch):
    """_tp repartitions small inputs and leaves big ones alone (the
    100 TB guard: never add an exchange a large scan doesn't need)."""
    import atlas_spark.operators.catalog as cat

    pdf = pd.DataFrame({"doc_id": range(50), "text": ["a b c d"] * 50})
    p = str(tmp_path / "documents.parquet")
    pdf.to_parquet(p, index=False)

    df_small = cat._tp(spark, str(tmp_path), "documents")
    assert df_small.rdd.getNumPartitions() == \
        spark.sparkContext.defaultParallelism

    monkeypatch.setattr(cat, "_SPREAD_CAP", 0)
    df_big = cat._tp(spark, str(tmp_path), "documents")
    plan = df_big._jdf.queryExecution().explainString(
        df_big._sc._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("simple"))
    assert "Exchange" not in plan


def test_lsh_prefilter_equals_mh0_nullness(spark, tmp_path):
    """The raw-text pre-filter (size(split) >= 3) must keep exactly the
    docs whose band key is non-NULL — including the <3-word and empty
    edge docs the old computed-column filter dropped."""
    import atlas_spark.operators.catalog as cat

    pdf = pd.DataFrame({
        "doc_id": range(6),
        "text": ["one two three four", "a b c", "two words", "one", "",
                 "x y z w v"],
    })
    p = str(tmp_path / "documents.parquet")
    pdf.to_parquet(p, index=False)
    out = cat.q_minhash_signature(spark, str(tmp_path))
    with_mh = {r["doc_id"] for r in out.collect() if r["mh0"] is not None}
    pairs_docs = cat.q_lsh_candidate_pairs(spark, str(tmp_path))
    # band membership can only contain docs with a band key
    banded = set()
    for r in pairs_docs.collect():
        banded.add(r["doc_a"])
        banded.add(r["doc_b"])
    assert banded <= with_mh
    # and the ngram relation keeps exactly the >=3-word docs
    ng = cat.q_ngram_jaccard(spark, str(tmp_path))
    ng.collect()  # executes the pre-filtered plan without error
