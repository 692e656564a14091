"""Property-based correctness for the change-feed consumers (round 7):
for ANY random changelog (ops, keys, arrival order, epoch boundaries,
redelivery), (a) an incremental view folded purely from the emitted
feeds equals the same aggregate computed directly over the final live
state, and (b) a replica reconstructed purely from the feeds equals
the source table byte-for-byte.  Hypothesis drives the adversary; each
example replays through the REAL merge + emit + fold/replicate paths.
"""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from atlas_spark.operators.incremental import IncrementalAggView
from atlas_spark.operators.replicate import replicate
from atlas_spark.sinks import LakehouseSink

def test_runner_pipeline_feeds_view_and_replica(spark, tmp_path):
    """The REAL pipeline end-to-end: a generator changelog (schema
    evolution, out-of-order deletes, duplicate delivery, a hot repo)
    replayed by ReplayRunner with the feed on, then consumed by an
    incremental view (measuring an EVOLVED column) and a replica —
    both must match the table the runner actually built."""
    from atlas_spark.changelog import (
        ChangelogSpec, generate_changelog, write_changelog,
    )
    from atlas_spark.streaming import ReplayRunner

    log = str(tmp_path / "log")
    write_changelog(
        generate_changelog(ChangelogSpec(
            n_events=2000, n_repos=5, paths_per_repo=12,
            schema_evolution=True)),
        log, n_files=4,
    )
    src = LakehouseSink(spark, str(tmp_path / "src"), n_buckets=4,
                        emit_changes=True, cdf_preimage=True)
    src.ensure()
    ReplayRunner(spark, src, files_per_epoch=2).run(log)
    assert "lines" in src.read().columns  # evolution actually happened

    view = IncrementalAggView(
        spark, str(tmp_path / "v"), ["repo"],
        {"total_lines": lambda c: c("lines"),
         "total_chars": lambda c: F.length(c("content"))},
    )
    view.refresh(src)
    direct = sorted(
        tuple(r) for r in src.read()
        .groupBy("repo")
        .agg(F.count("*").alias("n_rows"),
             F.sum("lines").alias("total_lines"),
             F.sum(F.length("content")).alias("total_chars"))
        .collect()
    )
    assert sorted(tuple(r) for r in view.state().collect()) == direct

    dst = LakehouseSink(spark, str(tmp_path / "dst"), n_buckets=4,
                        emit_changes=True)
    dst.ensure()
    replicate(src, dst)
    cols = ["repo", "path", "is_deleted", "content_sha256", "lines"]
    a = sorted(tuple(r) for r in src.read().select(*cols).collect())
    b = sorted(tuple(r) for r in dst.read().select(*cols).collect())
    assert a == b and len(a) > 0


_event = st.tuples(
    st.integers(min_value=0, max_value=5),      # key
    st.sampled_from(["I", "U", "D"]),           # op
)


@st.composite
def changelogs(draw):
    events = draw(st.lists(_event, min_size=1, max_size=30))
    n = len(events)
    seq_perm = draw(st.permutations(range(n)))
    rows = []
    for i, (key, op) in enumerate(events):
        seq = seq_perm[i]
        rows.append({
            "seq": seq,
            "op": op,
            "repo": f"r{key % 3}",
            "path": f"p{key}",
            "commit": f"{seq:040d}",
            "lang": "py",
            # duplicate content on purpose sometimes: byte-identical
            # re-upserts must NOT appear in the feed yet the view and
            # replica still converge
            "content": f"content-{key % 2}",
        })
    return pd.DataFrame(rows)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(changelog=changelogs(),
       epochs=st.integers(min_value=1, max_value=3))
def test_view_and_replica_converge_on_any_changelog(
        spark, tmp_path_factory, changelog, epochs):
    tmp = tmp_path_factory.mktemp("propfeed")
    src = LakehouseSink(spark, str(tmp / "src"), n_buckets=4,
                        emit_changes=True, cdf_preimage=True)
    src.ensure()
    n = len(changelog)
    per = max(1, (n + epochs - 1) // epochs)
    sdf = spark.createDataFrame(changelog)
    for e in range(epochs):
        chunk = sdf.filter(
            (F.col("seq") >= e * per) & (F.col("seq") < (e + 1) * per)
        )
        if e == 0 or chunk.count():
            src.merge(chunk, e)

    # (a) the view folded from feeds == direct aggregate over live
    view = IncrementalAggView(
        spark, str(tmp / "v"), ["repo"],
        {"total_chars": lambda c: F.length(c("content"))},
    )
    view.refresh(src)
    got = sorted(tuple(r) for r in view.state().collect())
    want = sorted(
        tuple(r) for r in src.read()
        .groupBy("repo")
        .agg(F.count("*").alias("n_rows"),
             F.sum(F.length("content")).alias("total_chars"))
        .collect()
    )
    assert got == want

    # (b) the replica rebuilt from feeds == the source.  Live state
    # must match exactly; tombstones match for every EVER-LIVE key —
    # a D of a never-live key emits no feed row by design (the live
    # state didn't change; Delta CDF's no-op DELETE behaves the same),
    # so that source-local tombstone legitimately stays source-local
    # (documented in operators/replicate.py).
    dst = LakehouseSink(spark, str(tmp / "dst"), n_buckets=4,
                        emit_changes=True)
    dst.ensure()
    replicate(src, dst)
    # `seq` is excluded: a byte-identical re-upsert at a higher seq
    # advances seq on the source but is by design not a change (the
    # classifier keys on content), so the replica's seq may lag —
    # content convergence is the contract (operators/replicate.py)
    cols = ["repo", "path", "is_deleted", "content_sha256"]
    a = sorted(tuple(r) for r in
               src.read().select(*cols).collect())
    b = sorted(tuple(r) for r in
               dst.read().select(*cols).collect())
    assert a == b
    src_t = src.read(include_tombstones=True).select(*cols)
    dst_t = dst.read(include_tombstones=True).select(*cols)
    # every replica row (incl. tombstones) exists identically on the
    # source; the only rows the source may hold extra are tombstones
    # of never-live keys
    assert dst_t.exceptAll(src_t).count() == 0
    extra = src_t.exceptAll(dst_t)
    assert extra.filter(~F.col("is_deleted")).count() == 0
