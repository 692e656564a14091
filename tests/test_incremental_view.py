"""Incremental materialized-view maintenance from the change feed
(round 7): the downstream-aggregate fold must equal a direct aggregate
over the live base state after every refresh, batch or streaming,
including U-rows that migrate between groups and crash-mid-refresh
re-folds.

Reference parity: the reference re-runs the full export query per sync
(/root/reference/src/core/export/batch.rs); the feed + fold here makes
that refresh O(changed rows) instead of O(table).
"""

import glob
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from atlas_spark.operators.incremental import (
    IncrementalAggView, cdf_delta, count_live, fold_delta,
)
from atlas_spark.sinks import LakehouseSink

COLS = ["seq", "op", "repo", "path", "commit", "lang", "content"]


def _cl(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=COLS))


def _sink(spark, tmp_path, **kw):
    s = LakehouseSink(spark, str(tmp_path / "t"), n_buckets=4,
                      emit_changes=True, cdf_preimage=True, **kw)
    s.ensure()
    return s


MEASURES = {"total_chars": lambda c: F.length(c("content"))}


def _direct(sink):
    """The view's definition evaluated the expensive way — a full scan
    of the live base state (what refresh() must never need)."""
    return sorted(
        tuple(r)
        for r in sink.read()
        .groupBy("repo")
        .agg(F.count("*").alias("n_rows"),
             F.sum(F.length("content")).alias("total_chars"))
        .collect()
    )


def _view_rows(view):
    return sorted(tuple(r) for r in view.state().collect())


def test_preimage_struct_in_feed(spark, tmp_path):
    """cdf_preimage=True carries the full old row for U/D and NULL
    (not a struct of nulls) for I; the default feed schema is
    unchanged (no `_pre` column)."""
    sink = _sink(spark, tmp_path)
    sink.merge(_cl(spark, [(1, "U", "r1", "a", "c1", "py", "xx")]), 0)
    sink.merge(_cl(spark, [(2, "U", "r1", "a", "c2", "py", "xyzw"),
                           (3, "U", "r1", "b", "c3", "go", "q")]), 1)
    feed = {r["_change"]: r for r in sink.changes(1).collect()}
    assert feed["I"]["_pre"] is None
    assert feed["U"]["_pre"]["content"] == "xx"
    assert feed["U"]["_pre"]["seq"] == 1
    plain = LakehouseSink(spark, str(tmp_path / "p"), n_buckets=4,
                          emit_changes=True)
    plain.ensure()
    plain.merge(_cl(spark, [(1, "U", "r1", "a", "c1", "py", "xx")]), 0)
    assert "_pre" not in plain.changes(0).columns


def test_cdf_delta_requires_preimage(spark, tmp_path):
    sink = LakehouseSink(spark, str(tmp_path / "t"), n_buckets=4,
                         emit_changes=True)
    sink.ensure()
    sink.merge(_cl(spark, [(1, "U", "r1", "a", "c1", "py", "xx")]), 0)
    with pytest.raises(ValueError, match="cdf_preimage"):
        cdf_delta(sink.changes(0), ["repo"], MEASURES)


def test_refresh_tracks_live_state_through_deletes(spark, tmp_path):
    sink = _sink(spark, tmp_path)
    view = IncrementalAggView(spark, str(tmp_path / "v"), ["repo"],
                              dict(MEASURES))
    sink.merge(_cl(spark, [
        (1, "U", "r1", "a", "c1", "py", "x" * 10),
        (2, "U", "r1", "b", "c2", "py", "y" * 20),
        (3, "U", "r2", "c", "c3", "go", "z" * 5),
    ]), 0)
    assert view.refresh(sink)["applied_epochs"] == [0]
    assert _view_rows(view) == _direct(sink)
    sink.merge(_cl(spark, [
        (10, "U", "r1", "a", "c4", "py", "x" * 30),   # U: 10 -> 30
        (11, "D", "r1", "b", "c5", "py", ""),          # retract 20
        (12, "U", "r2", "d", "c6", "go", "w" * 7),     # insert
    ]), 1)
    assert view.refresh(sink)["applied_epochs"] == [1]
    assert _view_rows(view) == _direct(sink)
    # kill the last live r2 row: the group must drop from the view
    sink.merge(_cl(spark, [(20, "D", "r2", "c", "c7", "go", ""),
                           (21, "D", "r2", "d", "c8", "go", "")]), 2)
    view.refresh(sink)
    assert _view_rows(view) == _direct(sink)
    assert all(r[0] != "r2" for r in _view_rows(view))
    # no pending epochs -> no-op, version stable
    v = view._pointer()["version"]
    assert view.refresh(sink) == {"applied_epochs": [], "version": v}


def test_group_migration_retracts_old_group(spark, tmp_path):
    """A U whose grouping value changes must retract from the old
    group and add to the new one — the two-sided pre/post projection,
    grouped on a NON-key column (lang)."""
    sink = _sink(spark, tmp_path)
    view = IncrementalAggView(spark, str(tmp_path / "v"), ["lang"],
                              dict(MEASURES))
    sink.merge(_cl(spark, [(1, "U", "r1", "a", "c1", "py", "xx"),
                           (2, "U", "r1", "b", "c2", "py", "yyy")]), 0)
    view.refresh(sink)
    # content AND lang change together -> a U that moves groups
    sink.merge(_cl(spark, [(3, "U", "r1", "a", "c3", "go", "zzzz")]), 1)
    view.refresh(sink)
    got = _view_rows(view)
    assert got == sorted(
        tuple(r) for r in sink.read()
        .groupBy("lang")
        .agg(F.count("*").alias("n_rows"),
             F.sum(F.length("content")).alias("total_chars"))
        .collect()
    )
    assert ("go", 1, 4) in got and ("py", 1, 3) in got


def test_multi_epoch_catchup_single_fold(spark, tmp_path):
    """A view created after N epochs catches up in one refresh, and
    matches a view that refreshed after every epoch."""
    sink = _sink(spark, tmp_path)
    stepwise = IncrementalAggView(spark, str(tmp_path / "v1"),
                                  ["repo"], dict(MEASURES))
    for e in range(4):
        rows = [(e * 10 + i, "D" if (e == 3 and i == 0) else "U",
                 f"r{i % 2}", f"p{i}", f"c{e}{i}", "py",
                 "k" * (e + i + 1)) for i in range(3)]
        sink.merge(_cl(spark, rows), e)
        stepwise.refresh(sink)
    late = IncrementalAggView(spark, str(tmp_path / "v2"), ["repo"],
                              dict(MEASURES))
    assert late.refresh(sink)["applied_epochs"] == [0, 1, 2, 3]
    assert _view_rows(late) == _view_rows(stepwise) == _direct(sink)


def test_crash_mid_refresh_refolds_idempotently(spark, tmp_path):
    """A crash AFTER the new state parquet is written but BEFORE the
    pointer advances must leave the view readable at the old version,
    and the re-run refresh re-folds the same epochs to the same
    rows (feeds immutable + deltas deterministic)."""
    sink = _sink(spark, tmp_path)
    view = IncrementalAggView(spark, str(tmp_path / "v"), ["repo"],
                              dict(MEASURES))
    sink.merge(_cl(spark, [(1, "U", "r1", "a", "c1", "py", "xx")]), 0)
    view.refresh(sink)
    sink.merge(_cl(spark, [(2, "U", "r1", "a", "c2", "py", "xxxx")]), 1)

    class Boom(RuntimeError):
        pass

    orig = view._write_pointer
    view._write_pointer = lambda ptr: (_ for _ in ()).throw(Boom())
    with pytest.raises(Boom):
        view.refresh(sink)
    view._write_pointer = orig
    # still readable at v1, watermark unmoved
    assert view._pointer() == {"version": 1, "applied_through_epoch": 0}
    assert _view_rows(view) == [("r1", 1, 2)]
    assert view.refresh(sink)["applied_epochs"] == [1]
    assert _view_rows(view) == _direct(sink)
    # the orphaned state_v2 from the crashed attempt was overwritten,
    # not duplicated
    assert sorted(
        os.path.basename(p)
        for p in glob.glob(str(tmp_path / "v" / "state_v*"))
    ) == ["state_v2"]


def test_stream_refresh_checkpoint_resume(spark, tmp_path):
    """changes_stream + foreachBatch fold: drain-and-stop, then a new
    epoch, then a restarted stream on the same checkpoint folds ONLY
    the new epoch (exactly-once via the stream checkpoint)."""
    sink = _sink(spark, tmp_path)
    view = IncrementalAggView(spark, str(tmp_path / "v"), ["repo"],
                              dict(MEASURES))
    ckpt = str(tmp_path / "ck")
    sink.merge(_cl(spark, [(1, "U", "r1", "a", "c1", "py", "xx"),
                           (2, "U", "r2", "b", "c2", "py", "yyy")]), 0)
    q = view.stream_refresh(sink, ckpt)
    q.awaitTermination(120)
    assert _view_rows(view) == _direct(sink)
    v_after_first = view._pointer()["version"]
    sink.merge(_cl(spark, [(3, "D", "r2", "b", "c3", "py", "")]), 1)
    q = view.stream_refresh(sink, ckpt)
    q.awaitTermination(120)
    assert _view_rows(view) == _direct(sink)
    # exactly one more fold happened (one batch), not a re-fold of all
    assert view._pointer()["version"] == v_after_first + 1


def test_refresh_across_schema_evolution_boundary(spark, tmp_path):
    """A measure reading a column that was ADDED mid-stream: epoch 0's
    feed pre-dates `lines`, so its delta contributes typed NULLs
    (sum-skipped — exactly the base table's all-null reading of
    pre-evolution rows), while epoch 1's contributes values.  The
    catch-up view must equal the direct aggregate over the evolved
    live state."""
    sink = _sink(spark, tmp_path)
    sink.merge(_cl(spark, [(1, "U", "r1", "a", "c1", "py", "xx"),
                           (2, "U", "r1", "b", "c2", "py", "yyy")]), 0)
    b2 = _cl(spark, [(3, "U", "r1", "a", "c3", "py", "zzzz"),
                     (4, "U", "r2", "c", "c4", "go", "w")]).withColumn(
        "lines", F.lit(7).cast("bigint")
    )
    sink.merge(b2, 1)
    view = IncrementalAggView(
        spark, str(tmp_path / "v"), ["repo"],
        {"total_lines": lambda c: c("lines")},
    )
    assert view.refresh(sink)["applied_epochs"] == [0, 1]
    direct = sorted(
        tuple(r) for r in sink.read()
        .groupBy("repo")
        .agg(F.count("*").alias("n_rows"),
             F.sum("lines").alias("total_lines"))
        .collect()
    )
    assert _view_rows(view) == direct
    # r1: a evolved (7), b pre-evolution (null) -> total 7, count 2
    assert ("r1", 2, 7) in direct
    # without the type hint, the unknown column raises clearly
    with pytest.raises(ValueError, match="schema evolution"):
        cdf_delta(sink.changes(0), ["repo"],
                  {"total_lines": lambda c: c("lines")})


def test_bootstrap_then_incremental(spark, tmp_path):
    """A view joining late bootstraps from ONE direct scan of the live
    state (the only honest option once early feeds/manifests are
    vacuum-pruned), then folds subsequent epochs incrementally —
    matching both a from-scratch fold and the direct aggregate."""
    sink = _sink(spark, tmp_path)
    sink.merge(_cl(spark, [(1, "U", "r1", "a", "c1", "py", "x" * 4),
                           (2, "U", "r2", "b", "c2", "go", "y" * 6)]), 0)
    sink.merge(_cl(spark, [(3, "D", "r2", "b", "c3", "go", "")]), 1)
    late = IncrementalAggView(spark, str(tmp_path / "v"), ["repo"],
                              dict(MEASURES))
    boot = late.bootstrap(sink)
    assert boot["applied_through_epoch"] == 1
    assert _view_rows(late) == _direct(sink)
    # nothing pending right after bootstrap
    assert late.refresh(sink)["applied_epochs"] == []
    # subsequent epochs fold incrementally on top of the bootstrap
    sink.merge(_cl(spark, [(4, "U", "r2", "c", "c4", "go", "z" * 9),
                           (5, "U", "r1", "a", "c5", "py", "x")]), 2)
    assert late.refresh(sink)["applied_epochs"] == [2]
    assert _view_rows(late) == _direct(sink)
    scratch = IncrementalAggView(spark, str(tmp_path / "v2"), ["repo"],
                                 dict(MEASURES))
    scratch.refresh(sink)
    assert _view_rows(late) == _view_rows(scratch)


def test_refresh_behind_vacuumed_retention_demands_bootstrap(spark, tmp_path):
    """Once vacuum has pruned both the early feed dirs and the
    manifests that could regenerate them, a behind view's refresh must
    fail with explicit bootstrap guidance (silently wrong is not an
    option), and bootstrap() must recover it."""
    sink = _sink(spark, tmp_path)
    sink.merge(_cl(spark, [(1, "U", "r1", "a", "c1", "py", "xx")]), 0)
    sink.merge(_cl(spark, [(2, "U", "r1", "b", "c2", "py", "yy")]), 1)
    sink.merge(_cl(spark, [(3, "U", "r2", "c", "c3", "go", "zz")]), 2)
    sink.vacuum(retain_versions=1, min_age_seconds=0.0,
                retain_changes=1)
    view = IncrementalAggView(spark, str(tmp_path / "v"), ["repo"],
                              dict(MEASURES))
    with pytest.raises(RuntimeError, match="bootstrap"):
        view.refresh(sink)
    view.bootstrap(sink)
    assert _view_rows(view) == _direct(sink)
    sink.merge(_cl(spark, [(4, "D", "r2", "c", "c4", "go", "")]), 3)
    assert view.refresh(sink)["applied_epochs"] == [3]
    assert _view_rows(view) == _direct(sink)


def test_refresh_on_regenerated_feed_across_evolution(spark, tmp_path):
    """A feed REGENERATED across an evolution boundary reads the old
    snapshot with its old schema, so its `_pre` struct lacks the new
    column.  The pre-image accessor must yield NULL there — falling
    back to the top-level POST value would retract the wrong amount."""
    import shutil as _sh

    sink = _sink(spark, tmp_path)
    sink.merge(_cl(spark, [(1, "U", "r1", "a", "c1", "py", "xx")]), 0)
    b2 = _cl(spark, [(2, "U", "r1", "a", "c2", "py", "yyy"),
                     (3, "U", "r1", "b", "c3", "py", "z")]).withColumn(
        "lines", F.lit(7).cast("bigint")
    )
    sink.merge(b2, 1)
    # lose epoch 1's emitted feed; changes() regenerates it from the
    # (v0 old-schema, v1 new-schema) snapshot pair
    _sh.rmtree(os.path.join(sink.root, "_changes/epoch=000001"))
    regen = sink.changes(1)
    assert "lines" not in {
        f.name for f in regen.schema["_pre"].dataType.fields
    }
    view = IncrementalAggView(
        spark, str(tmp_path / "v"), ["repo"],
        {"total_lines": lambda c: c("lines")},
    )
    view.refresh(sink)
    direct = sorted(
        tuple(r) for r in sink.read()
        .groupBy("repo")
        .agg(F.count("*").alias("n_rows"),
             F.sum("lines").alias("total_lines"))
        .collect()
    )
    assert _view_rows(view) == direct == [("r1", 2, 14)]


def test_stream_batch_redelivery_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering an already-folded
    batchId (crash between the view fold and the stream checkpoint
    commit) must NOT double-apply the delta; a NEW batch id on the
    same checkpoint still folds."""
    sink = _sink(spark, tmp_path)
    view = IncrementalAggView(spark, str(tmp_path / "v"), ["repo"],
                              dict(MEASURES))
    ckpt = str(tmp_path / "ck")
    sink.merge(_cl(spark, [(1, "U", "r1", "a", "c1", "py", "xx")]), 0)
    q = view.stream_refresh(sink, ckpt)
    q.awaitTermination(120)
    before = _view_rows(view)
    assert before == _direct(sink)
    # simulate the redelivery: same checkpoint, same (or older) bid
    batch = sink.changes(0)
    view._apply_stream_batch(batch, 0, ckpt)
    assert _view_rows(view) == before  # no double fold
    # a genuinely new batch id folds
    sink.merge(_cl(spark, [(2, "U", "r2", "b", "c2", "py", "yyy")]), 1)
    view._apply_stream_batch(sink.changes(1), 1, ckpt)
    assert _view_rows(view) == _direct(sink)


def test_null_group_values_merge_in_fold(spark, tmp_path):
    """A NULL grouping value is a real group: the state/delta fold
    must merge it (eqNullSafe), not accumulate phantom row pairs."""
    sink = _sink(spark, tmp_path)
    view = IncrementalAggView(
        spark, str(tmp_path / "v"),
        ["grp"], dict(MEASURES),
    )
    # group expression: NULL for repo r1 (nullable group column)
    view.group_cols = ["grp"]
    b1 = _cl(spark, [(1, "U", "r1", "a", "c1", "py", "xx"),
                     (2, "U", "r2", "b", "c2", "go", "yyy")])
    def rows():
        return sorted(
            (tuple(r) for r in view.state().collect()),
            key=lambda t: tuple((x is None, x) for x in t),
        )

    sink.merge(b1.withColumn(
        "grp", F.when(F.col("repo") != "r1", F.col("repo"))), 0)
    view.refresh(sink)
    assert (None, 1, 2) in rows()
    # delete the NULL-group row in a later epoch: the retraction must
    # land on the SAME null group and drop it
    sink.merge(_cl(spark, [(3, "D", "r1", "a", "c3", "py", "")])
               .withColumn("grp", F.lit(None).cast("string")), 1)
    view.refresh(sink)
    got = rows()
    assert all(r[0] is not None for r in got), got
    assert got == [("r2", 1, 3)]


def test_preimage_property_survives_other_sink_instances(spark, tmp_path):
    """cdf_preimage is persisted as a table property, so a DIFFERENT
    sink instance (the CLI resume backfill) regenerating a crash-lost
    feed writes the SAME shape — a preimage table must never get its
    feed durably poisoned without `_pre`."""
    import shutil as _sh

    sink = _sink(spark, tmp_path)
    sink.merge(_cl(spark, [(1, "U", "r1", "a", "c1", "py", "xx")]), 0)
    sink.merge(_cl(spark, [(2, "U", "r1", "a", "c2", "py", "yyy")]), 1)
    _sh.rmtree(os.path.join(sink.root, "_changes/epoch=000001"))
    # a flag-less instance (what `_build` makes on a CLI resume before
    # the operator remembered to set cdf_preimage in the TOML)
    plain = LakehouseSink(spark, sink.root, n_buckets=4,
                          emit_changes=True)
    assert plain.backfill_changes() == [1]
    assert "_pre" in plain.changes(1).columns
    feed = {r["_change"]: r for r in plain.changes(1).collect()}
    assert feed["U"]["_pre"]["content"] == "xx"


def test_stream_schema_merges_across_evolution(spark, tmp_path):
    """changes_stream must read the UNION schema of all epoch feeds —
    a plain footer-sampled schema would nondeterministically drop
    columns added in later epochs, diverging from batch refresh."""
    sink = _sink(spark, tmp_path)
    sink.merge(_cl(spark, [(1, "U", "r1", "a", "c1", "py", "xx")]), 0)
    b2 = _cl(spark, [(2, "U", "r1", "b", "c2", "py", "yy")]).withColumn(
        "lines", F.lit(3).cast("bigint")
    )
    sink.merge(b2, 1)
    cols = set(sink.changes_stream().schema.fieldNames())
    assert "lines" in cols and "_pre" in cols and "epoch" in cols


def test_mixed_drivers_refused(spark, tmp_path):
    """One view, one driver: a stream start on a view built by batch
    refresh (or on a DIFFERENT checkpoint) and a batch refresh on a
    stream-maintained view would each silently double-fold — both are
    refused loudly."""
    sink = _sink(spark, tmp_path)
    sink.merge(_cl(spark, [(1, "U", "r1", "a", "c1", "py", "xx")]), 0)
    batch_view = IncrementalAggView(spark, str(tmp_path / "v1"),
                                    ["repo"], dict(MEASURES))
    batch_view.refresh(sink)
    with pytest.raises(RuntimeError, match="re-fold"):
        batch_view.stream_refresh(sink, str(tmp_path / "ck1"))

    stream_view = IncrementalAggView(spark, str(tmp_path / "v2"),
                                     ["repo"], dict(MEASURES))
    q = stream_view.stream_refresh(sink, str(tmp_path / "ck2"))
    q.awaitTermination(120)
    with pytest.raises(RuntimeError, match="stream-maintained"):
        stream_view.refresh(sink)
    with pytest.raises(RuntimeError, match="re-fold"):
        stream_view.stream_refresh(sink, str(tmp_path / "ck3"))
    # the original checkpoint still works
    q = stream_view.stream_refresh(sink, str(tmp_path / "ck2"))
    q.awaitTermination(120)
    assert _view_rows(stream_view) == _direct(sink)


def test_fold_delta_drops_dead_groups_only_with_count(spark):
    delta = spark.createDataFrame(
        pd.DataFrame({"g": ["a", "b"], "n_rows": [0, 1],
                      "total_chars": [0, 5]})
    )
    kept = fold_delta(None, delta, ["g"], ["n_rows", "total_chars"],
                      count_col="n_rows")
    assert [r["g"] for r in kept.collect()] == ["b"]
    both = fold_delta(None, delta, ["g"], ["n_rows", "total_chars"],
                      count_col=None)
    assert both.count() == 2


def test_count_live_helper():
    col = count_live()(lambda n: F.col(n))
    assert "1" in str(col)
