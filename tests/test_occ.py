"""Multi-writer optimistic concurrency on the manifest commit
(VERDICT r03 #2: `_write_manifest` used to `os.replace` the CURRENT
pointer unconditionally — two concurrent committers both claimed
version N+1 and the loser's commit was silently clobbered; the Delta
paper §3.2 protocol the sink cites requires put-if-absent + rebase.
Reference analog: DB-native ``ON CONFLICT``,
postgresql/adapter.rs:133-144).

The races are driven DETERMINISTICALLY: the loser's `_try_publish` is
wrapped so a competing commit lands between its manifest read and its
publish attempt — the exact interleaving a background compaction
service racing the ingest runner produces.
"""

import json
import os

from atlas_spark.sinks import LakehouseSink

from tests.test_sink_unit import _df, _mk


def _interleave(loser_sink, competing_commit):
    """Arrange for `competing_commit()` to run immediately before the
    loser's FIRST publish attempt (i.e. after it read the manifest and
    decided on a version) — the classic lost-update window."""
    orig = loser_sink._try_publish
    state = {"fired": False}

    def raced(m):
        if not state["fired"]:
            state["fired"] = True
            competing_commit()
        return orig(m)

    loser_sink._try_publish = raced
    return state


def test_versions_are_put_if_absent(spark, tmp_path):
    """Directly claiming an existing version must fail, not clobber."""
    sink = _mk(spark, tmp_path)
    sink.merge(_df(spark, [[1, "I", "r", "a", "c1", "py", "v1"]]), 0)
    m = sink.manifest()
    before = json.dumps(m, sort_keys=True)
    assert sink._try_publish(dict(m, stats={"rows": 999})) is False
    assert json.dumps(sink.manifest(), sort_keys=True) == before


def test_current_pointer_never_regresses(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.merge(_df(spark, [[1, "I", "r", "a", "c1", "py", "v1"]]), 0)
    v = sink.manifest()["version"]
    sink.commit_store.advance_pointer(v - 1)  # laggard finishing late
    assert sink.manifest()["version"] == v


def test_reader_probes_past_stale_pointer(spark, tmp_path):
    """CURRENT is a hint: a commit whose pointer update hasn't landed
    (crash / laggard) must still be visible — the exclusively-created
    manifest files are the commit log."""
    sink = _mk(spark, tmp_path)
    sink.merge(_df(spark, [[1, "I", "r", "a", "c1", "py", "v1"]]), 0)
    m = sink.manifest()
    m2 = dict(m, version=m["version"] + 1, stats={"rows": 41})
    assert sink.commit_store.put_if_absent(
        sink._manifest_name(m2["version"]), json.dumps(m2).encode()
    )
    # pointer still names the old version on disk
    assert sink.commit_store.read_pointer() == m["version"]
    assert sink.manifest()["version"] == m2["version"]


def test_ingest_wins_compact_rebases_and_drops_conflicts(spark, tmp_path):
    """THE race from the verdict: a compaction service racing the
    ingest runner.  Compact reads the manifest, rewrites buckets, and
    loses the version CAS to an ingest epoch that touched one of them.
    It must rebase: keep the ingest's entry for the conflicted bucket
    (its rewrite there is stale) and still install the others.  No
    committed version may be lost."""
    # merge-on-read so bucket files ACCUMULATE across epochs (cow
    # replaces them — nothing to compact after 2 epochs)
    sink = LakehouseSink(spark, str(tmp_path / "t"), n_buckets=4, mode="mor")
    sink.ensure()
    rows0 = [[i, "I", "r", f"p{i}", f"c{i}", "py", f"v{i}"] for i in range(16)]
    rows1 = [[100 + i, "U", "r", f"p{i}", f"d{i}", "py", f"w{i}"]
             for i in range(16)]
    sink.merge(_df(spark, rows0), 0)
    sink.merge(_df(spark, rows1), 1)
    v_before = sink.manifest()["version"]

    ingest = LakehouseSink(spark, sink.root, n_buckets=4)
    new_row = [[200, "I", "r", "p0", "e0", "py", "x0"]]  # touches 1 bucket

    def competing():
        ingest.merge(_df(spark, new_row), 2)

    _interleave(sink, competing)
    res = sink.compact(max_file_versions=1)

    m = sink.manifest()
    # both commits are present, versions strictly sequential
    assert m["version"] == v_before + 2
    assert m["committed_epoch_max"] == 2  # the ingest epoch survived
    # the ingest row is in the final state (the old code clobbered it)
    state = {r["path"]: r["commit"] for r in sink.read().collect()}
    assert state["p0"] == "e0"
    assert state["p1"] == "d1"
    # the conflicted bucket kept the ingest's files; at least one other
    # bucket was actually compacted
    assert 1 <= res["buckets"] <= 3, res
    one = spark.createDataFrame([("r", "p0")], "repo string, path string")
    touched = str(one.select(ingest._bucket_expr().alias("b"))
                  .collect()[0]["b"])
    assert len(m["files"][touched]) > 1            # left for next pass
    compacted = [b for b, fl in m["files"].items()
                 if b != touched and len(fl) == 1]
    assert compacted, m["files"]


def test_compact_wins_ingest_rebases_on_top(spark, tmp_path):
    """Mirror race: ingest loses the CAS to a concurrent compaction.
    The epoch must commit at the next version ON TOP of the compacted
    layout — state equals a serial run, nothing lost."""
    sink = _mk(spark, tmp_path, n_buckets=4)
    rows0 = [[i, "I", "r", f"p{i}", f"c{i}", "py", f"v{i}"] for i in range(16)]
    rows1 = [[100 + i, "U", "r", f"p{i}", f"d{i}", "py", f"w{i}"]
             for i in range(16)]
    sink.merge(_df(spark, rows0), 0)
    sink.merge(_df(spark, rows1), 1)

    compactor = LakehouseSink(spark, sink.root, n_buckets=4)

    _interleave(sink, lambda: compactor.compact())
    sink.merge(_df(spark, [[200, "U", "r", "p3", "e3", "py", "x3"]]), 2)

    m = sink.manifest()
    assert m["committed_epoch_max"] == 2
    state = {r["path"]: r["commit"] for r in sink.read().collect()}
    assert state["p3"] == "e3"                 # the racing epoch
    assert state["p1"] == "d1"                 # pre-compaction history
    assert len(state) == 16
    # epoch fencing still intact after the rebase
    assert sink.merge(
        _df(spark, [[300, "U", "r", "p3", "f3", "py", "y3"]]), 2
    )["skipped"] is True


def test_same_epoch_double_commit_fenced_under_race(spark, tmp_path):
    """Two runners applying the SAME epoch concurrently: the loser's
    rebase re-checks the fence and reports skipped — exactly-once even
    when both passed the pre-merge fence check."""
    sink = _mk(spark, tmp_path, n_buckets=4)
    sink.merge(_df(spark, [[1, "I", "r", "a", "c1", "py", "v1"]]), 0)

    other = LakehouseSink(spark, sink.root, n_buckets=4)
    batch = [[2, "U", "r", "a", "c2", "py", "v2"]]

    _interleave(sink, lambda: other.merge(_df(spark, batch), 1))
    res = sink.merge(_df(spark, batch), 1)
    assert res["skipped"] is True
    assert sink.manifest()["committed_epoch_max"] == 1
    rows = sink.read().collect()
    assert len(rows) == 1 and rows[0]["commit"] == "c2"


def test_no_partial_manifest_visible(spark, tmp_path):
    """Manifests appear atomically (tmp + fsync + link): every
    manifest file in the dir parses as complete JSON with a files map,
    and no tmp files leak after commits."""
    sink = _mk(spark, tmp_path)
    for e in range(3):
        sink.merge(
            _df(spark, [[e + 1, "U", "r", "a", f"c{e}", "py", f"v{e}"]]), e
        )
    mdir = sink._manifest_dir
    for entry in os.listdir(mdir):
        assert not entry.startswith(".tmp."), entry
        if entry.startswith("manifest."):
            with open(os.path.join(mdir, entry)) as f:
                m = json.load(f)
            assert "files" in m and "version" in m


def test_merge_schema_rebase_union():
    """The rebase schema merge: base order preserved, type conflicts
    promoted through the widening lattice, new columns appended."""
    from atlas_spark.sinks.lakehouse import LakehouseSink

    base = [["repo", "string"], ["lines", "int"], ["a", "string"]]
    extra = [["lines", "bigint"], ["b", "double"], ["repo", "string"]]
    merged = LakehouseSink._merge_schema(base, extra)
    assert merged == [
        ["repo", "string"], ["lines", "bigint"], ["a", "string"],
        ["b", "double"],
    ]
    # commutes on the shared columns (order differs, content agrees)
    m2 = LakehouseSink._merge_schema(extra, base)
    assert dict(map(tuple, m2)) == dict(map(tuple, merged))
