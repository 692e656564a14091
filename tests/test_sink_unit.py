"""Unit-level MERGE semantics: seq guards, tombstones, compaction,
schema promotion — direct sink API, no generator."""

import pytest
from pyspark.sql import functions as F

from atlas_spark.sinks import LakehouseSink
from atlas_spark.sinks.lakehouse import _promote

COLS = ["seq", "op", "repo", "path", "commit", "lang", "content"]


def _df(spark, rows):
    return spark.createDataFrame(
        [tuple(r) for r in rows],
        "seq bigint, op string, repo string, path string, commit string, "
        "lang string, content string",
    )


def _mk(spark, tmp_path, n_buckets=4):
    sink = LakehouseSink(spark, str(tmp_path / "t"), n_buckets=n_buckets)
    sink.ensure()
    return sink


def test_lww_within_batch(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.merge(
        _df(spark, [
            [1, "I", "r", "a", "c1", "py", "v1"],
            [3, "U", "r", "a", "c3", "py", "v3"],
            [2, "U", "r", "a", "c2", "py", "v2"],
        ]),
        0,
    )
    rows = sink.read().collect()
    assert len(rows) == 1
    assert rows[0]["commit"] == "c3" and rows[0]["seq"] == 3


def test_cross_batch_guard_rejects_older(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.merge(_df(spark, [[5, "U", "r", "a", "c5", "py", "v5"]]), 0)
    # later batch delivers an OLDER update — must not regress
    sink.merge(_df(spark, [[4, "U", "r", "a", "c4", "py", "v4"]]), 1)
    rows = sink.read().collect()
    assert rows[0]["commit"] == "c5"


def test_cross_batch_late_delete_loses(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.merge(_df(spark, [[7, "U", "r", "a", "c7", "py", "v7"]]), 0)
    sink.merge(_df(spark, [[6, "D", "r", "a", "c6", "py", "v6"]]), 1)
    assert sink.read().count() == 1


def test_delete_then_smaller_upsert_stays_deleted(spark, tmp_path):
    """Tombstone with seq 9 must reject a later-arriving upsert seq 8 —
    this is WHY tombstones are kept physically (SURVEY.md §7.3)."""
    sink = _mk(spark, tmp_path)
    sink.merge(_df(spark, [[8, "I", "r", "a", "c8", "py", "v8"]]), 0)
    sink.merge(_df(spark, [[9, "D", "r", "a", None, None, None]]), 1)
    assert sink.read().count() == 0
    sink.merge(_df(spark, [[8, "U", "r", "a", "c8", "py", "v8"]]), 2)
    assert sink.read().count() == 0  # still deleted
    sink.merge(_df(spark, [[10, "U", "r", "a", "cA", "py", "vA"]]), 3)
    rows = sink.read().collect()
    assert len(rows) == 1 and rows[0]["commit"] == "cA"


def test_delete_nonexistent_key_creates_tombstone(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.merge(_df(spark, [[3, "D", "r", "ghost", None, None, None]]), 0)
    assert sink.read().count() == 0
    assert sink.read(include_tombstones=True).count() == 1


def test_compaction_drops_tombstones_keeps_state(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.merge(
        _df(spark, [
            [1, "I", "r", "a", "c1", "py", "v1"],
            [2, "I", "r", "b", "c2", "py", "v2"],
        ]),
        0,
    )
    sink.merge(_df(spark, [[3, "D", "r", "a", None, None, None]]), 1)
    assert sink.read(include_tombstones=True).count() == 2
    before = {r["path"]: r["commit"] for r in sink.read().collect()}
    sink.compact()  # mid-stream default: tombstones survive
    assert sink.read(include_tombstones=True).count() == 2
    sink.compact(drop_tombstones=True)  # end-of-replay
    assert sink.read(include_tombstones=True).count() == 1
    after = {r["path"]: r["commit"] for r in sink.read().collect()}
    assert before == after == {"b": "c2"}


def test_sha256_matches_builtin(spark, tmp_path):
    import hashlib
    sink = _mk(spark, tmp_path)
    sink.merge(_df(spark, [[1, "I", "r", "a", "c1", "py", "hello world"]]), 0)
    row = sink.read().collect()[0]
    assert row["content_sha256"] == hashlib.sha256(b"hello world").hexdigest()


def test_mixed_schema_batches_union(spark, tmp_path):
    """Batch 2 carries an evolved column absent from batch 1: old rows
    surface it as null, manifest schema widens."""
    sink = _mk(spark, tmp_path)
    sink.merge(_df(spark, [[1, "I", "r", "a", "c1", "py", "v1"]]), 0)
    b2 = _df(spark, [[2, "I", "r", "b", "c2", "py", "v2"]]).withColumn(
        "lines", F.lit(12).cast("int")
    )
    sink.merge(b2, 1)
    out = {r["path"]: r["lines"] for r in sink.read().collect()}
    assert out == {"a": None, "b": 12}
    # widen int→bigint in a later batch
    b3 = _df(spark, [[3, "U", "r", "a", "c3", "py", "v3"]]).withColumn(
        "lines", F.lit(5_000_000_000).cast("bigint")
    )
    sink.merge(b3, 2)
    out = {r["path"]: r["lines"] for r in sink.read().collect()}
    assert out == {"a": 5_000_000_000, "b": 12}
    types = dict(tuple(x) for x in sink.manifest()["schema"])
    assert types["lines"] == "bigint"


def test_promote_lattice():
    assert _promote("integer", "bigint") == "bigint"
    assert _promote("bigint", "double") == "double"
    assert _promote("string", "string") == "string"
    with pytest.raises(ValueError):
        _promote("string", "bigint")


def test_bucket_pruning_untouched_files_not_rewritten(spark, tmp_path):
    """A merge touching one key must not rewrite buckets it doesn't
    touch — the manifest keeps their old file paths verbatim."""
    sink = _mk(spark, tmp_path, n_buckets=8)
    rows = [[i, "I", f"r{i}", f"p{i}", f"c{i}", "py", f"v{i}"] for i in range(50)]
    sink.merge(_df(spark, rows), 0)
    files_before = dict(sink.manifest()["files"])
    sink.merge(_df(spark, [[100, "U", "r1", "p1", "cX", "py", "vX"]]), 1)
    files_after = dict(sink.manifest()["files"])
    changed = [b for b in files_before if files_before[b] != files_after.get(b)]
    assert len(changed) == 1  # exactly the bucket of (r1, p1)
    row = [r for r in sink.read().collect() if r["path"] == "p1"][0]
    assert row["commit"] == "cX"


def test_n_buckets_pinned_to_manifest(spark, tmp_path):
    """A sink reopened with a different n_buckets must follow the
    table's manifest — bucket mapping is a storage property."""
    s1 = LakehouseSink(spark, str(tmp_path / "t"), n_buckets=8)
    s1.ensure()
    s1.merge(_df(spark, [[1, "I", "r", "a", "c1", "py", "v1"]]), 0)
    s2 = LakehouseSink(spark, str(tmp_path / "t"), n_buckets=32)  # wrong
    s2.merge(_df(spark, [[2, "U", "r", "a", "c2", "py", "v2"]]), 1)
    assert s2.n_buckets == 8
    rows = s2.read().collect()
    assert len(rows) == 1 and rows[0]["commit"] == "c2"


def test_bulk_load_fallback_no_broadcast(spark, tmp_path):
    """Batches whose key count exceeds broadcast_key_limit take the
    shuffle path — identical semantics (guards, tombstones)."""
    sink = LakehouseSink(spark, str(tmp_path / "t"), n_buckets=4,
                         broadcast_key_limit=2)
    sink.ensure()
    rows0 = [[i, "I", f"r{i % 3}", f"p{i}", f"c{i}", "py", f"v{i}"] for i in range(10)]
    sink.merge(_df(spark, rows0), 0)
    # big second batch (> limit) with an older update and a delete
    rows1 = [[i + 100, "U", f"r{i % 3}", f"p{i}", f"cn{i}", "py", f"w{i}"] for i in range(8)]
    rows1.append([3, "U", "r0", "p0", "cOLD", "py", "old"])   # older → rejected
    rows1.append([200, "D", "r1", "p1", None, None, None])    # delete wins
    sink.merge(_df(spark, rows1), 1)
    got = {r["path"]: r["commit"] for r in sink.read().collect()}
    assert got["p0"] == "cn0"          # newer batch row won over both
    assert "p1" not in got             # deleted
    assert got["p9"] == "c9"           # untouched key passed through
    assert got["p5"] == "cn5"


def test_time_travel_read(spark, tmp_path):
    """Every manifest version stays readable — snapshot isolation for
    audits/debug (Iceberg time-travel analog)."""
    sink = _mk(spark, tmp_path)
    sink.merge(_df(spark, [[1, "I", "r", "a", "c1", "py", "v1"]]), 0)
    v1 = sink.manifest()["version"]
    sink.merge(_df(spark, [[2, "U", "r", "a", "c2", "py", "v2"]]), 1)
    assert sink.read().collect()[0]["commit"] == "c2"
    old = sink.read(version=v1).collect()
    assert len(old) == 1 and old[0]["commit"] == "c1"


def test_bulk_fallback_engages_and_matches(spark, tmp_path):
    """Above broadcast_key_limit the merge must switch to the bulk
    single-shuffle shape with IDENTICAL semantics (same winners, same
    watermarks) — and report which path it took."""
    rows = []
    for i in range(40):
        rows.append([i * 10 + 1, "I", f"r{i % 4}", f"p{i}", f"c{i}a", "py", f"v{i}a"])
        rows.append([i * 10 + 2, "U", f"r{i % 4}", f"p{i}", f"c{i}b", "py", f"v{i}b"])
    small = LakehouseSink(spark, str(tmp_path / "small"), n_buckets=4,
                          broadcast_key_limit=1_000_000)
    bulk = LakehouseSink(spark, str(tmp_path / "bulk"), n_buckets=4,
                         broadcast_key_limit=10)
    small.ensure(); bulk.ensure()
    m1 = small.merge(_df(spark, rows), 0)
    m2 = bulk.merge(_df(spark, rows), 0)
    assert m1["merge_path"] == "broadcast"
    assert m2["merge_path"] == "bulk"
    assert m1["bucket_watermarks"] == m2["bucket_watermarks"]
    a = sorted(tuple(r) for r in small.read().select(*COLS[2:4], "seq", "commit", "content").collect())
    b = sorted(tuple(r) for r in bulk.read().select(*COLS[2:4], "seq", "commit", "content").collect())
    assert a == b and len(a) == 40


def test_tie_same_seq_op_deterministic_commit_asc(spark, tmp_path):
    """A producer emitting DIFFERENT payloads at the same (key, seq, op)
    must resolve deterministically (commit ASC) on BOTH merge paths —
    replaying twice must yield byte-identical tables."""
    rows = [
        [5, "U", "r", "a", "c_zz", "py", "v_zz"],
        [5, "U", "r", "a", "c_aa", "py", "v_aa"],
        [5, "U", "r", "a", "c_mm", "py", "v_mm"],
    ]
    for limit, expect_path in [(1_000_000, "broadcast"), (0, "bulk")]:
        sink = LakehouseSink(spark, str(tmp_path / f"t{limit}"), n_buckets=2,
                             broadcast_key_limit=limit)
        sink.ensure()
        m = sink.merge(_df(spark, rows), 0)
        assert m["merge_path"] == expect_path
        r = sink.read().collect()
        assert len(r) == 1 and r[0]["commit"] == "c_aa" and r[0]["content"] == "v_aa"


def test_derived_broadcast_key_limit_is_bounded(spark, tmp_path):
    """Default limit derives from the driver heap: floor 200k, cap 4M."""
    sink = LakehouseSink(spark, str(tmp_path / "t"))
    assert 200_000 <= sink.broadcast_key_limit <= 4_000_000


def test_merge_leaves_no_cached_rdds(spark, tmp_path):
    """Regression guard for the r01 cache leak (unpersist on a
    post-drop plan was a no-op; leaked cache inflated every bench
    number).  A merge must add ZERO persistent RDDs.  Measured as a
    DELTA: other tests in the shared session legitimately hold
    localCheckpoint RDDs (e.g. incremental-view states) until the
    ContextCleaner collects them."""
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    sink = _mk(spark, tmp_path)
    sink.merge(_df(spark, [[1, "I", "r", "a", "c1", "py", "v1"],
                           [2, "U", "r", "b", "c2", "py", "v2"]]), 0)
    sink.merge(_df(spark, [[3, "U", "r", "a", "c3", "py", "v3"]]), 1)
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert after <= before, f"{after - before} persistent RDDs leaked"


def test_declared_columns_skip_probe_and_store_values(spark, tmp_path):
    """DDL-ensure with declared evolved columns: values land typed from
    epoch 0 with ZERO presence-probe jobs (the runner's known_cols
    covers declared columns), identical final state to dynamic
    evolution."""
    from atlas_spark.streaming import ReplayRunner
    from atlas_spark.changelog import ChangelogSpec, generate_changelog, write_changelog

    cl = generate_changelog(ChangelogSpec(n_events=300, n_repos=3,
                                          paths_per_repo=6,
                                          schema_evolution=True))
    log = str(tmp_path / "log")
    write_changelog(cl, log, n_files=2)

    dyn = LakehouseSink(spark, str(tmp_path / "dyn"), n_buckets=2)
    dyn.ensure()
    ReplayRunner(spark, dyn, files_per_epoch=1).run(log)

    decl = LakehouseSink(spark, str(tmp_path / "decl"), n_buckets=2)
    decl.ensure(declared_columns=[("lines", "bigint"),
                                  ("committer", "string")])
    assert {n for n, _ in (tuple(x) for x in decl.manifest()["schema"])} >= {
        "lines", "committer"
    }
    ReplayRunner(spark, decl, files_per_epoch=1).run(log)

    cols = ["repo", "path", "seq", "content", "lines", "committer"]
    a = sorted(tuple(r) for r in dyn.read().select(*cols).collect())
    b = sorted(tuple(r) for r in decl.read().select(*cols).collect())
    assert a == b and len(a) > 0


def test_backtick_in_declared_column_name(spark, tmp_path):
    """ADVICE r05 #3: the fused merge SQL interpolates manifest column
    names into backtick-quoted identifiers — a declared name containing
    a backtick must be escaped (`` ` `` → ```` `` ````), not break or
    alter the statement.  Exercised on broadcast AND bulk existing-side
    shapes (second merge hits the fused SQL with files present)."""
    for limit, path_name in [(1_000_000, "broadcast"), (0, "bulk")]:
        sink = LakehouseSink(spark, str(tmp_path / path_name), n_buckets=2,
                             broadcast_key_limit=limit)
        sink.ensure(declared_columns=[("odd`col", "string")])
        sink.merge(_df(spark, [[1, "I", "r", "a", "c1", "py", "v1"]]), 0)
        m = sink.merge(_df(spark, [[2, "U", "r", "a", "c2", "py", "v2"],
                                   [3, "I", "r", "b", "c3", "py", "v3"]]), 1)
        assert m["merge_path"] == path_name
        rows = {(r["repo"], r["path"]): r for r in sink.read().collect()}
        assert rows[("r", "a")]["commit"] == "c2"
        assert rows[("r", "b")]["commit"] == "c3"
        assert rows[("r", "a")]["odd`col"] is None


def test_null_key_rows_dropped_identically_on_both_paths(spark, tmp_path):
    """Rows with a NULL key column (quarantine's job upstream) are
    DROPPED by the merge, with identical stats, on the broadcast AND
    bulk paths — not an accident of join-vs-groupBy NULL semantics."""
    rows = [
        [1, "I", "r", "a", "c1", "py", "v1"],
        [2, "I", None, "b", "c2", "py", "v2"],   # null repo
        [3, "I", "r", None, "c3", "py", "v3"],   # null path
    ]
    for limit, path_name in [(1_000_000, "broadcast"), (0, "bulk")]:
        sink = LakehouseSink(spark, str(tmp_path / path_name), n_buckets=2,
                             broadcast_key_limit=limit)
        sink.ensure()
        m = sink.merge(_df(spark, rows), 0)
        assert m["merge_path"] == path_name
        got = [tuple(r) for r in sink.read().select("repo", "path").collect()]
        assert got == [("r", "a")], (path_name, got)
        assert m["rows_in"] == 1 and m["upserts"] == 1, (path_name, m)


def test_snapshot_diff_change_data_feed(spark, tmp_path):
    """diff(v_from, v_to) emits exactly the I/U/D set between two
    committed snapshots; byte-identical re-upserts are NOT changes."""
    sink = _mk(spark, tmp_path)
    sink.merge(_df(spark, [
        [1, "I", "r", "a", "c1", "py", "va"],
        [2, "I", "r", "b", "c2", "py", "vb"],
        [3, "I", "r", "c", "c3", "py", "vc"],
    ]), 0)
    v1 = sink.manifest()["version"]
    sink.merge(_df(spark, [
        [10, "U", "r", "b", "cB", "py", "vb2"],   # content change → U
        [11, "D", "r", "c", None, None, None],    # delete → D
        [12, "I", "r", "d", "cD", "py", "vd"],    # new key → I
        [13, "U", "r", "a", "cA", "py", "va"],    # same bytes → no change
    ]), 1)
    v2 = sink.manifest()["version"]

    got = {(r["_change"], r["path"]): r for r in sink.diff(v1, v2).collect()}
    assert set(got) == {("U", "b"), ("D", "c"), ("I", "d")}
    assert got[("U", "b")]["content"] == "vb2"
    assert got[("I", "d")]["commit"] == "cD"
    assert sink.diff(v1, v1).count() == 0
    assert {r["_change"] for r in sink.diff(0, v2).collect()} == {"I"}


def test_emitted_cdf_matches_diff_on_multiepoch_replay(spark, tmp_path):
    """VERDICT r05 #7 oracle twin: with ``emit_changes=True`` every
    committed merge writes its change rows up front; for EVERY epoch of
    a multi-epoch replay (deletes, duplicates, out-of-order) the
    emitted feed must equal ``diff(v-1, v)`` row-for-row, and the
    pre-image identity columns must match the prior snapshot."""
    from atlas_spark.changelog import (
        ChangelogSpec, generate_changelog, write_changelog,
    )
    from atlas_spark.streaming import ReplayRunner

    cl = generate_changelog(ChangelogSpec(
        n_events=800, n_repos=6, paths_per_repo=10, delete_frac=0.1,
        duplicate_frac=0.05, out_of_order_deletes=2,
    ))
    log = str(tmp_path / "log")
    write_changelog(cl, log, n_files=8)
    sink = LakehouseSink(spark, str(tmp_path / "t"), n_buckets=4,
                         emit_changes=True)
    sink.ensure()
    ReplayRunner(spark, sink, files_per_epoch=2).run(log)
    head = sink.manifest()["version"]
    assert head >= 3  # genuinely multi-epoch

    compared = 0
    pre_cols = ["_pre_content_sha256", "_pre_seq"]
    for v in range(1, head + 1):
        ep = sink.manifest(version=v)["epoch_id"]
        if ep < 0:
            continue
        emitted_rows = sink.changes(ep).collect()
        emitted = sorted(
            tuple(r) for r in sink.changes(ep).drop(*pre_cols).collect()
        )
        via_diff = sorted(tuple(r) for r in sink.diff(v - 1, v).collect())
        assert emitted == via_diff, f"epoch {ep} (version {v})"
        prev = {
            (r["repo"], r["path"]): r
            for r in sink.read(include_tombstones=True,
                               version=v - 1).collect()
        }
        for r in emitted_rows:
            k = (r["repo"], r["path"])
            if r["_change"] in ("U", "D"):
                assert r["_pre_content_sha256"] == prev[k]["content_sha256"]
                assert r["_pre_seq"] == prev[k]["seq"]
            else:  # I — key must not have been live before
                assert k not in prev or prev[k]["is_deleted"]
        compared += 1
    assert compared >= 3


def test_emit_changes_rejected_on_mor():
    import pytest

    with pytest.raises(ValueError, match="requires mode"):
        LakehouseSink(None, "/tmp/x", mode="mor", emit_changes=True)


def test_parse_mem_bytes_spark_formats():
    """ADVICE r03: every format Spark's JavaUtils.byteStringAs accepts
    must parse (two-letter suffixes, fractional values), and garbage
    must return None (constructor falls back to the 2M default)."""
    from atlas_spark.sinks.lakehouse import _parse_mem_bytes

    g = 1 << 30
    assert _parse_mem_bytes("2g") == 2 * g
    assert _parse_mem_bytes("2gb") == 2 * g
    assert _parse_mem_bytes("512mb") == 512 << 20
    assert _parse_mem_bytes("1024kb") == 1024 << 10
    assert _parse_mem_bytes("1.5g") == 1.5 * g
    assert _parse_mem_bytes(" 4G ") == 4 * g
    # unitless = MiB, matching Spark's getSizeAsMb reading of a bare
    # spark.driver.memory (ADVICE r04: bytes-reading floored the
    # broadcast limit for '4096'); explicit 'b' suffix = bytes
    assert _parse_mem_bytes("3000") == 3000 << 20
    assert _parse_mem_bytes("4096b") == 4096.0
    assert _parse_mem_bytes("notamem") is None
    assert _parse_mem_bytes("") is None
