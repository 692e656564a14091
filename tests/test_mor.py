"""Merge-on-read mode: identical semantics to copy-on-write (same
oracle), O(batch) write path (merges never read existing data), and
correct version-resolution at read + compaction."""

from atlas_spark.changelog import ChangelogSpec, generate_changelog, write_changelog
from atlas_spark.sinks import LakehouseSink
from atlas_spark.streaming import ControlTables, ReplayRunner

from tests.test_replay_core import check_against_oracle
from tests.test_sink_unit import _df


def test_mor_replay_matches_oracle(spark, tmp_path):
    spec = ChangelogSpec(
        n_events=1600, n_repos=10, paths_per_repo=25,
        delete_frac=0.10, out_of_order_deletes=10, duplicate_frac=0.02,
        schema_evolution=True,
    )
    changelog = generate_changelog(spec)
    log_dir = str(tmp_path / "log")
    write_changelog(changelog, log_dir, n_files=8)

    root = str(tmp_path / "t")
    sink = LakehouseSink(spark, root, n_buckets=8, mode="mor")
    sink.ensure()
    runner = ReplayRunner(spark, sink, ControlTables(root), files_per_epoch=2)
    runner.run(log_dir)
    check_against_oracle(spark, sink, changelog)

    # mid-stream compaction folds versions, keeps tombstones, state same
    sink.compact()
    check_against_oracle(spark, sink, changelog)
    m = sink.manifest()
    assert max(len(fl) for fl in m["files"].values()) == 1

    # end-of-replay compaction drops tombstones, state still same
    sink.compact(drop_tombstones=True)
    check_against_oracle(spark, sink, changelog)
    assert sink.read(include_tombstones=True).count() == sink.read().count()


def test_mor_merge_appends_keep_old_files(spark, tmp_path):
    """In MoR the merge appends version files; prior files stay
    listed in the manifest (append, not rewrite)."""
    sink = LakehouseSink(spark, str(tmp_path / "t"), n_buckets=4, mode="mor")
    sink.ensure()
    sink.merge(_df(spark, [[1, "I", "r", "a", "c1", "py", "v1"]]), 0)
    files_v1 = dict(sink.manifest()["files"])
    sink.merge(_df(spark, [[2, "U", "r", "a", "c2", "py", "v2"]]), 1)
    files_v2 = dict(sink.manifest()["files"])
    # old file still listed (append, not rewrite)
    for b, fl in files_v1.items():
        assert set(fl) <= set(files_v2.get(b, []))
    rows = sink.read().collect()
    assert len(rows) == 1 and rows[0]["commit"] == "c2"


def test_mor_guard_semantics(spark, tmp_path):
    sink = LakehouseSink(spark, str(tmp_path / "t"), n_buckets=4, mode="mor")
    sink.ensure()
    sink.merge(_df(spark, [[5, "U", "r", "a", "c5", "py", "v5"]]), 0)
    sink.merge(_df(spark, [[4, "U", "r", "a", "c4", "py", "v4"]]), 1)  # older
    assert sink.read().collect()[0]["commit"] == "c5"
    sink.merge(_df(spark, [[9, "D", "r", "a", None, None, None]]), 2)
    assert sink.read().count() == 0
    sink.merge(_df(spark, [[8, "U", "r", "a", "c8", "py", "v8"]]), 3)  # late
    assert sink.read().count() == 0          # tombstone still wins
    sink.merge(_df(spark, [[10, "U", "r", "a", "cA", "py", "vA"]]), 4)
    assert sink.read().collect()[0]["commit"] == "cA"


def test_mor_mode_pinned_to_manifest(spark, tmp_path):
    s1 = LakehouseSink(spark, str(tmp_path / "t"), n_buckets=4, mode="mor")
    s1.ensure()
    s1.merge(_df(spark, [[1, "I", "r", "a", "c1", "py", "v1"]]), 0)
    s2 = LakehouseSink(spark, str(tmp_path / "t"), n_buckets=4)  # default cow
    s2.merge(_df(spark, [[2, "U", "r", "a", "c2", "py", "v2"]]), 1)
    assert s2.mode == "mor"
    assert s2.read().collect()[0]["commit"] == "c2"


def test_mor_resume(spark, tmp_path):
    spec = ChangelogSpec(n_events=800, n_repos=6, paths_per_repo=12,
                         delete_frac=0.08)
    changelog = generate_changelog(spec)
    log_dir = str(tmp_path / "log")
    write_changelog(changelog, log_dir, n_files=4)
    root = str(tmp_path / "t")
    sink = LakehouseSink(spark, root, n_buckets=4, mode="mor")
    sink.ensure()
    ReplayRunner(spark, sink, files_per_epoch=2).run(
        log_dir, stop_after_epochs=1
    )
    sink2 = LakehouseSink(spark, root, n_buckets=4)
    ReplayRunner(spark, sink2, files_per_epoch=2).run(log_dir)
    check_against_oracle(spark, sink2, changelog)


def test_mor_merge_never_reads_existing(spark, tmp_path, monkeypatch):
    """The structural property behind MoR's cost model: a MoR merge is
    election + append — it must NEVER read existing table files (CoW
    with existing data must).  Pinned here because the bench-scale
    table is too small for the asymmetry to show up in wall time."""
    from atlas_spark.sinks import LakehouseSink
    from atlas_spark.sinks.lakehouse import LakehouseSink as LS

    calls = {"n": 0}
    orig = LS._read_files

    def counting(self, files, schema_fields, spark=None):
        calls["n"] += 1
        return orig(self, files, schema_fields, spark)

    monkeypatch.setattr(LS, "_read_files", counting)

    def df(rows):
        return spark.createDataFrame(
            rows,
            "seq bigint, op string, repo string, path string, "
            "commit string, lang string, content string",
        )

    batch0 = [(1, "I", "r", f"p{i}", "c1", "py", f"v{i}") for i in range(8)]
    batch1 = [(2, "U", "r", f"p{i}", "c2", "py", f"w{i}") for i in range(8)]

    mor = LakehouseSink(spark, str(tmp_path / "mor"), n_buckets=2, mode="mor")
    mor.ensure()
    mor.merge(df(batch0), 0)
    mor.merge(df(batch1), 1)  # existing data present — still no read
    assert calls["n"] == 0, "MoR merge scanned the existing side"

    cow = LakehouseSink(spark, str(tmp_path / "cow"), n_buckets=2, mode="cow")
    cow.ensure()
    cow.merge(df(batch0), 0)
    cow.merge(df(batch1), 1)
    assert calls["n"] >= 1, "CoW merge with existing data must read it"

    # same final state either way
    a = sorted(tuple(r) for r in mor.read().select("path", "seq", "content").collect())
    b = sorted(tuple(r) for r in cow.read().select("path", "seq", "content").collect())
    assert a == b


def test_selective_compaction_rewrites_only_overversioned_buckets(spark, tmp_path):
    """compact(max_file_versions=K) must fold ONLY buckets holding
    more than K files; untouched buckets keep their manifest entries
    verbatim; table state is identical before/after."""
    from atlas_spark.sinks import LakehouseSink

    sink = LakehouseSink(spark, str(tmp_path / "t"), n_buckets=4, mode="mor")
    sink.ensure()

    def df(seq, paths):
        return spark.createDataFrame(
            [(seq, "U", "r", p, f"c{seq}", "py", f"v{seq}-{p}") for p in paths],
            "seq bigint, op string, repo string, path string, commit string, "
            "lang string, content string",
        )

    # epoch 0 touches many keys; epochs 1-3 hammer ONE key → its
    # bucket accumulates versions, the others stay at 1 file
    sink.merge(df(1, [f"p{i}" for i in range(12)]), 0)
    for e in range(1, 4):
        sink.merge(df(e + 1, ["p0"]), e)
    m_before = sink.manifest()
    hot = [b for b, fl in m_before["files"].items() if len(fl) > 1]
    cold = [b for b, fl in m_before["files"].items() if len(fl) == 1]
    assert hot and cold
    before = sorted(tuple(r) for r in sink.read()
                    .select("path", "seq", "content").collect())

    res = sink.compact(max_file_versions=1)
    m_after = sink.manifest()
    assert res["buckets"] == len(hot)
    for b in cold:  # untouched buckets: file lists verbatim
        assert m_after["files"][b] == m_before["files"][b]
    for b in hot:   # folded buckets: one file, new path
        assert len(m_after["files"][b]) == 1
        assert m_after["files"][b] != m_before["files"][b]
    after = sorted(tuple(r) for r in sink.read()
                   .select("path", "seq", "content").collect())
    assert before == after

    # nothing over the threshold → no-op, no version bump
    v = m_after["version"]
    assert sink.compact(max_file_versions=1) == {"version": v, "buckets": 0}


def test_point_lookup_prunes_to_one_bucket(spark, tmp_path):
    """lookup() reads only the key's bucket files and resolves LWW +
    tombstones in both modes."""
    from atlas_spark.sinks import LakehouseSink

    for mode in ("cow", "mor"):
        sink = LakehouseSink(spark, str(tmp_path / mode), n_buckets=8,
                             mode=mode)
        sink.ensure()
        rows = [(i, "I", f"r{i}", f"p{i}", f"c{i}", "py", f"v{i}")
                for i in range(30)]
        sink.merge(spark.createDataFrame(
            rows, "seq bigint, op string, repo string, path string, "
                  "commit string, lang string, content string"), 0)
        sink.merge(spark.createDataFrame(
            [(100, "U", "r3", "p3", "cN", "py", "vN"),
             (101, "D", "r4", "p4", None, None, None)],
            "seq bigint, op string, repo string, path string, "
            "commit string, lang string, content string"), 1)
        got = sink.lookup("r3", "p3").collect()
        assert len(got) == 1 and got[0]["commit"] == "cN", mode
        assert sink.lookup("r4", "p4").count() == 0, mode          # deleted
        assert sink.lookup("r4", "p4", include_tombstones=True).count() == 1
        assert sink.lookup("rX", "nope").count() == 0, mode
