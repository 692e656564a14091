"""vacuum(): orphan data-file GC + manifest retention (ADVICE r04 —
OCC losers and long streams otherwise accrue unbounded unreferenced
parquet and manifests forever)."""

import json
import os

from atlas_spark.sinks import LakehouseSink

from tests.test_occ import _interleave
from tests.test_sink_unit import _df, _mk


def _data_files(root):
    out = []
    for dirpath, _d, files in os.walk(os.path.join(root, "t", "data")):
        out += [
            os.path.join(dirpath, f) for f in files
            if not f.startswith(("_", "."))  # sidecars aren't data
        ]
    return sorted(out)


def _state(sink):
    return sorted(
        (r["repo"], r["path"], r["seq"], r["commit"])
        for r in sink.read(include_tombstones=True).collect()
    )


def test_vacuum_removes_occ_loser_orphans(spark, tmp_path):
    """A merge that loses the version race to a same-epoch commit is
    fence-skipped AFTER writing its data files — vacuum reclaims them
    and the table state is untouched."""
    sink = _mk(spark, tmp_path)
    sink.merge(_df(spark, [[1, "I", "r", "a", "c1", "py", "v1"]]), 0)

    rival = LakehouseSink(spark, sink.root, n_buckets=sink.n_buckets)

    def competing():
        rival.merge(_df(spark, [[2, "U", "r", "a", "c2", "py", "v2"]]), 1)

    _interleave(sink, competing)
    res = sink.merge(_df(spark, [[2, "U", "r", "a", "cX", "py", "vX"]]), 1)
    assert res["skipped"] is True  # lost the race, fence-skipped

    before = _state(sink)
    n_before = len(_data_files(tmp_path))
    out = sink.vacuum(min_age_seconds=0)
    assert out["data_files_removed"] >= 1  # the loser's orphan(s)
    assert out["manifests_pruned"] == 0
    assert len(_data_files(tmp_path)) == n_before - out["data_files_removed"]
    assert _state(sink) == before
    # every retained version still readable (no referenced file removed)
    for v in range(sink.manifest()["version"] + 1):
        sink.read(include_tombstones=True, version=v).count()


def test_vacuum_min_age_protects_inflight_files(spark, tmp_path):
    """An unreferenced-right-now file younger than the horizon may be
    an in-flight commit's data — it must survive."""
    sink = _mk(spark, tmp_path)
    sink.merge(_df(spark, [[1, "I", "r", "a", "c1", "py", "v1"]]), 0)
    # simulate a concurrent writer mid-commit: data written, manifest not
    stray = os.path.join(sink.root, "data", "e999999-deadbeef")
    os.makedirs(stray)
    with open(os.path.join(stray, "part-0.parquet"), "wb") as f:
        f.write(b"not yet committed")
    out = sink.vacuum()  # default 1 h horizon
    assert out["data_files_removed"] == 0
    assert out["data_files_kept_young"] >= 1
    assert os.path.exists(os.path.join(stray, "part-0.parquet"))
    out2 = sink.vacuum(min_age_seconds=0)
    assert out2["data_files_removed"] >= 1
    assert not os.path.exists(stray)  # emptied dir pruned too


def test_vacuum_retention_prunes_manifests_and_their_files(spark, tmp_path):
    """retain_versions=N keeps the newest N manifests; files referenced
    ONLY by pruned versions are reclaimed, current state + retained
    time travel keep working, pruned versions are gone."""
    sink = _mk(spark, tmp_path)  # cow: each merge rewrites the bucket
    for e in range(4):
        sink.merge(
            _df(spark, [[e + 1, "U", "r", "a", f"c{e}", "py", f"v{e}"]]), e
        )
    m = sink.manifest()
    assert m["version"] == 4
    before = _state(sink)
    out = sink.vacuum(retain_versions=2, min_age_seconds=0)
    assert out["manifests_pruned"] == 3  # versions 0,1,2
    assert out["versions_retained"] == 2
    assert out["data_files_removed"] >= 2  # v0/v1's superseded rewrites
    assert _state(sink) == before
    sink.read(version=3).count()  # retained time travel OK
    try:
        sink.manifest(version=1)
        raise AssertionError("pruned version still readable")
    except FileNotFoundError:
        pass


def test_vacuum_noop_on_clean_table(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.merge(_df(spark, [[1, "I", "r", "a", "c1", "py", "v1"]]), 0)
    out = sink.vacuum(min_age_seconds=0)
    assert out == {
        "data_files_removed": 0,
        "data_files_kept_young": 0,
        "manifests_pruned": 0,
        "versions_retained": 2,  # ensure()'s v0 + the merge's v1
        "changes_pruned": 0,
        "listing": "driver",  # auto picks driver at this size
    }


def _all_files(root):
    """Every file under a table root, relative — data AND sidecars."""
    out = []
    for dirpath, _d, files in os.walk(root):
        out += [
            os.path.relpath(os.path.join(dirpath, f), root) for f in files
        ]
    return sorted(out)


def _build_gc_table(spark, tmp_path):
    """A many-epoch table with orphans: superseding rewrites plus two
    stray in-flight dirs (one old/reclaimable, one young/protected)."""
    sink = _mk(spark, tmp_path)
    for e in range(6):
        sink.merge(
            _df(spark, [[e + 1, "U", "r", "a", f"c{e}", "py", f"v{e}"],
                        [e + 100, "U", "r", f"p{e}", f"d{e}", "py", "w"]]),
            e,
        )
    for name, age in [("e999990-aaaaaaaa", 9999), ("e999991-bbbbbbbb", 0)]:
        d = os.path.join(sink.root, "data", name)
        os.makedirs(d)
        p = os.path.join(d, "part-0.parquet")
        with open(p, "wb") as f:
            f.write(b"uncommitted")
        t = os.path.getmtime(p) - age
        os.utime(p, (t, t))
    return sink


def _clone(sink, dst):
    import shutil

    shutil.copytree(sink.root, dst)
    return dst


def test_vacuum_distributed_listing_matches_driver(spark, tmp_path):
    """VERDICT r05 #2: the distributed candidate enumeration (one Spark
    task per epoch dir; LIST + DELETE on executors, broadcast
    referenced set) must compute the IDENTICAL delete set as the
    driver-side walk — proven by vacuuming two byte-identical clones of
    a many-epoch table, one per path, and diffing every surviving
    file."""
    sink = _build_gc_table(spark, tmp_path)
    a_root = _clone(sink, str(tmp_path / "clone_a"))
    b_root = _clone(sink, str(tmp_path / "clone_b"))
    a = LakehouseSink(spark, a_root, n_buckets=sink.n_buckets)
    b = LakehouseSink(spark, b_root, n_buckets=sink.n_buckets)
    ra = a.vacuum(retain_versions=3, min_age_seconds=600, listing="driver")
    rb = b.vacuum(retain_versions=3, min_age_seconds=600,
                  listing="distributed")
    assert ra.pop("listing") == "driver"
    assert rb.pop("listing") == "distributed"
    assert ra == rb
    assert ra["data_files_removed"] >= 1
    assert ra["data_files_kept_young"] >= 1  # the young stray survived
    assert _all_files(a_root) == _all_files(b_root)
    assert _state(a) == _state(b) == _state(sink)


def test_vacuum_store_listing_matches_driver(spark, tmp_path):
    """VERDICT r06 #2: ``listing="store"`` routes candidate enumeration
    and deletion through the object-store data plane (paginated
    ListObjectsV2 + batched DeleteObjects, one sweep per epoch prefix,
    run as Spark tasks via the picklable client factory) — and must
    compute the IDENTICAL delete set as the driver walk, proven on
    byte-identical clones."""
    import functools

    from atlas_spark.sinks.commit_store import DirS3Client, S3DataPlane

    sink = _build_gc_table(spark, tmp_path)
    a_root = _clone(sink, str(tmp_path / "clone_a"))
    c_root = _clone(sink, str(tmp_path / "clone_c"))
    a = LakehouseSink(spark, a_root, n_buckets=sink.n_buckets)
    # page_size=3 forces real LIST pagination at this table size
    plane = S3DataPlane(
        "bucket", "",
        client_factory=functools.partial(DirS3Client, c_root, 3),
    )
    c = LakehouseSink(spark, c_root, n_buckets=sink.n_buckets,
                      data_plane=plane)
    ra = a.vacuum(retain_versions=3, min_age_seconds=600, listing="driver")
    rc = c.vacuum(retain_versions=3, min_age_seconds=600, listing="store")
    assert ra.pop("listing") == "driver"
    assert rc.pop("listing") == "store"
    assert ra == rc
    assert rc["data_files_removed"] >= 1
    assert rc["data_files_kept_young"] >= 1
    assert _all_files(a_root) == _all_files(c_root)
    assert _state(a) == _state(c) == _state(sink)
    # idempotent second pass through the store path
    rc2 = c.vacuum(retain_versions=3, min_age_seconds=600,
                   listing="store")
    assert rc2["data_files_removed"] == 0
