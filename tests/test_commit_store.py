"""CommitStore seam unit tests (VERDICT r04 task #4): the OCC contract
is enforced at the interface level, independent of Spark or the sink."""

import concurrent.futures as cf

import pytest

from atlas_spark.sinks.commit_store import (
    CommitStore,
    LocalFSCommitStore,
    S3ConditionalPutCommitStore,
)


def _store(tmp_path) -> LocalFSCommitStore:
    s = LocalFSCommitStore(str(tmp_path / "log"))
    s.ensure()
    return s


def test_put_if_absent_single_winner_under_contention(tmp_path):
    s = _store(tmp_path)
    with cf.ThreadPoolExecutor(8) as ex:
        results = list(ex.map(
            lambda i: s.put_if_absent("manifest.1.json", b"%d" % i),
            range(16),
        ))
    assert sum(results) == 1
    # the committed object is one of the contenders, intact
    assert s.read("manifest.1.json") in {b"%d" % i for i in range(16)}


def test_objects_are_immutable(tmp_path):
    s = _store(tmp_path)
    assert s.put_if_absent("m.json", b"first")
    assert not s.put_if_absent("m.json", b"second")
    assert s.read("m.json") == b"first"


def test_pointer_monotonic(tmp_path):
    s = _store(tmp_path)
    assert s.read_pointer() is None
    s.advance_pointer(3)
    s.advance_pointer(1)  # laggard must not regress
    assert s.read_pointer() == 3
    s.advance_pointer(4)
    assert s.read_pointer() == 4


def test_list_and_delete_exclude_internals(tmp_path):
    s = _store(tmp_path)
    s.put_if_absent("manifest.1.json", b"a")
    s.put_if_absent("manifest.2.json", b"b")
    s.advance_pointer(2)
    assert s.list_names() == ["manifest.1.json", "manifest.2.json"]
    s.delete("manifest.1.json")
    s.delete("manifest.1.json")  # idempotent
    assert s.list_names() == ["manifest.2.json"]


def test_s3_store_is_interfaced_not_implemented():
    assert issubclass(S3ConditionalPutCommitStore, CommitStore)
    with pytest.raises(NotImplementedError):
        S3ConditionalPutCommitStore("bucket", "prefix")
