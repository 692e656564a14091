"""CommitStore seam unit tests (VERDICT r04 task #4): the OCC contract
is enforced at the interface level, independent of Spark or the sink.
Both implementations run the same contract suite — LocalFS against the
real filesystem, S3 against an in-memory fake that reproduces S3's
conditional-write semantics (If-None-Match: * → 412 on existence,
injectable 409 ConditionalRequestConflict)."""

import concurrent.futures as cf
import threading

import pytest

from atlas_spark.sinks.commit_store import (
    CommitStore,
    DirS3Client,
    LocalFSCommitStore,
    S3ConditionalPutCommitStore,
    resolve_head_version,
)


class _ClientError(Exception):
    """botocore.exceptions.ClientError shape (duck-typed: the store
    only inspects ``.response``)."""

    def __init__(self, code: str, status: int):
        super().__init__(code)
        self.response = {
            "Error": {"Code": code},
            "ResponseMetadata": {"HTTPStatusCode": status},
        }


class FakeS3Client:
    """In-memory boto3-s3 shape with real conditional-PUT semantics.

    ``conflicts_then_commit``: make the next N conditional PUTs raise
    409 ConditionalRequestConflict (a concurrent conditional write in
    flight); if ``commit_body`` is set, the "other writer" wins the key
    during the conflict window — reproducing both documented 409
    outcomes (retry-and-win, probe-and-lose)."""

    def __init__(self):
        self.objects: dict[str, bytes] = {}
        self.lock = threading.Lock()
        self.conflicts_remaining = 0
        self.conflict_commit: tuple[str, bytes] | None = None
        self.list_calls = 0

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None, **kw):
        if isinstance(Body, str):
            Body = Body.encode()
        with self.lock:
            if IfNoneMatch == "*":
                if self.conflicts_remaining > 0:
                    self.conflicts_remaining -= 1
                    if (self.conflict_commit
                            and self.conflict_commit[0] == Key):
                        self.objects[Key] = self.conflict_commit[1]
                    raise _ClientError("ConditionalRequestConflict", 409)
                if Key in self.objects:
                    raise _ClientError("PreconditionFailed", 412)
            self.objects[Key] = bytes(Body)
        return {}

    def get_object(self, Bucket, Key, **kw):
        with self.lock:
            if Key not in self.objects:
                raise _ClientError("NoSuchKey", 404)
            data = self.objects[Key]

        class _Body:
            def read(self_inner):
                return data

        return {"Body": _Body()}

    def head_object(self, Bucket, Key, **kw):
        with self.lock:
            if Key not in self.objects:
                raise _ClientError("404", 404)
        return {}

    def list_objects_v2(self, Bucket, Prefix="", ContinuationToken=None,
                        **kw):
        # one-key pages to exercise the store's continuation loop
        self.list_calls += 1
        with self.lock:
            keys = sorted(k for k in self.objects if k.startswith(Prefix))
        start = int(ContinuationToken) if ContinuationToken else 0
        page = keys[start:start + 1]
        truncated = start + 1 < len(keys)
        resp = {
            "Contents": [{"Key": k} for k in page],
            "IsTruncated": truncated,
        }
        if truncated:
            resp["NextContinuationToken"] = str(start + 1)
        return resp

    def delete_object(self, Bucket, Key, **kw):
        with self.lock:
            self.objects.pop(Key, None)
        return {}


@pytest.fixture(params=["localfs", "s3", "dirs3"])
def store(request, tmp_path) -> CommitStore:
    if request.param == "localfs":
        s = LocalFSCommitStore(str(tmp_path / "log"))
    elif request.param == "s3":
        s = S3ConditionalPutCommitStore(
            "bucket", "tables/t/_manifest", client=FakeS3Client()
        )
    else:
        # the dir-backed client: same S3 store class, conditional PUT
        # emulated with the atomic os.link primitive — the whole
        # contract suite runs against it too (page_size=1 forces the
        # continuation loop through every LIST)
        s = S3ConditionalPutCommitStore(
            "bucket", "tables/t/_manifest",
            client=DirS3Client(str(tmp_path / "obj"), page_size=1),
        )
    s.ensure()
    return s


def test_put_if_absent_single_winner_under_contention(store):
    with cf.ThreadPoolExecutor(8) as ex:
        results = list(ex.map(
            lambda i: store.put_if_absent("manifest.1.json", b"%d" % i),
            range(16),
        ))
    assert sum(results) == 1
    # the committed object is one of the contenders, intact
    assert store.read("manifest.1.json") in {b"%d" % i for i in range(16)}


def test_objects_are_immutable(store):
    assert store.put_if_absent("m.json", b"first")
    assert not store.put_if_absent("m.json", b"second")
    assert store.read("m.json") == b"first"


def test_read_missing_raises_filenotfound(store):
    with pytest.raises(FileNotFoundError):
        store.read("nope.json")
    assert not store.exists("nope.json")


def test_pointer_monotonic(store):
    assert store.read_pointer() is None
    store.advance_pointer(3)
    store.advance_pointer(1)  # laggard must not regress
    assert store.read_pointer() == 3
    store.advance_pointer(4)
    assert store.read_pointer() == 4


def test_list_and_delete_exclude_internals(store):
    store.put_if_absent("manifest.1.json", b"a")
    store.put_if_absent("manifest.2.json", b"b")
    store.advance_pointer(2)
    assert store.list_names() == ["manifest.1.json", "manifest.2.json"]
    store.delete("manifest.1.json")
    store.delete("manifest.1.json")  # idempotent
    assert store.list_names() == ["manifest.2.json"]


def _mname(v: int) -> str:
    return f"manifest.{v:08d}.json"


def test_list_names_paginates_many_objects(store):
    """75 manifests cross many LIST pages (the S3 fake serves ONE key
    per page — 75+ continuation rounds); list_names must drain the
    continuation loop, not return the first page (VERDICT r05 #3)."""
    for v in range(75):
        assert store.put_if_absent(_mname(v), b"%d" % v)
    store.advance_pointer(74)
    names = store.list_names()
    assert names == sorted(_mname(v) for v in range(75))
    if isinstance(store, S3ConditionalPutCommitStore):
        assert store.client.list_calls >= 75  # really paginated


def test_pointer_concurrent_racers_and_forward_probe(store):
    """N racers advance the pointer to shuffled versions concurrently.
    The pointer is only BEST-EFFORT monotonic (S3's is a plain LWW
    PutObject: read-before-write can interleave and land a laggard
    last) — the contract readers rely on is weaker and pinned here:
    whatever the pointer says, forward probing from it reaches the true
    head (VERDICT r05 #3 pointer-regression convergence)."""
    import random

    head = 24
    for v in range(head + 1):
        assert store.put_if_absent(_mname(v), b"%d" % v)
    versions = list(range(head + 1)) * 2
    random.Random(7).shuffle(versions)
    with cf.ThreadPoolExecutor(8) as ex:
        list(ex.map(store.advance_pointer, versions))
    p = store.read_pointer()
    assert p is not None and 0 <= p <= head
    assert resolve_head_version(store, _mname) == head


def test_pointer_regression_converges_via_forward_probe(store):
    """Force an actually-REGRESSED pointer (simulating the S3 LWW
    laggard landing after a newer advance) and pin that readers still
    converge on the head."""
    for v in range(10):
        assert store.put_if_absent(_mname(v), b"%d" % v)
    store.advance_pointer(9)
    # clobber the pointer backwards behind the store's back
    if isinstance(store, S3ConditionalPutCommitStore):
        store.client.put_object(Bucket=store.bucket,
                                Key=store._key("CURRENT"), Body=b"3")
    else:
        with open(store._pointer, "w") as f:
            f.write("3")
    assert store.read_pointer() == 3  # genuinely regressed
    assert resolve_head_version(store, _mname) == 9
    # and advance-only still holds from the regressed value
    store.advance_pointer(5)
    assert store.read_pointer() == 5


def test_s3_conflict_retries_then_wins(tmp_path):
    """409 ConditionalRequestConflict with no committed object: the
    store retries its own PUT and eventually wins."""
    client = FakeS3Client()
    s = S3ConditionalPutCommitStore("b", "p", client=client)
    client.conflicts_remaining = 3
    assert s.put_if_absent("manifest.7.json", b"mine")
    assert s.read("manifest.7.json") == b"mine"


def test_s3_conflict_probes_and_loses(tmp_path):
    """409 where the concurrent writer's object materializes: the
    store must report a clean loss, not overwrite."""
    client = FakeS3Client()
    s = S3ConditionalPutCommitStore("b", "p", client=client)
    client.conflicts_remaining = 1
    client.conflict_commit = ("p/manifest.7.json", b"theirs")
    assert not s.put_if_absent("manifest.7.json", b"mine")
    assert s.read("manifest.7.json") == b"theirs"


def test_s3_persistent_conflict_surfaces(tmp_path):
    client = FakeS3Client()
    s = S3ConditionalPutCommitStore("b", "p", client=client)
    client.conflicts_remaining = 999
    with pytest.raises(TimeoutError):
        s.put_if_absent("manifest.9.json", b"mine")


class RecordingClient:
    """Wraps a boto3-shaped client, recording ``(method, key,
    conditional)`` per call — pins the EXACT S3 request sequence a
    real deployment issues per commit (VERDICT r06 #8: the cluster
    bring-up checklist when pointing the store at real S3/GCS/ABFS)."""

    def __init__(self, inner):
        self.inner = inner
        self.calls = []

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None, **kw):
        self.calls.append(("put_object", Key, IfNoneMatch))
        return self.inner.put_object(
            Bucket=Bucket, Key=Key, Body=Body, IfNoneMatch=IfNoneMatch, **kw
        )

    def get_object(self, Bucket, Key, **kw):
        self.calls.append(("get_object", Key, None))
        return self.inner.get_object(Bucket=Bucket, Key=Key, **kw)

    def head_object(self, Bucket, Key, **kw):
        self.calls.append(("head_object", Key, None))
        return self.inner.head_object(Bucket=Bucket, Key=Key, **kw)

    def list_objects_v2(self, **kw):
        self.calls.append(("list_objects_v2", kw.get("Prefix"), None))
        return self.inner.list_objects_v2(**kw)

    def delete_object(self, Bucket, Key, **kw):
        self.calls.append(("delete_object", Key, None))
        return self.inner.delete_object(Bucket=Bucket, Key=Key, **kw)


def test_boto3_call_sequence_per_commit():
    """The documented per-commit request shapes, asserted exactly:

    * clean commit  = conditional PUT(manifest) →
                      GET(CURRENT, read-before-write) →
                      unconditional PUT(CURRENT);
    * lost race     = ONE conditional PUT (412), nothing else;
    * stale advance = GET(CURRENT) only (monotonic guard, no write);
    * 409 in-flight = conditional PUT → HEAD probe → conditional PUT.
    """
    rec = RecordingClient(FakeS3Client())
    s = S3ConditionalPutCommitStore("b", "t/_manifest", client=rec)
    pfx = "t/_manifest/"

    assert s.put_if_absent(_mname(1), b"m1")
    s.advance_pointer(1)
    assert rec.calls == [
        ("put_object", pfx + _mname(1), "*"),
        ("get_object", pfx + "CURRENT", None),
        ("put_object", pfx + "CURRENT", None),
    ]

    rec.calls.clear()
    assert not s.put_if_absent(_mname(1), b"other")
    assert rec.calls == [("put_object", pfx + _mname(1), "*")]

    rec.calls.clear()
    s.advance_pointer(0)  # laggard: must read, must NOT write
    assert rec.calls == [("get_object", pfx + "CURRENT", None)]

    rec.inner.conflicts_remaining = 1
    rec.calls.clear()
    assert s.put_if_absent(_mname(2), b"m2")
    assert rec.calls == [
        ("put_object", pfx + _mname(2), "*"),
        ("head_object", pfx + _mname(2), None),
        ("put_object", pfx + _mname(2), "*"),
    ]


def test_s3_store_default_client_wiring():
    # with boto3 importable the default client wires up; without it
    # construction must fail loudly, not half-initialize
    try:
        import boto3  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            S3ConditionalPutCommitStore("bucket", "prefix")
    else:
        s = S3ConditionalPutCommitStore("bucket", "prefix")
        assert s.client is not None and s.prefix == "prefix"


def test_full_replay_through_s3_shaped_commit_store(spark, tmp_path):
    """End-to-end: the ENTIRE OCC manifest path (ensure, publish,
    epoch fence, pointer advance, forward probe) driven through the S3
    store class over the dir-backed client — a multi-epoch replay
    converges to the oracle with the manifest log living behind
    conditional-PUT semantics instead of POSIX link, and a re-run is
    fully fenced.  This is the closest in-sandbox approximation of
    cluster bring-up against a real bucket (no network here)."""
    from atlas_spark.changelog import (
        ChangelogSpec, generate_changelog, write_changelog,
    )
    from atlas_spark.sinks import LakehouseSink
    from atlas_spark.streaming import ReplayRunner
    from tests.test_replay_core import check_against_oracle

    cl = generate_changelog(ChangelogSpec(
        n_events=600, n_repos=5, paths_per_repo=10, delete_frac=0.1,
        duplicate_frac=0.05,
    ))
    log = str(tmp_path / "log")
    write_changelog(cl, log, n_files=6)
    client = DirS3Client(str(tmp_path / "bucket"), page_size=2)
    store = S3ConditionalPutCommitStore(
        "bucket", "tables/t/_log", client=client
    )
    sink = LakehouseSink(spark, str(tmp_path / "t"), n_buckets=4,
                         commit_store=store)
    sink.ensure()
    s = ReplayRunner(spark, sink, files_per_epoch=2).run(log)
    assert s.epochs_applied == 3
    check_against_oracle(spark, sink, cl)
    # redelivery is fenced at the manifest, through the same store
    s2 = ReplayRunner(spark, sink, files_per_epoch=2).run(log)
    assert s2.epochs_applied == 0 and s2.epochs_skipped == 3
    # the log really lives behind the S3 surface
    assert store.read_pointer() == 3
    assert len([n for n in store.list_names()
                if n.startswith("manifest.")]) == 4
