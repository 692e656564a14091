"""Property-based correctness: ANY random changelog (ops, keys, seqs,
arrival order, epoch boundaries) replayed through the engine equals
the seq-order oracle fold.  Hypothesis drives the adversary."""

import hashlib

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from atlas_spark.changelog.oracle import expected_state_pdf
from atlas_spark.sinks import LakehouseSink
from atlas_spark.streaming import ReplayRunner
from atlas_spark.changelog import write_changelog

# events: (key_id 0..5, op, payload shape) — payload shapes fuzz the
# schema-evolution path: key renames, column adds, int→bigint widening
_event = st.tuples(
    st.integers(min_value=0, max_value=5),      # key
    st.sampled_from(["I", "U", "D"]),           # op
    st.sampled_from([0, 1, 2, 3, 4]),           # payload variant
)

def _payload(pv: int, k: int, seq: int) -> str:
    small, big = seq + 1, 3_000_000_000 + seq
    return [
        "{}",
        f'{{"author": "u{k}"}}',
        f'{{"committer": "u{k}"}}',                     # post-rename shape
        f'{{"author": "u{k}", "lines": {small}}}',      # int lines
        f'{{"committer": "u{k}", "lines": {big}}}',     # widened lines
    ][pv]


@st.composite
def changelogs(draw):
    events = draw(st.lists(_event, min_size=1, max_size=40))
    n = len(events)
    # arbitrary arrival order of seqs 0..n-1 (out-of-order delivery)
    seq_perm = draw(st.permutations(range(n)))
    rows = []
    for i, (key, op, pv) in enumerate(events):
        seq = seq_perm[i]
        payload = _payload(pv, key, seq)
        rows.append(
            {
                "seq": seq,
                "op": op,
                "repo": f"r{key % 3}",
                "path": f"p{key}",
                "commit": f"{seq:040d}",
                "lang": "py",
                "content": f"content-{key}-{seq}",
                "payload": payload,
                "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=seq),
            }
        )
    dup = draw(st.booleans())
    if dup:
        rows = rows + rows[: max(1, n // 4)]  # redeliver a prefix
    return pd.DataFrame(rows)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(changelog=changelogs(), files=st.integers(min_value=1, max_value=4),
       bulk=st.booleans(), mode=st.sampled_from(["cow", "mor"]))
def test_replay_equals_oracle(spark, tmp_path_factory, changelog, files,
                              bulk, mode):
    tmp = tmp_path_factory.mktemp("prop")
    log_dir = str(tmp / "log")
    write_changelog(changelog, log_dir, n_files=files)
    # fuzz all four merge shapes: broadcast/bulk × cow/mor — the
    # adversarial changelog must fold identically on every path
    sink = LakehouseSink(spark, str(tmp / "t"), n_buckets=4, mode=mode,
                         broadcast_key_limit=0 if bulk else None)
    sink.ensure()
    ReplayRunner(spark, sink, files_per_epoch=2).run(log_dir)

    expected = expected_state_pdf(changelog)
    table = sink.read()
    cols = ["repo", "path", "commit", "seq", "content_sha256"]
    # evolved columns appear only if any payload carried them
    evolved = [c for c in ("lines", "committer") if c in table.columns]
    actual = (
        table.select(*cols, *evolved)
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    exp = (
        expected[cols + evolved]
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
        if len(expected)
        else pd.DataFrame(columns=cols + evolved)
    )
    assert len(actual) == len(exp), (actual, exp)
    if len(exp):
        if "lines" in evolved:
            actual["lines"] = actual["lines"].astype("Int64")
            exp["lines"] = exp["lines"].astype("Int64")
        pd.testing.assert_frame_equal(actual, exp, check_dtype=False)


def test_codec_roundtrip(spark):
    """Packed-payload codec: pack in pandas, unpack via the Arrow UDF,
    byte-identical; nulls pass through."""
    from atlas_spark.codec import decode_packed, pack_payload_py

    raws = ['{"a": 1}', '{"author": "u7", "lines": 42}', None, "{}"]
    packed = [pack_payload_py(r) if r is not None else None for r in raws]
    df = spark.createDataFrame(
        list(zip(range(len(raws)), packed)), "id int, payload string"
    )
    out = {r["id"]: r["payload"] for r in decode_packed(df).collect()}
    for i, r in enumerate(raws):
        assert out[i] == r
