"""Content edge cases: unicode, huge payloads, empty strings, newlines
— the sha256 invariant must hold byte-for-byte (utf-8) everywhere.
Mirrors the reference's anonymization_edge_cases_test.rs intent."""

import hashlib

from atlas_spark.sinks import LakehouseSink

EDGE_CONTENTS = [
    "",                                   # empty
    "a",                                  # single char
    "über café 中文 — emoji 🚀 done\n",    # unicode incl. astral
    "line1\r\nline2\n\ttab\0nul?",        # control chars (no real NUL
                                           # — parquet strings allow it
                                           # but keep it printable)
    "x" * 50_000,                          # 50 KB (FIXTURES upper bound)
    '{"not": "the payload", "quote": "\\""}',
]


def test_sha_invariant_on_edge_contents(spark, tmp_path):
    rows = [
        (i, "I", "edge", f"p{i}", f"c{i}", "txt", c)
        for i, c in enumerate(EDGE_CONTENTS)
    ]
    df = spark.createDataFrame(
        rows,
        "seq bigint, op string, repo string, path string, commit string, "
        "lang string, content string",
    )
    sink = LakehouseSink(spark, str(tmp_path / "t"), n_buckets=2)
    sink.ensure()
    sink.merge(df, 0)
    got = {r["path"]: (r["content"], r["content_sha256"])
           for r in sink.read().collect()}
    assert len(got) == len(EDGE_CONTENTS)
    for i, c in enumerate(EDGE_CONTENTS):
        content, sha = got[f"p{i}"]
        assert content == c
        assert sha == hashlib.sha256(c.encode("utf-8")).hexdigest()


def test_large_batch_of_big_contents(spark, tmp_path):
    """2k × ~20 KB contents (~40 MB) through a full merge + re-merge."""
    big = "def f(x):\n    return x * 2\n" * 700  # ~19 KB
    rows = [(i, "I", f"r{i % 5}", f"p{i}", f"c{i}", "py", big + str(i))
            for i in range(2000)]
    df = spark.createDataFrame(
        rows,
        "seq bigint, op string, repo string, path string, commit string, "
        "lang string, content string",
    )
    sink = LakehouseSink(spark, str(tmp_path / "t"), n_buckets=4)
    sink.ensure()
    sink.merge(df, 0)
    assert sink.read().count() == 2000
    # update a slice with newer seqs
    upd = [(10_000 + i, "U", f"r{i % 5}", f"p{i}", "cN", "py", "small")
           for i in range(0, 2000, 100)]
    df2 = spark.createDataFrame(
        upd,
        "seq bigint, op string, repo string, path string, commit string, "
        "lang string, content string",
    )
    sink.merge(df2, 1)
    small = sink.read().filter("content = 'small'").count()
    assert small == 20
    assert sink.read().count() == 2000
