"""Config loading/validation + CLI exit codes (reference analogs:
tests/config_integration_test.rs, cli/commands/*)."""

import subprocess
import sys
import os

import pytest

from atlas_spark.config import EngineConfig, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_defaults_and_validation():
    cfg = EngineConfig()
    errs = cfg.validate()
    assert "source.changelog_dir is required" in errs
    assert "sink.table_root is required" in errs
    cfg.source.changelog_dir = "/x"
    cfg.sink.table_root = "/y"
    assert cfg.validate() == []
    cfg.sink.n_buckets = 0
    assert any("n_buckets" in e for e in cfg.validate())


def test_toml_load_and_env_override(tmp_path):
    p = tmp_path / "cfg.toml"
    p.write_text(
        '[source]\nchangelog_dir = "/data/log"\nfiles_per_epoch = 4\n'
        '[sink]\ntable_root = "/data/table"\nn_buckets = 32\n'
    )
    cfg = load_config(str(p), env={})
    assert cfg.source.files_per_epoch == 4
    assert cfg.sink.n_buckets == 32
    # env wins (type-coerced)
    cfg2 = load_config(
        str(p),
        env={
            "ATLAS_SPARK_SINK_N_BUCKETS": "128",
            "ATLAS_SPARK_RUN_DRY_RUN": "true",
        },
    )
    assert cfg2.sink.n_buckets == 128
    assert cfg2.run.dry_run is True


def test_env_coerce_none_default_fields(tmp_path):
    """Fields declared ``int | None`` (default None) must still coerce
    env strings by DECLARED type, not current value (ADVICE r01)."""
    p = tmp_path / "cfg.toml"
    p.write_text(
        '[source]\nchangelog_dir = "/data/log"\n'
        '[sink]\ntable_root = "/data/table"\n'
    )
    cfg = load_config(
        str(p),
        env={
            "ATLAS_SPARK_SPARK_SHUFFLE_PARTITIONS": "64",
            "ATLAS_SPARK_SPARK_MASTER": "local[8]",
        },
    )
    assert cfg.spark.shuffle_partitions == 64  # int, not '64'
    assert cfg.spark.master == "local[8]"
    assert cfg.validate() == []  # no TypeError from '64' comparison


def test_var_substitution(tmp_path):
    """${VAR} substitution in string TOML values; unset vars raise."""
    p = tmp_path / "cfg.toml"
    p.write_text(
        '[source]\nchangelog_dir = "${DATA_ROOT}/log"\n'
        '[sink]\ntable_root = "${DATA_ROOT}/table"\nn_buckets = 8\n'
    )
    cfg = load_config(str(p), env={"DATA_ROOT": "/mnt/lake"})
    assert cfg.source.changelog_dir == "/mnt/lake/log"
    assert cfg.sink.table_root == "/mnt/lake/table"
    assert cfg.sink.n_buckets == 8  # non-strings untouched
    with pytest.raises(ValueError, match=r"unset variable \$\{DATA_ROOT\}"):
        load_config(str(p), env={})


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.toml"
    p.write_text("[source]\nbogus = 1\n")
    with pytest.raises(ValueError, match="unknown config key"):
        load_config(str(p), env={})


def _cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "atlas_spark.cli", *args],
        capture_output=True, text=True, cwd=REPO,
    )


def test_cli_init_and_validate(tmp_path):
    out_toml = str(tmp_path / "engine.toml")
    r = _cli("init", "-o", out_toml)
    assert r.returncode == 0
    r2 = _cli("validate-config", "-c", out_toml)
    assert r2.returncode == 0, r2.stderr
    # break it
    with open(out_toml, "a") as f:
        f.write("\n[sink]\nn_buckets = -1\n")
    # tomllib rejects duplicate sections → config error path (exit 2)
    r3 = _cli("validate-config", "-c", out_toml)
    assert r3.returncode == 2


def test_cli_validate_missing_required(tmp_path):
    p = tmp_path / "partial.toml"
    p.write_text('[source]\nchangelog_dir = "/x"\n')
    r = _cli("validate-config", "-c", str(p))
    assert r.returncode == 2
    assert "table_root" in r.stderr


def test_compact_config_ranges():
    """VERDICT r03 #7 (reference schema.rs:374-396 range validation):
    compaction knobs must be >= 1 when set."""
    cfg = EngineConfig()
    cfg.source.changelog_dir = "/x"
    cfg.sink.table_root = "/y"
    assert cfg.validate() == []
    cfg.run.compact_every = 0
    assert any("compact_every" in e for e in cfg.validate())
    cfg.run.compact_every = 8
    cfg.run.compact_max_file_versions = -1
    assert any("compact_max_file_versions" in e for e in cfg.validate())
    cfg.run.compact_max_file_versions = 4
    assert cfg.validate() == []


def test_cli_validate_config_exit_2_on_bad_ranges(tmp_path):
    p = tmp_path / "cfg.toml"
    p.write_text(
        '[source]\nchangelog_dir = "/data/log"\n'
        '[sink]\ntable_root = "/data/t"\n'
        "[run]\ncompact_every = 0\n"
    )
    r = subprocess.run(
        [sys.executable, "-m", "atlas_spark.cli", "validate-config",
         "-c", str(p)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 2
    assert "compact_every" in r.stderr


def test_cli_vacuum_refuses_feed_retention_without_yes(capsys):
    """--retain-changes (like --retain-versions) irreversibly prunes
    feed epochs, so the CLI refuses without --yes — before any Spark
    or config work."""
    import argparse

    from atlas_spark.cli import cmd_vacuum

    args = argparse.Namespace(config="/nonexistent.toml",
                              retain_versions=None, retain_changes=2,
                              yes=False, min_age_seconds=3600.0)
    assert cmd_vacuum(args) == 2
    assert "bootstrap" in capsys.readouterr().out


def test_emit_changes_config_wiring(tmp_path):
    """sink.emit_changes flows TOML → config → validation: MoR+emit is
    rejected at validate time (same contract the sink enforces), the
    bool coerces from an env override, and the default stays off."""
    from atlas_spark.config import load_config

    p = tmp_path / "e.toml"
    p.write_text(
        '[source]\nchangelog_dir = "/x"\n'
        '[sink]\ntable_root = "/t"\nemit_changes = true\n'
    )
    cfg = load_config(str(p))
    assert cfg.sink.emit_changes is True
    assert cfg.validate() == []

    cfg2 = load_config(str(p), env={
        "ATLAS_SPARK_SINK_EMIT_CHANGES": "false"
    })
    assert cfg2.sink.emit_changes is False

    bad = tmp_path / "bad.toml"
    bad.write_text(
        '[source]\nchangelog_dir = "/x"\n'
        '[sink]\ntable_root = "/t"\nmerge_mode = "mor"\n'
        "emit_changes = true\n"
    )
    errs = load_config(str(bad)).validate()
    assert any("emit_changes requires merge_mode=cow" in e for e in errs)

    # emit_changes on the Iceberg sink would be silently ignored (the
    # CLI only wires it into the LakehouseSink branch) — reject at
    # validate time instead
    ice = tmp_path / "ice.toml"
    ice.write_text(
        '[source]\nchangelog_dir = "/x"\n'
        '[sink]\ntable_root = "/t"\nformat = "iceberg"\n'
        "emit_changes = true\n"
    )
    errs = load_config(str(ice)).validate()
    assert any("requires format=lakehouse" in e for e in errs)
