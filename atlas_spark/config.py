"""Engine configuration: TOML + env overrides + validation.

Mirrors the reference's config surface (``/root/reference/src/config/
loader.rs``, ``schema.rs:76-126`` validation, ``ATLAS_<SECTION>_<KEY>``
env overrides) at the scale the Python engine needs — a dataclass per
section, ranges validated like ``schema.rs:374-396``.
"""

from __future__ import annotations

import dataclasses
import os
import re
import tomllib
from dataclasses import asdict, dataclass, field

ENV_PREFIX = "ATLAS_SPARK"


@dataclass
class SourceConfig:
    changelog_dir: str = ""
    files_per_epoch: int = 8
    mode: str = "incremental"  # or "full"

    def validate(self) -> list[str]:
        errs = []
        if not (1 <= self.files_per_epoch <= 10_000):
            errs.append("source.files_per_epoch must be in [1, 10000]")
        if self.mode not in ("incremental", "full"):
            errs.append("source.mode must be incremental|full")
        return errs


@dataclass
class SinkConfig:
    table_root: str = ""
    n_buckets: int = 64
    format: str = "lakehouse"  # or "iceberg"
    merge_mode: str = "cow"    # cow = copy-on-write, mor = merge-on-read
    # write the change-data-feed on every committed merge (Delta CDF
    # analog; CoW only — MoR's feed is diff()); read with
    # sink.changes(epoch) / diff(v1, v2)
    emit_changes: bool = False
    # carry the full old row as a `_pre` struct in the feed (Delta CDF
    # update_preimage analog) — required by incremental materialized
    # views (operators/incremental.py); persisted as a table property
    cdf_preimage: bool = False
    # evolved payload columns declared at CREATE TABLE time ("name:
    # type" strings, e.g. ["lines:bigint"]): the runner then never
    # probes the raw payload for their presence (DDL-ensure, W8)
    declared_columns: list[str] = field(default_factory=list)

    def validate(self) -> list[str]:
        errs = []
        if not (1 <= self.n_buckets <= 100_000):
            errs.append("sink.n_buckets must be in [1, 100000]")
        if self.format not in ("lakehouse", "iceberg"):
            errs.append("sink.format must be lakehouse|iceberg")
        if self.merge_mode not in ("cow", "mor"):
            errs.append("sink.merge_mode must be cow|mor")
        if self.emit_changes and self.merge_mode == "mor":
            errs.append(
                "sink.emit_changes requires merge_mode=cow "
                "(a MoR merge never reads pre-state; use diff())"
            )
        if self.emit_changes and self.format != "lakehouse":
            errs.append(
                "sink.emit_changes requires format=lakehouse (the "
                "Iceberg sink delegates CDF to the catalog's own "
                "changelog scan; the flag would be silently ignored)"
            )
        if self.cdf_preimage and not self.emit_changes:
            errs.append(
                "sink.cdf_preimage requires emit_changes=true (the "
                "pre-image rides the emitted feed)"
            )
        for d in self.declared_columns:
            if ":" not in d:
                errs.append(
                    f"sink.declared_columns entry {d!r} must be 'name:type'"
                )
        return errs

    def declared_pairs(self) -> list[tuple[str, str]]:
        return [
            (n.strip(), t.strip())
            for n, t in (d.split(":", 1) for d in self.declared_columns)
        ]


@dataclass
class SparkConfig:
    master: str | None = None
    shuffle_partitions: int | None = None
    app_name: str = "atlas_spark"

    def validate(self) -> list[str]:
        if self.shuffle_partitions is not None and not (
            1 <= self.shuffle_partitions <= 200_000
        ):
            return ["spark.shuffle_partitions must be in [1, 200000]"]
        return []


@dataclass
class RunConfig:
    dry_run: bool = False
    quarantine: bool = True
    anonymize: bool = False
    anonymize_mode: str = "hipaa"
    anonymize_strategy: str = "redact"
    # run sink.compact() every K applied epochs (None = never); with
    # compact_max_file_versions set each pass is selective — only
    # buckets over the version threshold are rewritten
    compact_every: int | None = None
    compact_max_file_versions: int | None = None

    def validate(self) -> list[str]:
        errs = []
        if self.anonymize_mode not in ("hipaa", "gdpr"):
            errs.append("run.anonymize_mode must be hipaa|gdpr")
        if self.anonymize_strategy not in ("redact", "tokenize"):
            errs.append("run.anonymize_strategy must be redact|tokenize")
        if self.compact_every is not None and self.compact_every < 1:
            errs.append("run.compact_every must be >= 1")
        if (
            self.compact_max_file_versions is not None
            and self.compact_max_file_versions < 1
        ):
            errs.append("run.compact_max_file_versions must be >= 1")
        return errs


@dataclass
class EngineConfig:
    source: SourceConfig = field(default_factory=SourceConfig)
    sink: SinkConfig = field(default_factory=SinkConfig)
    spark: SparkConfig = field(default_factory=SparkConfig)
    run: RunConfig = field(default_factory=RunConfig)

    def validate(self) -> list[str]:
        errs = []
        for section in (self.source, self.sink, self.spark, self.run):
            errs.extend(section.validate())
        if not self.source.changelog_dir:
            errs.append("source.changelog_dir is required")
        if not self.sink.table_root:
            errs.append("sink.table_root is required")
        return errs

    def to_dict(self) -> dict:
        return asdict(self)


_SECTIONS = {
    "source": SourceConfig,
    "sink": SinkConfig,
    "spark": SparkConfig,
    "run": RunConfig,
}


def _coerce(declared_type: str, raw: str):
    """Coerce an env-var string by the dataclass field's DECLARED type
    (not the current value — fields defaulting to None, e.g.
    ``spark.shuffle_partitions: int | None``, must still coerce)."""
    t = declared_type.replace(" ", "")
    if "bool" in t:
        return raw.lower() in ("1", "true", "yes", "on")
    if "int" in t:
        return int(raw)
    return raw


_VAR_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def _substitute_vars(val, env: dict[str, str]):
    """``${VAR}`` substitution inside string TOML values (reference
    analog: the loader's env substitution).  Unset variables raise —
    a silently-empty table_root is worse than a loud config error."""
    if not isinstance(val, str):
        return val

    def repl(m):
        name = m.group(1)
        if name not in env:
            raise ValueError(f"config references unset variable ${{{name}}}")
        return env[name]

    return _VAR_RE.sub(repl, val)


def load_config(path: str | None = None,
                env: dict[str, str] | None = None) -> EngineConfig:
    """TOML file (optional) + ``${VAR}`` substitution in string values
    + ``ATLAS_SPARK_<SECTION>_<KEY>`` env overrides (env wins, like
    the reference's loader)."""
    env = env if env is not None else dict(os.environ)
    data: dict = {}
    if path:
        with open(path, "rb") as f:
            data = tomllib.load(f)
    cfg = EngineConfig()
    for name, cls in _SECTIONS.items():
        section = getattr(cfg, name)
        for key, val in (data.get(name) or {}).items():
            if not hasattr(section, key):
                raise ValueError(f"unknown config key: {name}.{key}")
            setattr(section, key, _substitute_vars(val, env))
        declared = {f.name: str(f.type) for f in dataclasses.fields(cls)}
        for key in vars(section):
            env_key = f"{ENV_PREFIX}_{name.upper()}_{key.upper()}"
            if env_key in env:
                setattr(
                    section, key, _coerce(declared.get(key, "str"), env[env_key])
                )
    return cfg


SAMPLE_TOML = """\
# atlas_spark engine configuration (see atlas_spark/config.py)
[source]
changelog_dir = "/data/changelog"
files_per_epoch = 8
mode = "incremental"      # full = ignore prior checkpoints

[sink]
table_root = "/data/lake/repos"
n_buckets = 64            # raise so one bucket is a few GB at scale;
                          # any value >= 1 works (bucketing is
                          # pmod(hash(key), n)) but it is FIXED at
                          # CREATE TABLE — changing it needs a rebuild
format = "lakehouse"      # iceberg = MERGE INTO via a real catalog
merge_mode = "cow"        # mor = append-only merges, resolve at read
# declared_columns = ["lines:bigint", "committer:string"]  # DDL-ensure:
#                     skip payload presence probes for known evolution

[spark]
# master = "local[32]"    # defaults to local[$SPARK_GRAFT_CPUS or *]
# shuffle_partitions = 64

[run]
dry_run = false
quarantine = true
anonymize = false
anonymize_mode = "hipaa"
anonymize_strategy = "redact"
# compact_every = 8               # sink.compact() every K applied epochs
# compact_max_file_versions = 4   # selective: only buckets over this
"""
