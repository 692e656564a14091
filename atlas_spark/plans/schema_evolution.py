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


def surfaced_name(path: str) -> str:
    """Column name a payload path surfaces under: nested paths flatten
    with underscores (``meta.depth`` → ``meta_depth``) — the deep-
    flatten naming convention (reference flatten.rs:45-103 joins nested
    keys the same way)."""
    return path.replace(".", "_")


@dataclass
class SchemaRules:
    """Declared evolution for the dynamic payload.

    ``renames``: old key → new key, applied to the payload map so rows
    from before the rename surface under the new name.
    ``typed_columns``: payload key → Spark SQL type for the typed
    projection; widening (int→long→double) is just declaring the
    widest type — older narrow values cast losslessly.

    Keys (and rename endpoints) may be DOTTED PATHS into nested payload
    structs (``"meta.depth": "bigint"``): the deep-flatten rule
    (VERDICT r05 #6; reference models.rs:384-423).  A nested subfield
    appearing mid-stream behaves exactly like a top-level add — absent
    → null, present → typed — because extraction is a JSON-path lookup.
    The surfaced column name flattens dots to underscores
    (:func:`surfaced_name`); two paths surfacing to the same column
    name are rejected loudly at construction.
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
        # deep-flatten collision check: every declared path must surface
        # to a distinct column name (``a.b`` and ``a_b`` both surface as
        # ``a_b`` — silently merging them would corrupt the projection)
        by_surface: dict[str, str] = {}
        for path in self.typed_columns:
            s = surfaced_name(path)
            if s in by_surface:
                raise ValueError(
                    f"payload paths {by_surface[s]!r} and {path!r} both "
                    f"surface as column {s!r} — rename one"
                )
            by_surface[s] = path

    @staticmethod
    def _extract(map_col: str, path: str) -> Column:
        """Payload-path lookup on the decoded map.  Nested objects ride
        the ``map<string,string>`` decode as their JSON text (Spark's
        ``from_json`` keeps non-string values as JSON), so a dotted
        path is one ``element_at`` for the root key plus one JVM-side
        ``get_json_object`` for the rest — no Python, no re-parse of
        the whole payload."""
        segs = path.split(".")
        root = F.element_at(F.col(map_col), segs[0])
        if len(segs) == 1:
            return root
        return F.get_json_object(root, "$." + ".".join(segs[1:]))

    def project(self, df: DataFrame, map_col: str = "_payload_map") -> DataFrame:
        """Apply renames on the map, then surface typed columns.

        Top-level renames remap the map's keys (``transform_keys``);
        dotted-path renames can't be expressed as a key remap, so they
        become per-column ``coalesce(new path, old paths…)`` lookups —
        the same shape the runner's fused projection uses."""
        flat = {o: n for o, n in self.renames.items()
                if "." not in o and "." not in n}
        if flat:
            df = df.withColumn(
                map_col,
                F.transform_keys(
                    F.col(map_col), lambda k, v: _renamed_key(k, flat)
                ),
            )
        for path, sqltype in self.typed_columns.items():
            lookups = [self._extract(map_col, path)] + [
                self._extract(map_col, old)
                for old, new in self.renames.items()
                if new == path and old not in flat
            ]
            v = F.coalesce(*lookups) if len(lookups) > 1 else lookups[0]
            df = df.withColumn(surfaced_name(path), v.cast(sqltype))
        return df

    def evolved_column_types(self) -> dict[str, str]:
        return {surfaced_name(p): t for p, t in self.typed_columns.items()}


# Rules registered for the synthetic corpus (FIXTURES.md §1
# schema_evolution scenario): `lines` appears mid-stream as int and
# widens to bigint; `author` renames to `committer`.
DEFAULT_RULES = SchemaRules(
    renames={"author": "committer"},
    typed_columns={"lines": "bigint", "committer": "string"},
)
