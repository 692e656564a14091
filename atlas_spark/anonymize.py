"""PII detection / anonymization — vectorized columnar re-expression.

Reference: atlas's anonymization engine (``/root/reference/src/
anonymization/engine.rs:201-291``) runs ~50 compiled regexes over every
record serially (<100 ms/record claimed).  Here the same capability is
columnar:

* **detect** — per-category match counts via builtin ``regexp_count``
  (JVM, codegen) — the per-record loop disappears (A1/A2).
* **redact** — chained ``regexp_replace`` → ``[REDACTED_<CAT>]`` (A4).
* **tokenize** — ``<CAT>_<hash>`` where hash = xxhash64 of the matched
  value: deterministic (replays reproduce — the reference's
  counter+RNG tokens, ``tokenization.rs:17-45``, are NOT reproducible;
  we fix that) (A5).  Replacement-with-function-of-match is not
  expressible with builtin regexp_replace, so this is the one place a
  **pandas UDF** (Arrow-batched, zero per-row Python calls into Spark)
  is used — the engine's designated vectorized-UDF surface.
* **audit** — SHA-256-hashed match values as an audit DataFrame (A7).
* **compliance modes** — HIPAA / GDPR category sets (A8).
* **report** — per-category counts + doc coverage (A9 dry-run report).

Patterns are standard public regexes (email/phone/SSN/IP/credit-card/
URL/date/ZIP/MRN-ish), written from scratch — category names follow
the HIPAA Safe-Harbor identifier list, which is public knowledge.
"""

from __future__ import annotations

import os
import re
import tomllib
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# --------------------------------------------------------------------- A3
# pattern registry: loaded from patterns/pii_patterns.toml (regex +
# static per-category confidence, reference analog: TOML-driven
# registry with a confidence threshold, detector/regex.rs:12-34).
# Module-level load+compile; broadcast to executors free — closures
# serialize the compiled list once per task set.

_TOML_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "patterns",
    "pii_patterns.toml",
)


def _load_registry(path: str = _TOML_PATH) -> tuple[dict[str, str], dict[str, float]]:
    with open(path, "rb") as f:
        raw = tomllib.load(f)
    patterns, confidence = {}, {}
    for cat, spec in raw.items():
        patterns[cat] = spec["pattern"]
        confidence[cat] = float(spec.get("confidence", 1.0))
        re.compile(patterns[cat])  # fail at import, not mid-job
    return patterns, confidence


PATTERNS, CONFIDENCE = _load_registry()

# A8 — compliance category sets.  HIPAA = Safe-Harbor identifiers;
# GDPR = HIPAA + quasi-identifiers (special-category adjacent).
HIPAA_CATEGORIES = [
    "EMAIL", "PHONE", "SSN", "IP_ADDRESS", "URL", "DATE", "ZIP",
    "MRN", "LICENSE", "CREDIT_CARD", "NAME", "GEO_LOCATION",
    "ACCOUNT_NUMBER", "DEVICE_ID", "VEHICLE_ID", "AGE",
]
GDPR_CATEGORIES = HIPAA_CATEGORIES + [
    "OCCUPATION", "EDUCATION", "MARITAL_STATUS", "ETHNICITY",
]
GDPR_EXTRA = ["IP_ADDRESS", "URL"]  # always-on under GDPR


def categories_for(mode: str | None) -> list[str]:
    if mode is None:
        return list(PATTERNS)
    m = mode.lower()
    if m == "hipaa":
        return [c for c in HIPAA_CATEGORIES if c in PATTERNS]
    if m == "gdpr":
        seen = list(dict.fromkeys(GDPR_CATEGORIES + GDPR_EXTRA))
        return [c for c in seen if c in PATTERNS]
    raise ValueError(f"unknown compliance mode: {mode}")


@dataclass
class Anonymizer:
    """A1 engine orchestration, columnar.

    ``confidence_threshold`` mirrors the reference's detector gate
    (detections scoring below 0.7 are dropped): every match inherits
    its category's static confidence, so the gate deactivates whole
    low-confidence categories (OCCUPATION/EDUCATION/MARITAL_STATUS/
    ETHNICITY at the default 0.7) unless the caller lowers it."""

    mode: str | None = "hipaa"
    strategy: str = "redact"  # or "tokenize"
    categories: list[str] | None = None
    confidence_threshold: float = 0.7

    def __post_init__(self):
        requested = self.categories or categories_for(self.mode)
        unknown = set(requested) - set(PATTERNS)
        if unknown:
            raise ValueError(f"unknown categories: {sorted(unknown)}")
        # Two category sets with different stakes:
        # * ``protected`` — EVERY requested category.  The mutation
        #   paths (redact/tokenize/path-addressed) use it: a compliance
        #   redaction API that silently skips a requested PII category
        #   leaks data, so the confidence gate NEVER applies there
        #   (the reference gates per-detection scores in its detector,
        #   not whole requested categories, detector/patterns/mod.rs).
        # * ``active`` — the detection/report surface (detect, report,
        #   detect_entities), where the reference's 0.7
        #   confidence gate applies: low-confidence categories don't
        #   pollute match counts and audit logs unless the caller
        #   lowers the threshold.
        self.protected = list(requested)
        self.active = [
            c for c in requested
            if CONFIDENCE[c] >= self.confidence_threshold
        ]
        dropped = [c for c in requested if c not in self.active]
        if dropped:
            import warnings

            warnings.warn(
                f"confidence_threshold={self.confidence_threshold} "
                f"deactivates {dropped} on DETECTION paths only "
                "(detect/report/detect_entities); redact/tokenize/audit "
                "still cover every requested category",
                stacklevel=2,
            )

    # ------------------------------------------------------------ detect
    def detect(self, df: DataFrame, col: str) -> DataFrame:
        """Per-row, per-category match counts (A2).  Pure builtins."""
        out = df
        for cat in self.active:
            out = out.withColumn(
                f"_n_{cat}",
                F.regexp_count(F.col(col), F.lit(PATTERNS[cat])),
            )
        return out

    def report(self, df: DataFrame, col: str) -> DataFrame:
        """A9 dry-run report: per-category totals + document coverage.

        ONE scan: all 2·N aggregates ride a single pass over the corpus
        (r01 unioned one agg per category = N scans), then ``stack``
        unpivots the single row to (category, totals) rows."""
        det = self.detect(df, col)
        aggs = []
        for cat in self.active:
            aggs.append(F.coalesce(F.sum(f"_n_{cat}"), F.lit(0))
                        .cast("long").alias(f"_t_{cat}"))
            aggs.append(
                F.coalesce(F.sum((F.col(f"_n_{cat}") > 0).cast("long")),
                           F.lit(0)).cast("long").alias(f"_d_{cat}")
            )
        one = det.agg(*aggs)
        stack_args = ", ".join(
            f"'{cat}', _t_{cat}, _d_{cat}" for cat in self.active
        )
        return one.selectExpr(
            f"stack({len(self.active)}, {stack_args}) AS "
            "(category, total_matches, docs_with_match)"
        )

    # ----------------------------------------------------------- redact
    def redact(self, df: DataFrame, col: str,
               out_col: str | None = None) -> DataFrame:
        """A4: replace every match with [REDACTED_<CAT>] — chained
        builtin regexp_replace, whole-stage codegen."""
        expr = F.col(col)
        for cat in self.protected:
            expr = F.regexp_replace(
                expr, PATTERNS[cat], f"[REDACTED_{cat}]"
            )
        return df.withColumn(out_col or col, expr)

    # --------------------------------------------------------- tokenize
    def tokenize(self, df: DataFrame, col: str,
                 out_col: str | None = None) -> DataFrame:
        """A5: replace matches with <CAT>_<xxhash-of-match> — same value
        always maps to the same token (joinable pseudonymization), and
        unlike the reference's RNG tokens it is replay-deterministic.

        Arrow-batched pandas UDF: Python runs once per ~10k-row batch,
        regex work is C (pandas .str.replace with compiled patterns).
        """
        compiled = [(c, re.compile(PATTERNS[c])) for c in self.protected]

        @pandas_udf("string")
        def _tok(s: pd.Series) -> pd.Series:
            out = s
            for cat, pat in compiled:
                out = out.str.replace(pat, _hash_token(cat), regex=True)
            return out

        return df.withColumn(out_col or col, _tok(F.col(col)))

    # --------------------------------------------------- detect entities
    def detect_entities(self, df: DataFrame, col: str,
                        key_col: str) -> DataFrame:
        """Per-detection entity rows (reference analog: PiiEntity with
        category/field-path/span/confidence, models/pii_entity.rs):
        ``(record_key, category, start, end, confidence, value_sha256)``.

        Spans need match POSITIONS, which builtin regexp_* functions
        don't expose — this is the designated Arrow-batched pandas-UDF
        surface: ONE UDF runs every active pattern per batch and emits
        an array of span structs, exploded JVM-side.  The plaintext
        match never leaves the row: it is sha256-hashed and dropped in
        the same projection (A7 discipline).
        """
        compiled = [(c, re.compile(PATTERNS[c])) for c in self.active]

        @pandas_udf(
            "array<struct<category:string,start:int,end:int,value:string>>"
        )
        def _spans(s: pd.Series) -> pd.Series:
            def one(text):
                if text is None:
                    return []
                out = []
                for cat, pat in compiled:
                    for m in pat.finditer(text):
                        out.append(
                            {"category": cat, "start": m.start(),
                             "end": m.end(), "value": m.group(0)}
                        )
                return out

            return s.map(one)

        conf_map = F.create_map(*[
            x for c in self.active
            for x in (F.lit(c), F.lit(CONFIDENCE[c]))
        ])
        return (
            df.select(
                F.col(key_col).alias("record_key"),
                F.explode(_spans(F.col(col))).alias("_e"),
            )
            .select(
                "record_key",
                F.col("_e.category").alias("category"),
                F.col("_e.start").alias("start"),
                F.col("_e.end").alias("end"),
                conf_map[F.col("_e.category")].alias("confidence"),
                F.sha2(F.col("_e.value"), 256).alias("value_sha256"),
            )
        )

    # ------------------------------------------------------------- audit
    def audit(self, df: DataFrame, col: str, key_col: str) -> DataFrame:
        """A7: hashed audit log — every detected value, SHA-256-hashed
        (never the plaintext), with its category and source key.

        Iterates ``protected`` (NOT ``active``): the audit log is the
        compliance trail of what redact/tokenize actually mutate, and
        those paths cover every requested category regardless of the
        confidence gate — an audit over ``active`` would understate
        the mutations for a below-threshold requested category
        (ADVICE r03).  Detection *reporting* (detect/report/
        detect_entities) stays gated.

        ONE scan: every category's ``regexp_extract_all`` rides a
        single projection as an array of (category, value) structs,
        flattened and exploded once (the r02 shape unioned one
        full-corpus scan per category — 20 scans for the default
        registry).  All builtins, whole-stage codegen."""
        def _tag(cat):
            # NB: a `lambda v, c=cat:` default-arg close-over would make
            # the lambda arity 2, which F.transform interprets as
            # (element, INDEX) — the category would silently become the
            # array index.  Factory function keeps arity 1.
            return lambda v: F.struct(
                F.lit(cat).alias("category"), v.alias("v")
            )

        per_cat = [
            F.transform(
                F.regexp_extract_all(F.col(col), F.lit(PATTERNS[cat]), 0),
                _tag(cat),
            )
            for cat in self.protected
        ]
        return (
            df.select(
                F.col(key_col).alias("record_key"),
                F.explode(F.flatten(F.array(*per_cat))).alias("_m"),
            )
            .select(
                "record_key",
                F.col("_m.category").alias("category"),
                F.sha2(F.col("_m.v"), 256).alias("value_sha256"),
            )
        )

    # ----------------------------------------------- path-addressed (A6)
    def _redact_expr(self, expr):
        for cat in self.protected:
            expr = F.regexp_replace(expr, PATTERNS[cat], f"[REDACTED_{cat}]")
        return expr

    def anonymize_map_field(self, df: DataFrame, map_col: str, key: str,
                            out_col: str | None = None) -> DataFrame:
        """A6 path-addressed anonymization: redact/tokenize ONLY the
        value at ``key`` inside a ``map<string,string>`` payload column
        (reference analog: replace-at-dotted-path inside the dynamic
        payload, engine.rs:316-355).  Every other entry — and every
        other column — passes through byte-identical.

        redact strategy: pure builtin ``transform_values`` (JVM,
        codegen).  tokenize strategy: the value is lifted out, run
        through the Arrow-batched token UDF, and stitched back with
        ``map_filter``+``map_concat`` (only when the key is present).
        """
        out = out_col or map_col
        if self.strategy == "tokenize":
            tokd = self.tokenize(
                df.withColumn("_pv", F.element_at(F.col(map_col), key)),
                "_pv",
            )
            replaced = F.map_concat(
                F.map_filter(F.col(map_col), lambda k, _: k != F.lit(key)),
                F.create_map(F.lit(key), F.col("_pv")),
            )
            return tokd.withColumn(
                out,
                F.when(
                    F.map_contains_key(F.col(map_col), F.lit(key)),
                    replaced,
                ).otherwise(F.col(map_col)),
            ).drop("_pv")
        return df.withColumn(
            out,
            F.transform_values(
                F.col(map_col),
                lambda k, v: F.when(
                    k == F.lit(key), self._redact_expr(v)
                ).otherwise(v),
            ),
        )

    def anonymize_struct_field(self, df: DataFrame, col: str,
                               field_path: str) -> DataFrame:
        """A6 for typed payloads: redact a dotted ``field_path`` inside
        a struct column in place (``withField`` — the rest of the
        struct is untouched)."""
        target = F.col(col).getField(field_path) if "." not in field_path \
            else F.col(f"{col}.{field_path}")
        return df.withColumn(
            col, F.col(col).withField(field_path, self._redact_expr(target))
        )

    # ------------------------------------------------------------ apply
    def anonymize(self, df: DataFrame, col: str,
                  dry_run: bool = False) -> DataFrame:
        """A1: detect → (dry-run?) → anonymize.  Dry-run returns the
        input unchanged (W6 write-elision analog)."""
        if dry_run:
            return df
        if self.strategy == "tokenize":
            return self.tokenize(df, col)
        return self.redact(df, col)


def _hash_token(cat: str):
    """Deterministic token for a regex match: <CAT>_<blake2b12>."""
    import hashlib

    def inner(m: re.Match) -> str:
        h = hashlib.blake2b(m.group(0).encode("utf-8"), digest_size=6)
        return f"{cat}_{h.hexdigest()}"

    return inner
