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

import re
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# --------------------------------------------------------------------- A3
# pattern registry (module-level compile; broadcast to executors free —
# closures serialize the compiled list once per task set)

PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "PHONE": r"\b(?:\+?1[-. ]?)?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b",
    "SSN": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "CREDIT_CARD": r"\b(?:[0-9]{4}[- ]){3}[0-9]{4}\b",
    "IP_ADDRESS": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "URL": r"https?://[^\s\"']+",
    "DATE": r"\b[0-9]{4}-[0-9]{2}-[0-9]{2}\b",
    "ZIP": r"\b[0-9]{5}(?:-[0-9]{4})?\b",
    "MRN": r"\bMRN[:# ]?[0-9]{6,10}\b",
    "LICENSE": r"\b[A-Z]{1,2}[0-9]{6,8}\b",
}

# A8 — compliance category sets
HIPAA_CATEGORIES = [
    "EMAIL", "PHONE", "SSN", "IP_ADDRESS", "URL", "DATE", "ZIP",
    "MRN", "LICENSE", "CREDIT_CARD",
]
GDPR_CATEGORIES = HIPAA_CATEGORIES  # + quasi-identifiers below
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
    """A1 engine orchestration, columnar."""

    mode: str | None = "hipaa"
    strategy: str = "redact"  # or "tokenize"
    categories: list[str] | None = None

    def __post_init__(self):
        self.active = self.categories or categories_for(self.mode)
        unknown = set(self.active) - set(PATTERNS)
        if unknown:
            raise ValueError(f"unknown categories: {sorted(unknown)}")

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
        for cat in self.active:
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
        compiled = [(c, re.compile(PATTERNS[c])) for c in self.active]

        @pandas_udf("string")
        def _tok(s: pd.Series) -> pd.Series:
            out = s
            for cat, pat in compiled:
                out = out.str.replace(pat, _hash_token(cat), regex=True)
            return out

        return df.withColumn(out_col or col, _tok(F.col(col)))

    # ------------------------------------------------------------- audit
    def audit(self, df: DataFrame, col: str, key_col: str) -> DataFrame:
        """A7: hashed audit log — every detected value, SHA-256-hashed
        (never the plaintext), with its category and source key."""
        parts = []
        for cat in self.active:
            parts.append(
                df.select(
                    F.col(key_col).alias("record_key"),
                    F.lit(cat).alias("category"),
                    F.explode(
                        F.regexp_extract_all(
                            F.col(col), F.lit(PATTERNS[cat]), 0
                        )
                    ).alias("_v"),
                ).select(
                    "record_key",
                    "category",
                    F.sha2(F.col("_v"), 256).alias("value_sha256"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

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
