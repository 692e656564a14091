"""Post-replay verification: existence + content-hash equality.

The reference verifies existence only (checksum verification was
removed in its v2.1 — ``/root/reference/CHANGELOG.md:270-279``;
``src/core/verification/verify.rs:55-107``).  We verify strictly more:
per-row ``sha256(content)`` equality against the expected state — the
north-star invariant — via distributed anti-joins, not driver loops.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY_COLS = ["repo", "path"]


@dataclass
class VerifyReport:
    expected_rows: int
    actual_rows: int
    missing: int        # expected but absent from actual
    unexpected: int     # present in actual but not expected
    hash_mismatch: int  # key present on both sides, sha256 differs

    @property
    def passed(self) -> bool:
        return self.missing == 0 and self.unexpected == 0 and self.hash_mismatch == 0

    @property
    def success_rate(self) -> float:
        if self.expected_rows == 0:
            return 1.0
        ok = self.expected_rows - self.missing - self.hash_mismatch
        return max(0.0, ok / self.expected_rows)


def verify_state(actual: DataFrame, expected: DataFrame) -> VerifyReport:
    """Compare live table state against the oracle.

    ``expected`` must carry key cols + ``content_sha256``;
    ``actual`` likewise (the sink stores the hash at merge time via
    the builtin ``sha2``).
    """
    a = actual.select(*KEY_COLS, "content_sha256")
    e = expected.select(*KEY_COLS, "content_sha256")
    missing = e.join(a, KEY_COLS, "left_anti").count()
    unexpected = a.join(e, KEY_COLS, "left_anti").count()
    joined = a.alias("a").join(e.alias("e"), KEY_COLS, "inner")
    mismatch = joined.filter(
        F.col("a.content_sha256") != F.col("e.content_sha256")
    ).count()
    return VerifyReport(
        expected_rows=e.count(),
        actual_rows=a.count(),
        missing=missing,
        unexpected=unexpected,
        hash_mismatch=mismatch,
    )
