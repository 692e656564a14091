"""Post-replay verification: existence + content-hash equality.

The reference verifies existence only (checksum verification was
removed in its v2.1 — ``/root/reference/CHANGELOG.md:270-279``;
``src/core/verification/verify.rs:55-107``).  We verify strictly more:
per-row ``sha256(content)`` equality against the expected state — the
north-star invariant — and, like the reference's per-key failure
report (``src/core/verification/report.rs:11-108``), we can name WHICH
keys failed and why, not just how many.

Plan shape: ONE full-outer join on the key, ONE aggregation pass for
all five counters (r01 ran 2 anti-joins + 1 inner join + 2 counts = 5
jobs over the data; at 10^8 rows that is 5 shuffles for what one
shuffle answers).  The failing-key relation is the same join filtered
— Spark reuses the exchange when both are executed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

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
    # lazy relation of failing keys: (repo, path, reason,
    # actual_sha256, expected_sha256) — None unless requested
    failing_keys: DataFrame | None = field(default=None, repr=False)

    @property
    def passed(self) -> bool:
        return self.missing == 0 and self.unexpected == 0 and self.hash_mismatch == 0

    @property
    def success_rate(self) -> float:
        if self.expected_rows == 0:
            return 1.0
        ok = self.expected_rows - self.missing - self.hash_mismatch
        return max(0.0, ok / self.expected_rows)

    def sample_failures(self, n: int = 20) -> list[dict]:
        """First ``n`` failing keys with reasons (deterministic order),
        for operator-facing output.  Driver-side cost is O(n)."""
        if self.failing_keys is None or self.passed:
            return []
        rows = (
            self.failing_keys.orderBy("reason", *KEY_COLS).limit(n).collect()
        )
        return [r.asDict() for r in rows]


def _joined(actual: DataFrame, expected: DataFrame) -> DataFrame:
    a = actual.select(*KEY_COLS, F.col("content_sha256").alias("_a_sha"))
    e = expected.select(*KEY_COLS, F.col("content_sha256").alias("_e_sha"))
    j = a.join(e, KEY_COLS, "full_outer")
    reason = (
        F.when(F.col("_e_sha").isNull(), "unexpected")
        .when(F.col("_a_sha").isNull(), "missing")
        .when(F.col("_a_sha") != F.col("_e_sha"), "hash_mismatch")
    )
    return j.withColumn("reason", reason)


def verify_state(actual: DataFrame, expected: DataFrame,
                 with_detail: bool = False) -> VerifyReport:
    """Compare live table state against the oracle.

    ``expected`` must carry key cols + ``content_sha256``;
    ``actual`` likewise (the sink stores the hash at merge time via
    the builtin ``sha2``).  ``with_detail=True`` attaches the
    failing-key relation to the report (lazy; collect a sample via
    ``report.sample_failures(n)``).
    """
    j = _joined(actual, expected)
    counts = j.agg(
        F.count(F.col("_e_sha")).alias("expected_rows"),
        F.count(F.col("_a_sha")).alias("actual_rows"),
        F.count_if(F.col("reason") == "missing").alias("missing"),
        F.count_if(F.col("reason") == "unexpected").alias("unexpected"),
        F.count_if(F.col("reason") == "hash_mismatch").alias("hash_mismatch"),
    ).collect()[0]
    detail = None
    if with_detail:
        detail = (
            j.filter(F.col("reason").isNotNull())
            .select(
                *KEY_COLS, "reason",
                F.col("_a_sha").alias("actual_sha256"),
                F.col("_e_sha").alias("expected_sha256"),
            )
        )
    return VerifyReport(
        expected_rows=counts["expected_rows"],
        actual_rows=counts["actual_rows"],
        missing=counts["missing"],
        unexpected=counts["unexpected"],
        hash_mismatch=counts["hash_mismatch"],
        failing_keys=detail,
    )
