"""App-level retry with exponential backoff for external sink calls.

Reference analog: the bulk writer's per-request retry loop with
backoff (``/root/reference/src/adapters/cosmosdb/bulk.rs:144-185``,
``ehrbase.rs:123-161``).  The manifest LakehouseSink does not need
this — Spark task retry plus idempotent epoch re-merge covers it —
but calls that leave the JVM for an external service (Iceberg REST
catalogs, object stores, JDBC) fail transiently and deserve bounded
retries rather than an epoch abort.

Retrying a MERGE INTO is safe here: the LWW guard (``s.seq >= t.seq``
re-applying identical values) makes a duplicate merge a no-op, and the
epoch fence makes a duplicate txn append detectable.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable
from typing import TypeVar

log = logging.getLogger(__name__)

T = TypeVar("T")

# exception types worth retrying; everything else (AnalysisException,
# schema errors, ...) is a bug and must surface immediately
TRANSIENT_MARKERS = (
    "timeout", "timed out", "connection", "unavailable", "throttl",
    "rate limit", "503", "429", "temporarily", "CommitFailedException",
)


def is_transient(exc: BaseException) -> bool:
    msg = f"{type(exc).__name__}: {exc}".lower()
    return any(m.lower() in msg for m in TRANSIENT_MARKERS)


def with_retries(fn: Callable[[], T], *, attempts: int = 4,
                 base_delay_s: float = 0.5, max_delay_s: float = 8.0,
                 retry_if: Callable[[BaseException], bool] = is_transient,
                 sleep: Callable[[float], None] = time.sleep,
                 label: str = "external call") -> T:
    """Run ``fn`` with up to ``attempts`` tries, exponential backoff
    (base · 2^i, capped).  Non-transient exceptions raise immediately;
    the final transient failure re-raises.  ``sleep`` is injectable for
    tests."""
    last: BaseException | None = None
    for i in range(attempts):
        try:
            return fn()
        except BaseException as exc:  # noqa: BLE001
            if not retry_if(exc):
                raise
            last = exc
            if i == attempts - 1:
                break
            delay = min(base_delay_s * (2 ** i), max_delay_s)
            log.warning(
                "%s failed (attempt %d/%d): %s — retrying in %.1fs",
                label, i + 1, attempts, exc, delay,
            )
            sleep(delay)
    assert last is not None
    raise last
