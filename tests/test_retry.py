"""Retry/backoff wrapper for external sink calls (W4 hardening;
reference analog: bulk.rs:144-185 retry loop)."""

import pytest

from atlas_spark.sinks.retry import is_transient, with_retries


def test_succeeds_after_transient_failures():
    calls, delays = [], []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("connection reset by peer")
        return "ok"

    out = with_retries(flaky, attempts=4, base_delay_s=0.5,
                       sleep=delays.append)
    assert out == "ok"
    assert len(calls) == 3
    assert delays == [0.5, 1.0]  # exponential


def test_non_transient_raises_immediately():
    calls = []

    def broken():
        calls.append(1)
        raise ValueError("column `bogus` does not exist")

    with pytest.raises(ValueError):
        with_retries(broken, attempts=5, sleep=lambda _: None)
    assert len(calls) == 1  # no retry on a non-transient bug


def test_exhausted_attempts_reraise_last():
    calls, delays = [], []

    def always():
        calls.append(1)
        raise TimeoutError("request timed out")

    with pytest.raises(TimeoutError):
        with_retries(always, attempts=3, base_delay_s=1.0,
                     max_delay_s=1.5, sleep=delays.append)
    assert len(calls) == 3
    assert delays == [1.0, 1.5]  # capped at max_delay_s


def test_is_transient_classifier():
    assert is_transient(RuntimeError("HTTP 503 service unavailable"))
    assert is_transient(Exception("CommitFailedException: retryable"))
    assert not is_transient(ValueError("schema mismatch"))
