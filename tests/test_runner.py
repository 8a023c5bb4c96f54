"""Retry-runner semantics: retries happen, delays apply, and failures are
NEVER swallowed (the reference's tripdata DAG bug we refuse to port)."""

from __future__ import annotations

import pytest

from data_pipeline__s3_to_postgres_s3_spark.pipelines.runner import run_with_retries


def test_succeeds_after_transient_failure():
    calls = {"n": 0}
    delays: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")
        return "ok"

    out = run_with_retries(flaky, retries=1, delay_s=7, sleep=delays.append)
    assert out == "ok"
    assert calls["n"] == 2
    assert delays == [7]


def test_exhausted_retries_reraise():
    calls = {"n": 0}

    def broken():
        calls["n"] += 1
        raise ValueError("permanent")

    with pytest.raises(ValueError, match="permanent"):
        run_with_retries(broken, retries=2, delay_s=0, sleep=lambda _: None)
    assert calls["n"] == 3


def test_no_retry_on_success():
    calls = {"n": 0}

    def fine():
        calls["n"] += 1
        return 42

    assert run_with_retries(fine, retries=3, sleep=lambda _: None) == 42
    assert calls["n"] == 1


def test_error_log_file_written_on_failure(tmp_path):
    """error_log.txt semantics (reference :20-22): every failed attempt
    appends a timestamped traceback — AND the error still re-raises."""
    log = tmp_path / "error_log.txt"

    def broken():
        raise ValueError("boom goes the pipeline")

    with pytest.raises(ValueError, match="boom"):
        run_with_retries(
            broken,
            retries=1,
            delay_s=0,
            sleep=lambda _: None,
            job_name="elt",
            error_log_path=str(log),
        )
    text = log.read_text()
    assert text.count("boom goes the pipeline") >= 2  # header + traceback ×2 attempts
    assert "Traceback" in text
    assert "elt" in text


def test_no_error_log_on_success(tmp_path):
    log = tmp_path / "error_log.txt"
    run_with_retries(lambda: 1, sleep=lambda _: None, error_log_path=str(log))
    assert not log.exists()
