"""Job-level retry + error-logging control plane (SURVEY.md §2.10 C2/C4).

The reference configures Airflow `retries=1` with a 5-minute delay
(extract_load_transform_data_pipeline.py.py:32-34) and logs failures to
error_log.txt with wrap-and-raise — EXCEPT the tripdata DAG, which swallows
extract errors (`except: logging.info`, tripdata_monthly_metrics.py:89-90)
and silently writes nothing. That swallow is a bug we deliberately do NOT
reproduce: here every failure is logged with traceback and the last one is
re-raised. Spark task-level retries are separate (spark.task.maxFailures);
this wrapper is for whole-job transients (JDBC outages, S3 throttling).
"""

from __future__ import annotations

import datetime
import logging
import time
import traceback
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")

logger = logging.getLogger("data_pipeline__s3_to_postgres_s3_spark.runner")


def append_error_log(path: str, job_name: str, exc: BaseException) -> None:
    """Append a timestamped traceback to `path` — the reference's
    error_log.txt sink (extract_load_transform_data_pipeline.py.py:20-22)
    minus the swallow: callers still re-raise. Best-effort by design; a
    failing log sink must never mask the original error."""
    try:
        with open(path, "a", encoding="utf-8") as fh:
            fh.write(
                f"{datetime.datetime.now().isoformat()} {job_name}: "
                f"{exc}\n{traceback.format_exc()}\n"
            )
    except OSError:
        logger.warning("could not append to error log %s", path, exc_info=True)


def run_with_retries(
    job: Callable[[], T],
    retries: int = 1,
    delay_s: float = 300.0,
    job_name: str = "job",
    sleep: Callable[[float], None] = time.sleep,
    error_log_path: str | None = None,
) -> T:
    """Run `job`, retrying up to `retries` times with a fixed delay
    (mirroring the reference's Airflow retry posture). Raises the final
    failure — never swallows. When `error_log_path` is set, every failed
    attempt also appends a timestamped traceback there (the reference's
    error_log.txt semantics)."""
    last: BaseException | None = None
    for attempt in range(retries + 1):
        try:
            return job()
        except Exception as exc:  # noqa: BLE001 — log-and-retry boundary
            last = exc
            logger.exception(
                "%s failed (attempt %d/%d)", job_name, attempt + 1, retries + 1
            )
            if error_log_path is not None:
                append_error_log(error_log_path, job_name, exc)
            if attempt < retries:
                sleep(delay_s)
    assert last is not None
    raise last
