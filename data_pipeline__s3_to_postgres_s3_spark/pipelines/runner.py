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

import logging
import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")

logger = logging.getLogger("data_pipeline__s3_to_postgres_s3_spark.runner")


def run_with_retries(
    job: Callable[[], T],
    retries: int = 1,
    delay_s: float = 300.0,
    job_name: str = "job",
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Run `job`, retrying up to `retries` times with a fixed delay
    (mirroring the reference's Airflow retry posture). Raises the final
    failure — never swallows."""
    last: BaseException | None = None
    for attempt in range(retries + 1):
        try:
            return job()
        except Exception as exc:  # noqa: BLE001 — log-and-retry boundary
            last = exc
            logger.exception(
                "%s failed (attempt %d/%d)", job_name, attempt + 1, retries + 1
            )
            if attempt < retries:
                sleep(delay_s)
    assert last is not None
    raise last
