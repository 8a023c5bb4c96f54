"""Benchmark harness: runs the registered queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with the noop sink (full pipeline runs, nothing
collected to the driver), so Catalyst can't prune the measured work.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline__s3_to_postgres_s3_spark.config import default_sf_dir
from data_pipeline__s3_to_postgres_s3_spark.registry import QUERIES
from data_pipeline__s3_to_postgres_s3_spark.session import get_spark

# Headline set: every registered query unless listed here (slow experimental
# ops can be excluded explicitly).
EXCLUDE: set[str] = set()


def infer_sf(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    sf_dir = default_sf_dir()
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths once so per-query numbers measure the
    # engine, not first-call class loading.
    QUERIES["agg_shipments"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    per_query: dict[str, float] = {}
    total = 0.0
    for name, fn in QUERIES.items():
        if name in EXCLUDE:
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        per_query[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": infer_sf(sf_dir),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
