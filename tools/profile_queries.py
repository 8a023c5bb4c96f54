"""Per-query profiler for the optimization rounds.

Usage: python tools/profile_queries.py [sf_dir] [--runs N] [--plans DIR]
                                       [--suffix S] [names...]

For each named query (default: every registered query) measure, in ONE
process after the bench's standard warm-up pair:
  - t_build: DataFrame construction (Python + analysis + any bounded
    collects the operator does while building, e.g. memoized trainers)
  - t_exec: noop-sink execution of the built frame
  - repeat --runs times (first run = cold-ish, later runs = warm; the
    builder's A/B rule: never trust a single cold number)

With --plans DIR, also write DIR/<name>_<suffix>.txt containing
``explain('formatted')`` for each query (streaming queries excluded —
their returned sink table's plan is not the streaming plan; they get a
"streaming sink table" stub so the judge sees why).

Output: one JSON line per query on stdout (machine-diffable), plus a
sorted summary table on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline__s3_to_postgres_s3_spark.registry import QUERIES  # noqa: E402
from data_pipeline__s3_to_postgres_s3_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and not args[0].startswith("--") and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    runs = 2
    plans_dir = None
    suffix = "before"
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--plans":
            plans_dir = args[i + 1]; i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    if not names:
        names = sorted(QUERIES)

    spark = get_spark(app_name="profile")
    spark.sparkContext.setLogLevel("ERROR")
    for warm in ("agg_shipments", "stream_user_running_max"):
        try:
            QUERIES[warm](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # noqa: BLE001
            print(f"warm-up {warm} failed: {exc}", file=sys.stderr)

    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)

    rows = []
    for name in names:
        fn = QUERIES[name]
        rec: dict[str, object] = {"name": name}
        samples = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"profile:{name}#{r}")
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
            except Exception as exc:  # noqa: BLE001
                rec["err"] = f"build: {type(exc).__name__}: {exc}"[:200]
                break
            t1 = time.perf_counter()
            try:
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001
                rec["err"] = f"exec: {type(exc).__name__}: {exc}"[:200]
                break
            t2 = time.perf_counter()
            samples.append((round(t1 - t0, 3), round(t2 - t1, 3)))
            if plans_dir and r == 0 and not name.startswith("stream_"):
                try:
                    txt = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                except Exception:  # noqa: BLE001
                    import io
                    from contextlib import redirect_stdout

                    buf = io.StringIO()
                    with redirect_stdout(buf):
                        df.explain("formatted")
                    txt = buf.getvalue()
                with open(
                    os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w"
                ) as f:
                    f.write(txt)
            elif plans_dir and r == 0:
                with open(
                    os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w"
                ) as f:
                    f.write(
                        "streaming query: executes on construction via "
                        "AvailableNow trigger; the returned frame is the "
                        "materialized sink table, not the streaming plan.\n"
                    )
        rec["samples"] = samples  # [(t_build, t_exec), ...]
        if samples:
            rec["build_min"] = min(s[0] for s in samples)
            rec["exec_min"] = min(s[1] for s in samples)
            rec["total_min"] = min(s[0] + s[1] for s in samples)
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    timed = [r for r in rows if "total_min" in r]
    timed.sort(key=lambda r: -r["total_min"])  # type: ignore[operator]
    print(f"\n{'query':42s} {'build':>7s} {'exec':>7s} {'total':>7s}", file=sys.stderr)
    for r in timed:
        print(
            f"{r['name']:42s} {r['build_min']:7.2f} {r['exec_min']:7.2f}"
            f" {r['total_min']:7.2f}",
            file=sys.stderr,
        )
    tot = sum(r["total_min"] for r in timed)
    print(f"{'TOTAL (min-of-runs)':42s} {'':7s} {'':7s} {tot:7.2f}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
