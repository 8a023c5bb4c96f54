"""Replay the grading driver's correctness gate locally.

Usage: python tools/verify_window.py [sf_dir] [--all | --window | names...]

Mirrors the driver flow exactly: a PLAIN SparkSession (no engine confs),
__spark_entry__.entry() smoke check, then per-query
tests.oracle_harness.compare (row count + schema + order-insensitive
value hash + pandas-faithful dtypes) against DuckDB views over the same
parquet. Default scope is the 50-entry driver window; --all sweeps every
registered oracle; explicit names check just those.

Exit code 0 iff everything checked is green. Benign noise to ignore:
Spark's 'Failed to update accumulator ... non-existent accumulator'
ERROR lines (stale accumulators from completed stages in a shared
session) — the verdict line at the end is the signal.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.01"
    if args and not args[0].startswith("--") and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    scope_all = "--all" in args
    names = [a for a in args if not a.startswith("--")]

    from pyspark.sql import SparkSession

    import duckdb

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from oracle_harness import compare

    entry_rows = len(entrymod.entry(spark).collect())
    print(f"entry(): {entry_rows} row(s)")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if names:
        targets = names
    elif scope_all:
        targets = list(qs)
    else:
        targets = list(qs)[:50]

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    red: list[str] = []
    for name in targets:
        df = qs[name](spark, sf_dir)
        if name not in oracles:
            print(f"  {name}: rows-only ({df.count()} rows)")
            continue
        rep = compare(df, con, oracles[name])
        if not rep["ok"]:
            red.append(name)
            print(f"  RED {name}: " + str({
                k: rep[k]
                for k in (
                    "spark_rows",
                    "oracle_rows",
                    "cols_match",
                    "dtype_match",
                    "exact",
                    "near",
                )
            }))
    print(f"checked {len(targets)} ({'all' if scope_all else 'window' if not names else 'named'}), red: {red}")
    return 1 if red else 0


if __name__ == "__main__":
    raise SystemExit(main())
