"""Local replica of the driver's DuckDB differential check.

Runs a Spark query and its DuckDB oracle over the same parquet dir and
compares row count, column names, and order-insensitive values (exact for
ints/strings/dates/bools; bit-exact expected for doubles since engine and
oracle use identical arithmetic order — a tolerance fallback reports
near-misses distinctly so rounding hazards surface early).
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb

from data_pipeline__s3_to_postgres_s3_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float):
        return v
    if isinstance(v, int):
        return v
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x)), str(x)) for x in row
    )


def compare(spark_df, con, sql: str, float_tol: float = 0.0) -> dict:
    """Returns a report dict; report['ok'] is the verdict."""
    spark_cols = [c.lower() for c in spark_df.columns]
    spark_rows = [tuple(_norm(v) for v in r) for r in spark_df.collect()]

    res = con.execute(sql)
    oracle_cols = [d[0].lower() for d in res.description]
    oracle_rows = [tuple(_norm(v) for v in r) for r in res.fetchall()]

    report = {
        "ok": False,
        "spark_rows": len(spark_rows),
        "oracle_rows": len(oracle_rows),
        "cols_match": None,
        "exact": None,
        "near": None,
        "detail": "",
    }
    # Compare on common column order: sort columns by name like the driver.
    if sorted(spark_cols) != sorted(oracle_cols):
        report["cols_match"] = False
        report["detail"] = f"columns differ: spark={spark_cols} oracle={oracle_cols}"
        return report
    report["cols_match"] = True
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    o_idx = [oracle_cols.index(c) for c in sorted(oracle_cols)]
    s_rows = sorted([tuple(r[i] for i in s_idx) for r in spark_rows], key=_sort_key)
    o_rows = sorted([tuple(r[i] for i in o_idx) for r in oracle_rows], key=_sort_key)

    if len(s_rows) != len(o_rows):
        report["detail"] = "row counts differ"
        return report

    exact = True
    near = True
    first_diff = None
    for a, b in zip(s_rows, o_rows):
        if a == b:
            continue
        exact = False
        if len(a) != len(b):
            near = False
            first_diff = (a, b)
            break
        for x, y in zip(a, b):
            if x == y:
                continue
            if (
                isinstance(x, float)
                and isinstance(y, float)
                and math.isfinite(x)
                and math.isfinite(y)
                and abs(x - y) <= max(float_tol, 1e-9 * max(abs(x), abs(y)))
            ):
                continue
            near = False
            if first_diff is None:
                first_diff = (a, b)
        if not near:
            break
    report["exact"] = exact
    report["near"] = near
    report["ok"] = exact
    if first_diff:
        report["detail"] = f"first diff:\n  spark : {first_diff[0]}\n  oracle: {first_diff[1]}"
    elif not exact and near:
        report["detail"] = "values equal only within float tolerance (hash would FAIL)"
    return report
