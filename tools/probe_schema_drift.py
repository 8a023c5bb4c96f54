"""r14 robustness probe: SCHEMA DRIFT (r13 VERDICT #3).

The driver regenerates /root/testdata between rounds and may change the
physical schema, not just value encodings (the r13 partial-schema
gotcha — narrow projections hitting UNRESOLVED_COLUMN at the dirtiness
probes — was the tip of this class). For each table, build an sf0.001
corpus with that table's schema drifted and replay the FULL registry
through the driver-faithful comparator:

- ``<table>_extra``     — a never-referenced extra column spliced in at
                          position 0 (added-column drift; also breaks
                          any hidden positional assumption)
- ``<table>_reordered`` — column order reversed (ordinal drift)
- ``lineitem_narrow``   — measure/key columns narrowed to int32/float32
                          where values fit (the inverse of the pinned
                          int32→int64 widening axis)
- ``all_required``      — every field marked non-nullable in parquet
                          metadata (nullability flip)

Dropped REQUIRED columns are not probed: a feed that loses a column a
query selects is a broken contract and a loud UNRESOLVED_COLUMN is the
correct behavior.

Usage: python tools/probe_schema_drift.py [variant ...]
"""
from __future__ import annotations

import shutil
import sys
import tempfile
import traceback

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import SparkSession

from data_pipeline__s3_to_postgres_s3_spark.catalog import TABLES
from data_pipeline__s3_to_postgres_s3_spark.registry import ORACLES, QUERIES

from oracle_harness import compare, duckdb_connection

SF = "/root/testdata/sf0.001"


def _drift(table: str, kind: str) -> pa.Table:
    src = pq.read_table(f"{SF}/{table}.parquet")
    if kind == "extra":
        col = pa.array(["drift"] * src.num_rows, pa.string())
        return src.add_column(0, pa.field("_schema_drift_extra", pa.string()), col)
    if kind == "reordered":
        return src.select(list(reversed(src.column_names)))
    if kind == "narrow":
        # narrow every int64 whose values fit int32, and every float64
        # list to float32 — the encodings a space-conscious regeneration
        # would pick.
        cols, fields = [], []
        for f in src.schema:
            c = src.column(f.name)
            if pa.types.is_int64(f.type):
                import pyarrow.compute as pc

                mn, mx = pc.min(c).as_py(), pc.max(c).as_py()
                if mn is not None and -(2**31) <= mn and mx < 2**31:
                    c = c.cast(pa.int32())
                    f = pa.field(f.name, pa.int32())
            cols.append(c)
            fields.append(f)
        return pa.table(dict(zip([f.name for f in fields], cols)))
    if kind == "required":
        fields = [
            pa.field(f.name, f.type, nullable=False)
            if not src.column(f.name).null_count
            else f
            for f in src.schema
        ]
        return src.cast(pa.schema(fields))
    raise ValueError(kind)


def build_variant(variant: str) -> str:
    d = tempfile.mkdtemp(prefix=f"drift_{variant}_")
    if variant == "all_required":
        for t in TABLES:
            pq.write_table(_drift(t, "required"), f"{d}/{t}.parquet")
        return d
    table, kind = variant.rsplit("_", 1)
    for t in TABLES:
        if t != table:
            shutil.copy(f"{SF}/{t}.parquet", f"{d}/{t}.parquet")
    pq.write_table(_drift(table, kind), f"{d}/{table}.parquet")
    return d


def default_variants() -> list[str]:
    out = []
    for t in TABLES:
        out.append(f"{t}_extra")
        out.append(f"{t}_reordered")
    out.append("lineitem_narrow")
    out.append("all_required")
    return out


def main() -> int:
    variants = sys.argv[1:] or default_variants()
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    all_red: dict[str, list[str]] = {}
    for variant in variants:
        d = build_variant(variant)
        reds: list[str] = []
        for name, fn in QUERIES.items():
            try:
                df = fn(spark, d)
                if name not in ORACLES:
                    df.count()  # rows-only: must not crash
                    continue
                con = duckdb_connection(d)
                try:
                    rep = compare(df, con, ORACLES[name])
                finally:
                    con.close()
                if not rep["ok"]:
                    reds.append(name)
                    print(
                        f"RED  [{variant}] {name}: "
                        f"{ {k: v for k, v in rep.items() if k != 'ok'} }",
                        flush=True,
                    )
            except Exception:  # noqa: BLE001 — fault-isolate
                reds.append(name)
                print(
                    f"RED  [{variant}] {name}: "
                    f"{traceback.format_exc(limit=1).splitlines()[-1]}",
                    flush=True,
                )
        print(f"==== {variant}: {len(reds)} red", flush=True)
        all_red[variant] = reds
        shutil.rmtree(d, True)
    total = sum(len(v) for v in all_red.values())
    print(f"TOTAL reds: {total}")
    for v, reds in all_red.items():
        if reds:
            print(f"  {v}: {reds}")
    return 1 if total else 0


if __name__ == "__main__":
    sys.exit(main())
