"""r12 robustness probe: EMPTY / all-invalid tables (r11 VERDICT #2).

For each table, build an sf0.001 corpus with that table truncated to 0
rows (schema preserved), plus one variant where every embeddings row is
invalid (ragged/NULL/non-finite), and replay the FULL registry through
the driver-faithful comparator. Fault-isolated; prints reds per variant.

Usage: python tools/probe_empty_tables.py [variant ...]
  variants default to all: region nation customer supplier part orders
  lineitem events documents embeddings embeddings_invalid
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


def build_variant(variant: str) -> str:
    d = tempfile.mkdtemp(prefix=f"empty_{variant}_")
    table = variant.removesuffix("_invalid")
    for t in TABLES:
        if t != table:
            shutil.copy(f"{SF}/{t}.parquet", f"{d}/{t}.parquet")
    src = pq.read_table(f"{SF}/{table}.parquet")
    if variant.endswith("_invalid"):
        # every embeddings row invalid for the _embeddings chokepoint:
        # NULL / empty / interior-NULL / NaN (no valid max-dim row left)
        emb, vids, labels = [], [], []
        for i, r in enumerate(src.to_pylist()[:40]):
            vids.append(r["vec_id"])
            labels.append(r["label"])
            if i % 4 == 0:
                emb.append(None)
            elif i % 4 == 1:
                emb.append([])
            elif i % 4 == 2:
                v = list(r["embedding"])
                v[0] = None
                emb.append(v)
            else:
                v = list(r["embedding"])
                v[1] = float("nan")
                emb.append(v)
        out = pa.table(
            {
                "vec_id": pa.array(vids, pa.int64()),
                "embedding": pa.array(emb, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        )
    else:
        out = src.schema.empty_table()
    pq.write_table(out, f"{d}/{table}.parquet")
    return d


def main() -> int:
    variants = sys.argv[1:] or (
        list(TABLES) + ["embeddings_invalid"]
    )
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
            except Exception as e:  # noqa: BLE001 — fault-isolate
                reds.append(name)
                msg = "".join(
                    traceback.format_exception_only(type(e), e)
                ).strip()
                print(f"ERR  [{variant}] {name}: {msg[:400]}", flush=True)
        all_red[variant] = reds
        print(f"== {variant}: {len(reds)} red: {reds}", flush=True)
    print("\nSUMMARY")
    for v, r in all_red.items():
        print(f"  {v}: {len(r)} {r}")
    return 1 if any(all_red.values()) else 0


if __name__ == "__main__":
    sys.exit(main())
