"""r13 third probe: NEGATIVE ids — the sign complement of the r9 wide-
int64 axis. A feed that derives ids from a signed hash ships negatives;
the hazards hunted are modulo sign semantics (Spark % and DuckDB %
both take the dividend's sign, but every mirrored `id % K` bucket/
split/sample site must agree on NEGATIVE buckets), the split_hash
mulmod discipline under negative inputs, query-set selection
(vec_id < N_QUERIES admits negatives), and MIN/watermark arithmetic.

Plants negated ids on strides into documents.doc_id, embeddings.vec_id,
events.event_id/user_id, and replays every oracle that reads any of the
three tables.
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


def _negate(table: pa.Table, col: str, stride: int) -> pa.Table:
    vals = table.column(col).to_pylist()
    for i in range(len(vals)):
        if vals[i] is not None and i % stride == 3:
            vals[i] = -vals[i] - 1  # -1 keeps 0 out of its own image
    idx = table.schema.get_field_index(col)
    return table.set_column(
        idx,
        table.schema.field(idx),
        pa.array(vals, table.schema.field(idx).type),
    )


def build(d: str) -> None:
    for t in TABLES:
        if t in ("documents", "embeddings", "events"):
            continue
        shutil.copy(f"{SF}/{t}.parquet", f"{d}/{t}.parquet")
    docs = pq.read_table(f"{SF}/documents.parquet")
    pq.write_table(_negate(docs, "doc_id", 7), f"{d}/documents.parquet")
    emb = pq.read_table(f"{SF}/embeddings.parquet")
    pq.write_table(_negate(emb, "vec_id", 9), f"{d}/embeddings.parquet")
    ev = pq.read_table(f"{SF}/events.parquet")
    ev = _negate(ev, "event_id", 11)
    ev = _negate(ev, "user_id", 13)
    pq.write_table(ev, f"{d}/events.parquet")


def names() -> list[str]:
    return [
        n
        for n, sql in ORACLES.items()
        if "documents" in sql or "embeddings" in sql or "events" in sql
    ]


def main() -> None:
    only = sys.argv[1:]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="negid_")
    build(d)
    target = only or names()
    print(f"{len(target)} doc/emb/event-reading oracles under probe")
    reds = []
    for name in target:
        try:
            con = duckdb_connection(d)
            try:
                rep = compare(QUERIES[name](spark, d), con, ORACLES[name])
            finally:
                con.close()
            if not rep["ok"]:
                reds.append(name)
                print(
                    f"RED  {name}: "
                    f"{ {k: v for k, v in rep.items() if k != 'ok'} }",
                    flush=True,
                )
        except Exception as e:  # noqa: BLE001
            reds.append(name)
            print(
                f"ERR  {name}: "
                f"{''.join(traceback.format_exception_only(type(e), e)).strip()[:300]}",
                flush=True,
            )
    print(f"\n{len(reds)} red: {reds}")


if __name__ == "__main__":
    main()
