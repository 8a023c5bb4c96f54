"""r13 fourth probe: NON-FINITE / extreme RELATIONAL money — the r12
events.value axis applied to the star schema's measures. Plants NaN /
±Inf / ±1e300 / 1e-300 on strides into lineitem.l_extendedprice /
l_discount / l_tax / l_quantity, orders.o_totalprice, part.p_retailprice,
customer.c_acctbal, supplier.s_acctbal, and replays every oracle that
reads any of those tables. Expected hazard: the universal integer-money
discipline (cents() = CAST(ROUND(v·100) AS BIGINT)) aborts under ANSI on
both engines, plus engine-arbitrary NaN rank positions where no cast
fires."""
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
SPECIALS = [float("nan"), float("inf"), float("-inf"), 1e300, -1e300, 1e-300]

PLANT = {
    "lineitem": [("l_extendedprice", 13), ("l_discount", 17),
                 ("l_tax", 19), ("l_quantity", 23)],
    "orders": [("o_totalprice", 11)],
    "part": [("p_retailprice", 7)],
    "customer": [("c_acctbal", 9)],
    "supplier": [("s_acctbal", 5)],
}


def _plant(table: pa.Table, col: str, stride: int) -> pa.Table:
    vals = table.column(col).to_pylist()
    for i in range(len(vals)):
        if vals[i] is not None and i % stride == 3:
            vals[i] = SPECIALS[(i // stride) % len(SPECIALS)]
    idx = table.schema.get_field_index(col)
    return table.set_column(
        idx,
        table.schema.field(idx),
        pa.array(vals, pa.float64()),
    )


def build(d: str) -> None:
    for t in TABLES:
        if t in PLANT:
            tab = pq.read_table(f"{SF}/{t}.parquet")
            for col, stride in PLANT[t]:
                tab = _plant(tab, col, stride)
            pq.write_table(tab, f"{d}/{t}.parquet")
        else:
            shutil.copy(f"{SF}/{t}.parquet", f"{d}/{t}.parquet")


def names() -> list[str]:
    keys = ("lineitem", "orders", "part", "customer", "supplier")
    return [
        n for n, sql in ORACLES.items() if any(k in sql for k in keys)
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
    d = tempfile.mkdtemp(prefix="xmoney_")
    build(d)
    target = only or names()
    print(f"{len(target)} relational-measure oracles under probe")
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
                f"{''.join(traceback.format_exception_only(type(e), e)).strip()[:200]}",
                flush=True,
            )
    print(f"\n{len(reds)} red: {reds}")


if __name__ == "__main__":
    main()
