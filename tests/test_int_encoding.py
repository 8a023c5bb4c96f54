"""Integer-width encoding: the differential gate must stay green when the
driver re-encodes id/key columns as int32 (plausible at small SF) instead
of today's int64. Completes the re-encode matrix beside ts
(test_ts_encoding), dates (test_date_encoding), embeddings
(test_embedding_encoding) and money (test_money_encoding).

No chokepoint normalization is needed for this class — it holds by
existing discipline, which is exactly what this module pins:
- oracles CAST every bare integer SUM back to BIGINT (the HUGEINT rule,
  CLAUDE.md), which also absorbs DuckDB's SUM(INTEGER) widening;
- COUNT is BIGINT on both engines regardless of input width;
- hash-based samplers (dataset_split / uniform_sample_k) hash an
  explicitly long-cast key, so bucket assignment is width-independent —
  Spark's hash of int32 vs int64 raw columns would NOT agree.
A future query that breaks one of these rules goes red here before the
driver can catch it live.
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_pipeline__s3_to_postgres_s3_spark.catalog import TABLES
from data_pipeline__s3_to_postgres_s3_spark.registry import ORACLES, QUERIES

from .oracle_harness import compare, duckdb_connection
from .matrix_budget import subset  # noqa: E402

INT_COLS = {
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
    "customer": ["c_custkey", "c_nationkey"],
}

# One representative per id-consuming family: exact dedup (md5 over text,
# id as group key), percentile stats, cents aggregation, sessionization,
# funnel MINs, multi-distinct profiling, the two hash samplers, a
# distribution rollup, and basket mining over exploded id pairs.
QUERIES_UNDER_TEST = [
    "dedup_exact",
    "corpus_stats",
    "pricing_summary",
    "events_sessionized",
    "funnel_conversion",
    "profile_orders",
    "dataset_split",
    "uniform_sample_k",
    "customer_order_distribution",
    "item_cooccurrence",
    # Streaming: the file-stream reader declares LongType ids against the
    # int32 parquet — Spark 4's widening type promotion must absorb it
    # (probed r5; this pin catches a regression or a stricter reader).
    "stream_hourly_rollup",
    # o_custkey int width feeds the Morton bit grid (r7).
    "zorder_manifest",
    # r8: doc_id width feeds the batch division (novelty), the split
    # hash on BOTH pair endpoints (leakage), and the shard file_idx
    # row_number (compaction) — all explicitly BIGINT-cast.
    "ngram_novelty_timeline",
    "split_leakage_report",
    "compact_manifest",
    # r9c: the FK-orphan audit is all key comparisons — int32 child keys
    # must anti-join int32 parent keys identically on both engines.
    "referential_integrity_report",
]


@pytest.fixture(scope="module")
def int32_dir(sf_small, tmp_path_factory):
    d = tmp_path_factory.mktemp("int_encoding") / "int32"
    d.mkdir()
    for t in TABLES:
        src = f"{sf_small}/{t}.parquet"
        if t not in INT_COLS:
            shutil.copy(src, str(d / f"{t}.parquet"))
            continue
        table = pq.read_table(src)
        for col in INT_COLS[t]:
            i = table.schema.get_field_index(col)
            table = table.set_column(
                i, pa.field(col, pa.int32()), table.column(i).cast(pa.int32())
            )
        pq.write_table(table, str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", subset(QUERIES_UNDER_TEST, keep=(), k=3))
def test_oracle_gate_green_under_int32_keys(spark, int32_dir, name):
    con = duckdb_connection(int32_dir)
    try:
        report = compare(QUERIES[name](spark, int32_dir), con, ORACLES[name])
        assert report["ok"], f"{name} under int32 keys: {report}"
    finally:
        con.close()
