"""Streaming → warehouse upsert sink via foreachBatch.

Structured Streaming's built-in JDBC support is append-only; production
pipelines need UPSERT (update-mode aggregations emit changed keys per
micro-batch). The standard pattern, implemented here: land each micro-batch
in a staging table through Spark's parallel JDBC writer, then run one
atomic MERGE from staging into the target on the warehouse side.

Why this scales:
- the per-batch data movement is Spark's normal partitioned JDBC write
  (numPartitions connections, batched inserts) — only the MERGE statement
  runs on the driver, and it ships NO rows (it references the two
  warehouse tables).
- MERGE is keyed, so replaying a micro-batch (checkpoint recovery) lands
  the same values — the sink is idempotent, which is exactly what
  foreachBatch's at-least-once contract requires for end-to-end
  exactly-once results.

Exercised live against embedded Derby in tests/test_jdbc_integration.py
(same jars Spark bundles for its Hive metastore).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.jdbc import JdbcTarget, _check_identifier


def _merge_sql(target_table: str, staging_table: str, key: str, cols: list[str]) -> str:
    """Keyed MERGE (ANSI, Derby-compatible). Identifiers validated; columns
    ANSI-quoted because Spark's JDBC writer creates them case-sensitive."""
    t = _check_identifier(target_table, "target table")
    s = _check_identifier(staging_table, "staging table")
    k = _check_identifier(key, "key column")
    value_cols = [c for c in cols if c != k]
    for c in value_cols:
        _check_identifier(c, "value column")
    sets = ", ".join(f'"{c}" = s."{c}"' for c in value_cols)
    all_q = ", ".join(f'"{c}"' for c in cols)
    all_s = ", ".join(f's."{c}"' for c in cols)
    return (
        f'MERGE INTO {t} t USING {s} s ON t."{k}" = s."{k}" '
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({all_q}) VALUES ({all_s})"
    )


def jdbc_upsert_writer(target: JdbcTarget, staging: JdbcTarget, key: str):
    """foreachBatch callback: micro-batch → staging (parallel JDBC write),
    then one driver-side MERGE into the target.

    Usage:
        q = (updates.writeStream.outputMode("update")
             .foreachBatch(jdbc_upsert_writer(target, staging, "user_id"))
             .option("checkpointLocation", ckpt).start())
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns:
            return
        (
            batch_df.write.format("jdbc")
            .options(**staging.options())
            .mode("overwrite")
            .save()
        )
        sql = _merge_sql(target.table, staging.table, key, batch_df.columns)
        jvm = batch_df.sparkSession._jvm
        conn = jvm.java.sql.DriverManager.getConnection(target.url)
        try:
            stmt = conn.createStatement()
            try:
                stmt.execute(sql)
            finally:
                stmt.close()
        finally:
            conn.close()

    return _write
