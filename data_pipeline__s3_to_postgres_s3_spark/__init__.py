"""PySpark-native analytics engine re-expressing the capabilities of the
reference repo Arshavin023/data-pipeline__S3-to-Postgres-S3 (an Airflow +
pandas + Postgres/ClickHouse ELT pipeline) as idiomatic Spark DataFrame /
SQL programs, extended with LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) designed for 100 TB scale.

Everything here derives from public knowledge only: the Apache Spark API,
the reference repo's observable behavior, and published algorithms
(MinHash/LSH, SimHash, winnowing fingerprints).
"""

__version__ = "0.1.0"
