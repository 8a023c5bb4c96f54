"""Sources & sinks: CSV/parquet files, anonymous S3 (s3a), JDBC with
incremental watermark semantics — the engine-side replacements for the
reference's boto3-download → pandas → psycopg2 chain (SURVEY.md §2.1)."""
