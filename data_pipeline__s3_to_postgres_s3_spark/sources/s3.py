"""Anonymous S3 (s3a) access — replaces the reference's boto3 UNSIGNED
download-to-local-disk (extract_load_transform_data_pipeline.py.py:42-63).

Spark reads the bucket directly: no local staging hop, no driver-side
download, and the scan parallelizes across executors. Credentials-free
public buckets use the AnonymousAWSCredentialsProvider.

Requires the hadoop-aws jars on the classpath at runtime; this module only
configures — it performs no network I/O at import or call time, so it is
unit-testable offline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

ANONYMOUS_PROVIDER = "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"


def s3a_anonymous_conf(endpoint: str | None = None) -> dict[str, str]:
    conf = {
        "spark.hadoop.fs.s3a.aws.credentials.provider": ANONYMOUS_PROVIDER,
        "spark.hadoop.fs.s3a.path.style.access": "true",
        # Bigger multipart/readahead defaults for bulk scans.
        "spark.hadoop.fs.s3a.readahead.range": "1M",
        "spark.hadoop.fs.s3a.experimental.input.fadvise": "sequential",
    }
    if endpoint:
        conf["spark.hadoop.fs.s3a.endpoint"] = endpoint
    return conf


def apply_s3a_anonymous(spark: SparkSession, endpoint: str | None = None) -> None:
    for k, v in s3a_anonymous_conf(endpoint).items():
        spark.conf.set(k.removeprefix("spark.hadoop."), v)


def s3_url(bucket: str, key: str = "") -> str:
    return f"s3a://{bucket}/{key}" if key else f"s3a://{bucket}/"


def read_s3_csv(
    spark: SparkSession, bucket: str, prefix: str, schema: StructType
) -> DataFrame:
    """The reference's three fixed keys under orders_data/ become one
    glob read (extract_load_transform_data_pipeline.py.py:53-57)."""
    from .files import read_csv

    apply_s3a_anonymous(spark)
    return read_csv(spark, s3_url(bucket, prefix), schema)
