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


def stage_s3_csv_local(
    spark: SparkSession,
    bucket: str,
    prefix: str,
    schema: StructType,
    dest_dir: str | None = None,
) -> DataFrame:
    """Driver-side staging fallback: anonymous (UNSIGNED) boto3 download of
    every CSV object under ``prefix`` into a local directory, then the
    same schema-declared quarantine read as the direct path.

    This mirrors the reference's actual extract step
    (extract_load_transform_data_pipeline.py.py:45-57: boto3 client with
    ``Config(signature_version=UNSIGNED)``, objects staged under a local
    raw-files folder) and exists for environments without the hadoop-aws
    jars, where ``read_s3_csv``'s direct s3a scan cannot run. Staging is
    idempotent per key (overwrite), and the Spark read still applies the
    declared schema + corrupt-record quarantine — no pandas hop.

    PREFER ``read_s3_csv`` at scale: staging serializes the transfer
    through one driver while s3a scans the bucket from every executor.
    The fallback is for the reference's actual workload class (a few MB
    of CSV) and for CI against a mocked endpoint."""
    try:
        import boto3
        from botocore import UNSIGNED
        from botocore.config import Config
    except ImportError as exc:  # pragma: no cover — boto3 is optional
        raise RuntimeError(
            "stage_s3_csv_local needs boto3; use read_s3_csv (s3a) instead"
        ) from exc

    import os
    import tempfile

    from .files import read_csv

    s3 = boto3.client("s3", config=Config(signature_version=UNSIGNED))
    folder = dest_dir or tempfile.mkdtemp(prefix="s3_stage_")
    os.makedirs(folder, exist_ok=True)
    keys = [
        obj["Key"]
        for page in s3.get_paginator("list_objects_v2").paginate(
            Bucket=bucket, Prefix=prefix
        )
        for obj in page.get("Contents", [])
        if obj["Key"].endswith(".csv")
    ]
    if not keys:
        raise FileNotFoundError(f"no CSV objects under s3://{bucket}/{prefix}")
    for key in keys:
        s3.download_file(bucket, key, os.path.join(folder, os.path.basename(key)))
    return read_csv(spark, folder, schema)
