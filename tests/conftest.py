from __future__ import annotations

import os
import socket

import pytest
from pyspark.sql import SparkSession

# Reserve a port for tests/mini_s3.MiniS3Server and point the ambient AWS
# SDK config at it BEFORE any JVM / Python worker exists: executor-side
# pyarrow S3 clients resolve credentials/endpoint from env vars inherited
# at process-tree start, so this must happen at conftest import. Harmless
# for every non-S3 test (nothing contacts the endpoint unless a test
# starts the server on this port).
_sock = socket.socket()
_sock.bind(("127.0.0.1", 0))
MINI_S3_PORT = _sock.getsockname()[1]
_sock.close()
os.environ.setdefault("AWS_ENDPOINT_URL", f"http://127.0.0.1:{MINI_S3_PORT}")
os.environ.setdefault("AWS_ACCESS_KEY_ID", "test-key")
os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "test-secret")
os.environ.setdefault("AWS_DEFAULT_REGION", "us-east-1")
os.environ.setdefault("AWS_EC2_METADATA_DISABLED", "true")


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("icedb_spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture()
def sf_dir():
    return "/root/testdata/sf0.001"
