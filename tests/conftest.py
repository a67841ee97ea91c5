"""Shared SparkSession for the test suite (module-scoped: one JVM).

With SPARK_GRAFT_ICEBERG=1 (and the iceberg-spark-runtime jar on the
classpath) the session also carries the Iceberg extensions + a local
Hadoop-catalog warehouse, enabling the Iceberg-backend contract tests in
test_catalog_incremental.py; without it those tests skip explicitly."""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ospo_ghcrawler_spark.plans.catalog import (  # noqa: E402
    iceberg_available,
    iceberg_session_conf,
)
from ospo_ghcrawler_spark.session import get_spark  # noqa: E402

ICEBERG_WANTED = os.environ.get("SPARK_GRAFT_ICEBERG") == "1"


@pytest.fixture(scope="session")
def spark():
    extra = None
    if ICEBERG_WANTED and iceberg_available():
        extra = iceberg_session_conf(tempfile.mkdtemp(prefix="iceberg_wh_"))
    s = get_spark("tests", cores=8, shuffle_partitions=8, extra_conf=extra)
    yield s
