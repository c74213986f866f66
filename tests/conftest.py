"""Shared Spark fixture for the whole suite — one local session, small
shuffle fan-out for fast tests (semantics identical at any partition count).
"""

from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from metadata_ingestion_framework_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    return get_spark(shuffle_partitions=4)


@pytest.fixture()
def emp(spark):
    """The reference's emp fixture (src/test/resources/emp.csv — 5 rows,
    DDL 'empid int, ename string, sal double, deptno int, comm int')."""
    return spark.createDataFrame(
        [
            (7839, "KING", 5000.0, 10, None),
            (7698, "BLAKE", 2850.0, 30, None),
            (7782, "CLARK", 2450.0, 10, None),
            (7566, "JONES", 2975.0, 20, None),
            (5467, "WILSON", 1000.0, 30, 400),
        ],
        "empid int, ename string, sal double, deptno int, comm int",
    )
