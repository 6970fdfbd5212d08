"""Shared Spark session for the test suite (one JVM per run)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from ffi_etl_spark.session import get_session

    # small local parallelism: tiny unit frames don't need 32 threads
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_session("tests", master="local[4]")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
