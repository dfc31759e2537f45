"""Shared Spark fixtures for the engine test suite."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from benthos_spark.session import get_spark
    s = get_spark("tests", **{
        # tiny data: fewer shuffle partitions keeps the suite fast while
        # exercising the same plans
        "spark.sql.shuffle.partitions": "8",
    })
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
