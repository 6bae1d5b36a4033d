from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from flink_notebooks_spark.session import get_spark

    s = get_spark("pytest", cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "4")))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    from flink_notebooks_spark.testing import duck_con

    return duck_con(sf_dir)
