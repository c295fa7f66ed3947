from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from databricks_observe_spark.engine import prepare
from databricks_observe_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    return prepare(spark, SF_DIR)
