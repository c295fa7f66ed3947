"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``databricks_observe_spark``; this module only
adapts it to the driver contract.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from databricks_observe_spark import registry
from databricks_observe_spark.engine import prepare
from databricks_observe_spark.operators.flagship import run_flagship

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship E3 pipeline on sf0.001: filter -> write -> count -> preview."""
    tables = prepare(spark, SMOKE_SF_DIR)
    out = tempfile.mkdtemp(prefix="us_customers_") + "/us_customers.parquet"
    df, _n, _preview = run_flagship(tables, output_path=out)
    return df


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
