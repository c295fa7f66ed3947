"""Composed jobs — the reference's operational entry points, end-to-end.

E1 (definition load: discovery + lineage + specs, ``__init__.py:16-20``) and
E2 (hourly profiling, ``dlt_assets.py:136-188``) as single Spark pipelines
writing their results — what a scheduler would invoke each cadence tick
(ST3). The reference's three network boundaries collapse into one driver ->
executor plan (SURVEY.md §3).
"""

from __future__ import annotations

import uuid

from pyspark.sql import SparkSession

from databricks_observe_spark.engine import prepare
from databricks_observe_spark.operators.catalog_ops import table_profiles
from databricks_observe_spark.operators.lineage import asset_specs, topo_levels
from databricks_observe_spark.operators.sinks import append_materializations


def observe_cycle(spark: SparkSession, sf_dir: str, out_dir: str) -> dict[str, int]:
    """One full observation tick: discover -> enrich -> lineage -> specs,
    profile every table, and append the materialization log.

    Returns row counts per written output (the driver-visible effect of a
    schedule tick). All three outputs derive from one prepared context, so
    shared scans (information_schema, edges) are planned once.
    """
    ctx = prepare(spark, sf_dir)
    run_id = uuid.uuid4().hex[:12]

    specs = asset_specs(ctx)
    specs.write.mode("overwrite").parquet(f"{out_dir}/asset_specs")

    levels = topo_levels(ctx)
    levels.write.mode("overwrite").parquet(f"{out_dir}/topo_levels")

    profiles = table_profiles(ctx)
    append_materializations(profiles, f"{out_dir}/materializations", run_id)

    return {
        "asset_specs": spark.read.parquet(f"{out_dir}/asset_specs").count(),
        "topo_levels": spark.read.parquet(f"{out_dir}/topo_levels").count(),
        "materializations": spark.read.parquet(f"{out_dir}/materializations").count(),
    }
