"""Sinks — the write side (K1/K2), designed for the 100 TB layout.

Reference writes: Delta overwrite ``saveAsTable`` (K1,
``customer_assets.py:14``) and materialization-event emission (K2,
``dlt_assets.py:172-183``). Rebuilt as:

- ``overwrite_table``      — K1: format-negotiated overwrite (Delta when the
  package is present, parquet otherwise — same mode semantics).
- ``write_events_by_date`` — the scale layout for the event stream: parquet
  partitioned by event date, so every time-bounded operator in
  operators/events.py becomes partition-pruned at the source.
- ``append_materializations`` — K2: the profiling job's output as an
  append-only log with run metadata, the idempotent-sink shape the
  streaming ST2 pipeline writes through foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def delta_available(spark) -> bool:
    try:
        # py4j package traversal never raises; force real classloading
        spark._jvm.java.lang.Class.forName("org.apache.spark.sql.delta.DeltaLog")
        return True
    except Exception:
        return False


def negotiate_format(spark, fmt: str | None = None) -> str:
    """K1 format negotiation, separated from the write so the Delta branch
    is unit-testable in environments that ship no delta-spark: an explicit
    request wins; otherwise Delta when the classes load, else parquet."""
    return fmt or ("delta" if delta_available(spark) else "parquet")


def overwrite_table(df: DataFrame, path: str, fmt: str | None = None) -> str:
    """K1 semantics: full overwrite of a managed location. Returns the
    format used. Delta if requested/available, else parquet."""
    fmt = negotiate_format(df.sparkSession, fmt)
    df.write.format(fmt).mode("overwrite").save(path)
    return fmt


def write_events_by_date(events: DataFrame, path: str) -> None:
    """Partition the event stream by date — the layout that turns every
    ts-range predicate into partition pruning at 100 TB. Files within a
    partition stay sorted by ts for row-group min/max skipping."""
    (
        events.withColumn("event_date", F.to_date("ts"))
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )


def append_materializations(profiles: DataFrame, path: str, run_id: str) -> None:
    """K2: append one materialization row per profiled asset with run
    metadata (the AssetMaterialization event of DA:172-183, as a table)."""
    (
        profiles.withColumn("run_id", F.lit(run_id))
        .withColumn("materialized_at", F.current_timestamp())
        .write.mode("append")
        .parquet(path)
    )
