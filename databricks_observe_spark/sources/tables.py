"""Parquet fixture sources.

Stands in for the reference's remote scans — ``spark.read.table`` at
``assets/customer_assets.py:11`` (S7) and the information_schema scans at
``assets/dlt_assets.py:87-91,159-166`` (S4/S5) — as local parquet reads.

Design notes for scale (SURVEY.md §4): these are plain ``spark.read.parquet``
scans, so Catalyst pushes predicates and prunes columns into the parquet
reader for every downstream operator; nothing here collects or caches by
default. ``events`` carries a nanosecond parquet timestamp — we normalize to
Spark's microsecond TIMESTAMP once at load so window/session operators and
the DuckDB oracle agree (SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from databricks_observe_spark.session import ensure_conf

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def fan_out(df: DataFrame) -> DataFrame:
    """Raise a frame's partition count to the session's core count when the
    physical scan under-splits — and ONLY then.

    The fixtures are single-row-group parquet files, which a row-group-
    aligned reader cannot split: every downstream map stage (tokenize,
    shingle, trigram, Arrow rescore) runs as ONE task no matter how many
    cores the session has. CPU-heavy index builders route their input
    through this helper so that work fans out across the machine.

    At production scale a 100 TB table scans as thousands of splits, the
    guard sees partitions >= cores, and this is a no-op — it never adds a
    shuffle to a well-split scan. ``rdd.getNumPartitions()`` inspects the
    physical plan without running a job, so the check itself is free.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every fixture table and register it as a temp view.

    Returns a dict name -> DataFrame. Idempotent: re-registering views is
    cheap and keeps `spark.sql(...)` usable everywhere.
    """
    ensure_conf(spark)
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        df = spark.read.parquet(path)
        if name == "events":
            # parquet ts is TIMESTAMP(NANOS): read as long (nanosAsLong conf in
            # ensure_conf) and convert to Spark's microsecond TIMESTAMP. The
            # fixtures are micro-aligned so this is lossless and agrees with
            # the DuckDB oracle's nanosecond view of the same file.
            # integer division — float division would lose ns precision on
            # int64-sized epochs and shift timestamps by 1 microsecond
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
