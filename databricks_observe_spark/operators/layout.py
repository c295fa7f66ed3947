"""Physical-layout operators: bucketing and skew salting (SURVEY.md §4).

The two shuffle-elimination levers a 100 TB deployment leans on, made
concrete and unit-testable:

- ``write_bucketed`` / ``bucketed_join`` — co-located joins: both fact
  tables bucketed by the join key into the warehouse; the join then
  requires NO exchange (asserted in tests on the physical plan). At scale
  this converts the nightly lineitem |x| orders shuffle into a local
  zip of pre-sorted buckets.
- ``salted_join`` — skew handling when one key dominates: the hot side's
  key is salted k ways, the small side replicated k ways; results are
  identical to the plain join (tested), but the hot key's rows spread
  over k tasks instead of one straggler. AQE's skew-join handles the
  moderate case automatically; explicit salting is the heavy-hammer for
  pathological keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_bucketed(
    df: DataFrame, table_name: str, key: str, buckets: int = 8
) -> None:
    """Persist as a bucketed+sorted managed table (bucket pruning and
    exchange-free joins for every downstream consumer of ``key``).

    Idempotent: drops the table and clears a stale warehouse location left
    by a previous crashed run before writing.
    """
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table_name.lower()}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two tables bucketed on the same key: Catalyst sees matching
    output partitionings and plans a SortMergeJoin with ZERO exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on=key)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join with the big side's key salted ``salt_buckets`` ways.

    big rows get a deterministic-per-row salt (crc32 of the full row's
    key + a partition-stable counter is overkill here: a uniform random
    salt changes no results because the small side is replicated across
    ALL salts). Output columns match ``big.join(small, key)``.
    """
    salted_big = big.withColumn(
        "_salt", (F.crc32(F.col(key).cast("string")) + F.monotonically_increasing_id()) % salt_buckets
    )
    salts = big.sparkSession.range(salt_buckets).select(
        F.col("id").cast("long").alias("_salt")
    )
    replicated_small = small.crossJoin(F.broadcast(salts))
    return (
        salted_big.join(replicated_small, on=[key, "_salt"])
        .drop("_salt")
    )


def write_partitioned(
    df: DataFrame, path: str, partition_col: str, mode: str = "overwrite"
) -> None:
    """Persist parquet partitioned by ``partition_col`` (hive-style
    directories). At 100 TB this is how fact tables land: a predicate on
    the partition column prunes directories at planning time, so a
    one-day query over a year of data reads 1/365th of the files."""
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


def read_pruned(spark, path: str, partition_col: str, value) -> DataFrame:
    """Read back with a partition predicate — Catalyst resolves the
    filter against the directory layout (PartitionFilters in the scan,
    zero data files opened outside the matching partition)."""
    return spark.read.parquet(path).filter(F.col(partition_col) == value)
