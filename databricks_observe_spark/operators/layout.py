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


# --- Z-order layout keys (multi-dimensional clustering) ---------------------

ZORDER_BITS = 16
ZORDER_FILES = 16


def _interleave_sql(u_expr: str, h_expr: str, bits: int, shiftr) -> str:
    """Bit-interleave two ``bits``-wide integers into one Morton (Z-order)
    value, rendered as SQL. ``shiftr(expr, n)`` renders an arithmetic
    right-shift in the target dialect (Spark: ``shiftright(e, n)``;
    DuckDB: ``(e >> n)``); masking and the power-of-two scaling are plain
    integer arithmetic, bit-identical everywhere."""
    terms = []
    for i in range(bits):
        terms.append(f"(({shiftr(u_expr, i)} & 1) * {1 << (2 * i)})")
        terms.append(f"(({shiftr(h_expr, i)} & 1) * {1 << (2 * i + 1)})")
    return " + ".join(terms)


def zorder_key(t: dict[str, DataFrame]) -> DataFrame:
    """Z-order (Morton) clustering key over events(user_id, hour), plus the
    target-file assignment a lakehouse OPTIMIZE ZORDER write would use.

    The layout op behind multi-dimensional data skipping: interleaving the
    bits of the two filter dimensions gives one sort key whose ranges are
    small in BOTH dimensions, so min/max file stats prune point/range
    queries on either column. The file assignment mirrors the production
    write's physical shape — range-partition on a z-value PREFIX (the top
    bits), then cut each range into equal files by local z order — so the
    sort parallelizes across ranges instead of funnelling the table
    through one global window; deterministic because (zval, event_id) is
    a total order within each range.

    Both dimensions are masked to {ZORDER_BITS} bits (z-ordering operates
    on fixed-width prefixes; production picks width by column cardinality).
    """
    from pyspark.sql.window import Window

    u = f"(user_id % {1 << ZORDER_BITS})"
    h = f"(CAST(floor(unix_micros(ts) / 3600000000) AS BIGINT) % {1 << ZORDER_BITS})"
    z = _interleave_sql(u, h, ZORDER_BITS, lambda e, n: f"shiftright({e}, {n})")
    w = Window.partitionBy("zrange").orderBy("zval", "event_id")
    return (
        t["events"]
        .select("event_id", F.expr(z).alias("zval"))
        .withColumn("zrange", F.shiftright("zval", ZORDER_BITS).cast("int"))
        .withColumn("file_seq", F.ntile(ZORDER_FILES).over(w))
    )


def _zorder_sql() -> str:
    u = f"(user_id % {1 << ZORDER_BITS})"
    h = f"(CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) % {1 << ZORDER_BITS})"
    z = _interleave_sql(u, h, ZORDER_BITS, lambda e, n: f"({e} >> {n})")
    return f"""
SELECT event_id, zval, zrange,
       CAST(NTILE({ZORDER_FILES}) OVER (PARTITION BY zrange
                                        ORDER BY zval, event_id) AS INT)
         AS file_seq
FROM (SELECT event_id, {z} AS zval,
             CAST(({z}) >> {ZORDER_BITS} AS INT) AS zrange
      FROM events)
"""


ZORDER_KEY_SQL = _zorder_sql()


# --- skew diagnosis (the input to the salting decision) ---------------------

SKEW_TOP_K = 10


def skew_report(t: dict[str, DataFrame]) -> DataFrame:
    """Join-key skew diagnosis over events.user_id: the hottest
    {SKEW_TOP_K} keys with their share of the table and their skew factor
    vs the median key — the measurement that decides between AQE's
    automatic skew-join handling and an explicit ``salted_join``, and
    sizes the salt (``suggested_salt`` = how many tasks the hot key needs
    to look like a median key).

    One shuffle on the key (the same shuffle the skewed join itself would
    do); the stats side is a two-row broadcast. At 100 TB this runs as a
    sampled or sketched pass — the exact form is the oracle anchor.
    """
    from pyspark.sql.window import Window

    counts = t["events"].groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.agg(
        F.sum("cnt").alias("total"),
        F.expr("percentile(cnt, 0.5)").alias("median_cnt"),
    )
    # distributed top-k (TakeOrderedAndProject: per-task heaps merged on
    # the driver); the ranking window runs over the 10 survivors only
    w = Window.orderBy(F.desc("cnt"), F.asc("user_id"))
    top = (
        counts.orderBy(F.desc("cnt"), F.asc("user_id"))
        .limit(SKEW_TOP_K)
        .withColumn("rnk", F.row_number().over(w))
    )
    return top.join(F.broadcast(stats)).select(
        "rnk",
        "user_id",
        "cnt",
        F.round(F.col("cnt") / F.col("total"), 6).alias("share"),
        F.round(F.col("cnt") / F.col("median_cnt"), 6).alias("skew_factor"),
        F.ceil(F.col("cnt") / F.col("median_cnt")).cast("int").alias("suggested_salt"),
    )


SKEW_REPORT_SQL = f"""
WITH counts AS (
  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
),
stats AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total,
         quantile_cont(cnt, 0.5) AS median_cnt
  FROM counts
),
top AS (
  SELECT user_id, cnt,
         CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id ASC) AS INT) AS rnk
  FROM counts QUALIFY rnk <= {SKEW_TOP_K}
)
SELECT rnk, user_id, cnt,
       round(cnt * 1.0 / total, 6) AS share,
       round(cnt / median_cnt, 6) AS skew_factor,
       CAST(CEIL(cnt / median_cnt) AS INT) AS suggested_salt
FROM top CROSS JOIN stats
"""
