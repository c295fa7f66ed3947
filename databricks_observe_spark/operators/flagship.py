"""Flagship query — the rebuild of ``us_customers`` (E3, SURVEY.md §3).

Reference (``assets/customer_assets.py:8-28``): read table -> equality filter
(``country == 'USA'``, CA:12) -> Delta overwrite (CA:14) -> count (CA:17) ->
limit-5 preview (CA:18). The fixture ``customer`` table has no country column,
so the rebuilt flagship derives it via customer |x| nation |x| region and
filters ``r_name = 'AMERICA'`` — same operator shape: scan -> equality filter
-> overwrite write -> count -> ordered preview.

Spark-first notes:
- nation (25 rows) and region (5 rows) are broadcast; the only scan that
  matters at 100 TB is ``customer``, and the ``r_name`` predicate reduces to a
  semi-join on a broadcast-pruned nation-key set — no shuffle of customer.
- The reference recomputes the filtered frame for each of its three actions
  (CA:14,17,18); we cache once (SURVEY.md §4 "triple recomputation").
- The preview orders by ``c_custkey`` before ``limit(5)`` for determinism
  (SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def america_customers(tables: dict[str, DataFrame]) -> DataFrame:
    """Customers in region AMERICA, enriched with nation/region names."""
    customer, nation, region = tables["customer"], tables["nation"], tables["region"]
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "AMERICA")
        .select(
            "c_custkey",
            "c_name",
            "c_acctbal",
            "c_mktsegment",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )


def run_flagship(tables: dict[str, DataFrame], output_path: str | None = None):
    """Full E3 pipeline: filter -> overwrite write -> count -> ordered preview.

    Returns (df, count, preview_rows). One cached computation feeds all three
    actions instead of the reference's three recomputations.
    """
    # caller may keep using the cached df; unpersisting is theirs
    df = america_customers(tables).cache()
    if output_path is not None:
        df.write.mode("overwrite").parquet(output_path)
    n = df.count()
    preview = df.orderBy("c_custkey").limit(5).collect()
    return df, n, preview


FLAGSHIP_ORACLE_SQL = """
SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
       n_name AS nation, r_name AS region
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
"""
