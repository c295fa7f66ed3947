from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from databricks_observe_spark.operators.flagship import america_customers, run_flagship


def test_america_customers_semantics(tables):
    df = america_customers(tables)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment", "nation", "region",
    }
    assert all(r.region == "AMERICA" for r in rows)
    # every returned customer's nation must be in AMERICA per the dims
    nations_in_america = {
        r.n_name
        for r in tables["nation"]
        .join(tables["region"], F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "AMERICA")
        .collect()
    }
    assert {r.nation for r in rows} <= nations_in_america


def test_run_flagship_write_count_preview(tables, spark):
    out = tempfile.mkdtemp(prefix="flagship_") + "/us.parquet"
    df, n, preview = run_flagship(tables, output_path=out)
    assert n == df.count()
    assert len(preview) == min(5, n)
    # preview is ordered by key (deterministic, SURVEY.md §7 hard part 6)
    keys = [r.c_custkey for r in preview]
    assert keys == sorted(keys)
    # the overwrite write round-trips
    assert spark.read.parquet(out).count() == n
    df.unpersist()
