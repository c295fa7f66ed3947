"""Parquet fixture sources.

Stands in for the reference's remote scans — ``spark.read.table`` at
``assets/customer_assets.py:11`` (S7) and the information_schema scans at
``assets/dlt_assets.py:87-91,159-166`` (S4/S5) — as local parquet reads.

Design notes for scale (SURVEY.md §4): these are plain ``spark.read.parquet``
scans, so Catalyst pushes predicates and prunes columns into the parquet
reader for every downstream operator; nothing here collects or caches by
default. ``events.ts``'s physical parquet type has varied across fixture
re-materializations (TIMESTAMP(NANOS) read as long, TIMESTAMP(MICROS) read
as TIMESTAMP_NTZ) — we DETECT the layout and normalize to Spark's
microsecond TIMESTAMP once at load so window/session operators and the
DuckDB oracle agree (SURVEY.md §7 hard part 4; VERDICT r02 item 1).
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

# Physical types we accept per contract-critical column. The fixtures are
# driver-generated and have been re-materialized with different physical
# types across rounds (ts: timestamp[ns]-read-as-long, then timestamp[us]);
# the loader DETECTS the layout instead of assuming one, and anything
# outside this set fails with a named error instead of a Catalyst
# DATATYPE_MISMATCH deep inside a query plan.
_EVENTS_TS_TYPES = ("bigint", "timestamp", "timestamp_ntz")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to Spark's microsecond TIMESTAMP regardless of
    the fixture's physical layout.

    - ``bigint``: parquet TIMESTAMP(NANOS) read via the nanosAsLong fallback
      -> integer-divide to micros (float division would drift by 1us on
      int64-sized epochs) and convert.
    - ``timestamp`` / ``timestamp_ntz``: native micros parquet timestamp ->
      cast (session timezone is UTC, so NTZ values read as UTC instants).
    - anything else: raise with the column and type NAMED, so fixture drift
      fails loudly at load, not inside query execution.
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dtype in ("timestamp", "timestamp_ntz"):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    raise TypeError(
        f"fixture contract violation: events.ts has physical type {dtype!r}; "
        f"expected one of {_EVENTS_TS_TYPES}. The fixture layout drifted — "
        "teach normalize_events_ts the new type rather than patching queries."
    )


def check_fixture_contract(tables: dict[str, DataFrame]) -> None:
    """Fail fast, with named messages, if a re-materialized fixture carries a
    physical type the engine's operators don't expect (VERDICT r02 item 2)."""
    problems: list[str] = []
    ts_type = dict(tables["events"].dtypes).get("ts")
    if ts_type != "timestamp":
        problems.append(f"events.ts normalized to {ts_type!r}, want 'timestamp'")
    od_type = dict(tables["orders"].dtypes).get("o_orderdate")
    if od_type not in ("date", "timestamp", "timestamp_ntz"):
        problems.append(
            f"orders.o_orderdate is {od_type!r}, want date/timestamp[_ntz]"
        )
    emb_type = dict(tables["embeddings"].dtypes).get("embedding")
    if emb_type not in ("array<float>", "array<double>"):
        problems.append(
            f"embeddings.embedding is {emb_type!r}, want array<float|double>"
        )
    else:
        # dimension drift would silently break every unrolled 64-term
        # vector expression (similarity oracles are generated for DIM=64):
        # one LIMIT-1 probe fails loudly instead
        row = tables["embeddings"].select("embedding").limit(1).collect()
        if row and len(row[0][0]) != 64:
            problems.append(
                f"embeddings.embedding has {len(row[0][0])} dims, engine "
                "vector expressions are generated for 64"
            )
    required = {
        "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
        "documents": {"doc_id", "text", "lang", "source", "n_chars"},
        "embeddings": {"vec_id", "embedding", "label"},
    }
    for name, cols in required.items():
        missing = cols - set(tables[name].columns)
        if missing:
            problems.append(f"{name} lost column(s) {sorted(missing)}")
    if problems:
        raise TypeError(
            "fixture contract violation(s): " + "; ".join(problems)
        )


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
    out["_sf_dir"] = sf_dir  # for file-index reads (catalog_ops)
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        df = spark.read.parquet(path)
        if name == "events":
            df = normalize_events_ts(df)
        df.createOrReplaceTempView(name)
        # Also register under the session's global_temp namespace: a real,
        # catalog-visible schema that ONLY the engine writes to, so the
        # live-catalog discovery walk (operators/catalog_ops.py:
        # discovered_objects_live, S1-S3 over an actual session catalog)
        # has a deterministic namespace to enumerate.
        df.createOrReplaceGlobalTempView(name)
        out[name] = df
    check_fixture_contract(out)
    return out
