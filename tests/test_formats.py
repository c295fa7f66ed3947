from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_observe_spark.sources.formats import read_any


def test_read_any_round_trips_all_formats(spark, tables, tmp_path):
    src = (
        tables["events"]
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
        .limit(200)
    )
    expected = {(r.event_id, r.user_id, r.event_type, round(r.value, 6)) for r in src.collect()}
    schema = "event_id bigint, user_id bigint, event_type string, value double"

    pq = str(tmp_path / "ev.parquet")
    js = str(tmp_path / "ev.jsonl")
    cs = str(tmp_path / "ev.csv")
    src.write.parquet(pq)
    src.write.json(js)
    src.write.option("header", "true").csv(cs)

    for path in (pq, js, cs):
        got = {
            (r.event_id, r.user_id, r.event_type, round(r.value, 6))
            for r in read_any(spark, path, schema=schema).collect()
        }
        assert got == expected, path


def test_read_any_csv_infers_without_schema(spark, tables, tmp_path):
    cs = str(tmp_path / "nations.csv")
    tables["nation"].select("n_nationkey", "n_name").write.option(
        "header", "true"
    ).csv(cs)
    df = read_any(spark, cs)
    assert df.count() == tables["nation"].count()
    assert dict(df.dtypes)["n_nationkey"] in ("int", "bigint")


def test_read_any_rejects_unknown_extension(spark):
    with pytest.raises(ValueError, match="unsupported source extension"):
        read_any(spark, "/tmp/data.avro")
