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


def test_shingle_regex_matches_slice_semantics(spark):
    """Randomized differential: the codegen regex shingler must equal the
    slice-semantics reference on adversarial spacing (empty tokens from
    leading/trailing/consecutive spaces included)."""
    import random

    from databricks_observe_spark.functions.textfns import (
        shingle_expr,
        shingle_regex_expr,
    )

    rng = random.Random(11)
    alphabet = ["a", "bb", "ccc", ""]
    cases = [
        " ".join(rng.choice(alphabet) for _ in range(rng.randint(0, 8)))
        for _ in range(200)
    ]
    cases += ["", " ", "  ", "a ", " a", "a  b c ", "   "]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "doc_id bigint, text string"
    )
    for k in (2, 3, 4):
        ref = {
            r.doc_id: sorted(r.s)
            for r in df.select(
                "doc_id", F.split("text", " ").alias("w")
            ).select("doc_id", shingle_expr(k).alias("s")).collect()
        }
        got = {
            r.doc_id: sorted(r.s)
            for r in df.select(
                "doc_id", shingle_regex_expr(k).alias("s")
            ).collect()
        }
        assert ref == got, f"k={k}"
