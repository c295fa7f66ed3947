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


def test_canonical_url_expr_matches_python_reference(spark):
    """Randomized differential check of the URL canonicalization chain:
    200 seeded messy URLs (case/port/slash/param-order/tracking/fragment
    combinations, including no-query, tracking-only, root-path and
    portless shapes) against a Python reference that applies the SAME
    regex spec — catches any Spark expression-chain mistake (wrong arg
    order, missed step, non-global replace) without depending on
    urllib's divergent parsing opinions."""
    import random
    import re

    from pyspark.sql import functions as F

    from databricks_observe_spark.operators.dedup import (
        _URL_QUERY_RE,
        _URL_TRACKING_RE,
        canonical_url_expr,
    )

    def reference(url: str) -> str:
        scheme = re.search(r"^([A-Za-z][A-Za-z0-9+.-]*)://", url)
        scheme = (scheme.group(1) if scheme else "").lower()
        m = re.search(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", url)
        hostport = m.group(1) if m else ""
        host = re.sub(r"^www\.", "", re.match(r"^([^:]*)", hostport).group(1).lower())
        pm = re.search(r":([0-9]+)$", hostport)
        port = pm.group(1) if pm else ""
        keep = port != "" and not (
            (scheme == "https" and port == "443")
            or (scheme == "http" and port == "80")
        )
        m = re.search(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", url)
        path = re.sub(r"/$", "", re.sub(r"/{2,}", "/", m.group(1) if m else ""))
        # the shared anchored regex: the query must precede any fragment,
        # so a '?' inside the fragment never parses as a query (the
        # unanchored form failed exactly the frag='#sec?x=1', no-query
        # shape this generator emits)
        qm = re.search(_URL_QUERY_RE, url)
        params = sorted(
            p
            for p in (qm.group(1) if qm else "").split("&")
            if p != "" and not re.match(_URL_TRACKING_RE, p)
        )
        q = "&".join(params)
        return (
            scheme + "://" + host + (":" + port if keep else "")
            + path + ("?" + q if q else "")
        )

    rng = random.Random(42)
    pool = ["a=1", "b=2", "ref=7", "z=x", "utm_source=f", "utm_medium=rss",
            "gclid=abc", "fbclid=9", "v=2", "utm_x"]  # utm_x: valueless key —
    # the per-param filter must KEEP it (no '='), and the whole-query
    # tracked flag must not let utm_[^=]* span the following '&'
    urls = []
    for _ in range(200):
        scheme = rng.choice(["http", "https", "HTTP", "HTTPS", "Ftp"])
        www = rng.choice(["", "www.", "WWW."])
        host = rng.choice(["Host.COM", "src3.example.com", "A.b.C"])
        port = rng.choice(["", ":80", ":443", ":8080", ":8443"])
        segs = ["seg%d" % rng.randrange(5) for _ in range(rng.randrange(4))]
        path = "".join(rng.choice(["/", "//"]) + s for s in segs)
        path += rng.choice(["", "/", "//"])
        params = rng.sample(pool, rng.randrange(len(pool)))
        query = "?" + "&".join(params) if rng.random() < 0.8 else ""
        frag = rng.choice(["", "#f", "#sec?x=1"])
        urls.append(f"{scheme}://{www}{host}{port}{path}{query}{frag}")

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r.c
        for r in df.select(canonical_url_expr(F.col("url")).alias("c")).collect()
    ]
    assert got == [reference(u) for u in urls]
