from __future__ import annotations

from pyspark.sql import functions as F

from databricks_observe_spark.operators import layout as L


def test_bucketed_join_has_no_shuffle(tables, spark):
    L.write_bucketed(tables["orders"], "orders_b", "o_orderkey", buckets=4)
    L.write_bucketed(
        tables["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        buckets=4,
    )
    # at test SF the planner prefers broadcast; disable it to surface the
    # at-scale plan (sort-merge over co-located buckets, zero shuffles)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = L.bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert "Bucketed: true" in plan, plan[:2000]
        expected = tables["lineitem"].join(
            tables["orders"],
            tables["lineitem"].l_orderkey == tables["orders"].o_orderkey,
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_matches_plain_join(tables):
    big = tables["lineitem"].select("l_orderkey", "l_suppkey", "l_quantity")
    small = tables["supplier"].select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    plain = big.join(small, on="l_suppkey")
    salted = L.salted_join(big, small, "l_suppkey", salt_buckets=4)
    assert salted.count() == plain.count()
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.select(*plain.columns).collect()}
    assert a == b


def test_partitioned_write_prunes_at_plan_time(tables, spark, tmp_path):
    import os

    ev = tables["events"].withColumn("day", F.to_date("ts"))
    path = str(tmp_path / "events_by_day")
    L.write_partitioned(ev, path, "day")
    # hive-style directory per day on disk
    days = [d for d in os.listdir(path) if d.startswith("day=")]
    assert len(days) > 1
    one = L.read_pruned(spark, path, "day", "2024-01-02")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # the day predicate must land in PartitionFilters (planning-time
    # directory pruning), not in the row-level data filters
    assert "PartitionFilters" in plan
    assert "isnotnull(day" in plan
    expected = ev.filter(F.col("day") == "2024-01-02").count()
    got = one.count()
    assert got == expected and got > 0


def test_zorder_key_locality_and_determinism(tables):
    rows = L.zorder_key(tables).collect()
    assert len(rows) == tables["events"].count()
    # z-value decodes back to its inputs: de-interleaving even/odd bits
    # must reproduce (user_id, hour) masked to ZORDER_BITS
    ev = {r.event_id: r for r in tables["events"].collect()}
    import datetime as dt

    for r in rows[:200]:
        e = ev[r.event_id]
        u = e.user_id % (1 << L.ZORDER_BITS)
        ts = e.ts.replace(tzinfo=dt.timezone.utc)
        h = int(ts.timestamp() // 3600) % (1 << L.ZORDER_BITS)
        du = sum(((r.zval >> (2 * i)) & 1) << i for i in range(L.ZORDER_BITS))
        dh = sum(((r.zval >> (2 * i + 1)) & 1) << i for i in range(L.ZORDER_BITS))
        assert (du, dh) == (u, h), (r.event_id, du, u, dh, h)
        assert r.zrange == r.zval >> L.ZORDER_BITS
    # file assignment is a partition of each z-range into contiguous runs:
    # within a range, file_seq is non-decreasing along (zval, event_id)
    from collections import defaultdict

    by_range = defaultdict(list)
    for r in rows:
        by_range[r.zrange].append((r.zval, r.event_id, r.file_seq))
    for vs in by_range.values():
        vs.sort()
        seqs = [s for _, _, s in vs]
        assert seqs == sorted(seqs)
        assert 1 <= seqs[0] and seqs[-1] <= L.ZORDER_FILES


def test_skew_report_math_and_topk(tables):
    rows = L.skew_report(tables).collect()
    assert len(rows) == L.SKEW_TOP_K
    assert [r.rnk for r in rows] == list(range(1, L.SKEW_TOP_K + 1))
    counts = {
        r.user_id: r.cnt
        for r in tables["events"].groupBy("user_id").count().withColumnRenamed("count", "cnt").collect()
    }
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: L.SKEW_TOP_K]
    assert [(r.user_id, r.cnt) for r in sorted(rows, key=lambda r: r.rnk)] == top
    import math
    import statistics

    total = sum(counts.values())
    median = statistics.median(counts.values())
    for r in rows:
        assert r.share == round(r.cnt / total, 6)
        assert r.skew_factor == round(r.cnt / median, 6)
        assert r.suggested_salt == math.ceil(r.cnt / median)
