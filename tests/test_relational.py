from __future__ import annotations

from pyspark.sql import functions as F

from databricks_observe_spark.operators import relational as R


def test_pricing_summary_groups(tables):
    df = R.pricing_summary(tables)
    rows = {(r.l_returnflag, r.l_linestatus): r for r in df.collect()}
    assert len(rows) >= 3
    total = sum(r.count_order for r in rows.values())
    expected = tables["lineitem"].filter(F.col("l_shipdate") <= "1998-09-02").count()
    assert total == expected
    for r in rows.values():
        assert abs(r.avg_qty * r.count_order - r.sum_qty) < 1e-6 * max(1.0, r.sum_qty)


def test_shipping_priority_topk(tables):
    rows = R.shipping_priority(tables).collect()
    assert len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_top_orders_per_customer_rank(tables):
    df = R.top_orders_per_customer(tables)
    assert df.groupBy("o_custkey").count().agg(F.max("count")).first()[0] <= 3
    # within a customer, rn follows totalprice desc
    sample = df.filter(F.col("rn") <= 3).orderBy("o_custkey", "rn").limit(9).collect()
    by_cust: dict = {}
    for r in sample:
        by_cust.setdefault(r.o_custkey, []).append(r.o_totalprice)
    for prices in by_cust.values():
        assert prices == sorted(prices, reverse=True)


def test_rollup_has_grand_total(tables):
    rows = R.order_priority_rollup(tables).collect()
    grand = [r for r in rows if r.o_orderstatus is None and r.o_orderpriority is None]
    assert len(grand) == 1
    assert grand[0].n_orders == tables["orders"].count()


def test_returned_item_revenue_topk(tables):
    rows = R.returned_item_revenue(tables).collect()
    assert 0 < len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert all(r.revenue > 0 for r in rows)


def test_nation_market_share_bounds(tables):
    rows = R.nation_market_share(tables).collect()
    assert len(rows) >= 3  # orders span multiple years
    for r in rows:
        assert 0.0 <= r.mkt_share <= 1.0
        assert abs(r.mkt_share * r.total_revenue - r.brazil_revenue) < 1e-6 * max(
            1.0, r.total_revenue
        )


def test_urgent_order_customers_no_duplication(tables):
    df = R.urgent_order_customers(tables)
    rows = df.collect()
    keys = [r.c_custkey for r in rows]
    assert len(keys) == len(set(keys))  # semi join never duplicates
    urgent_custs = {
        r.o_custkey
        for r in tables["orders"]
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
        .collect()
    }
    assert set(keys) == urgent_custs & set(keys) and len(keys) == len(urgent_custs)


def test_merge_upsert_applies_cdc_semantics(tables):
    from databricks_observe_spark.operators import relational as R

    base_n = tables["orders"].count()
    rows = R.merge_upsert(tables).collect()
    ops = {}
    for r in rows:
        ops[r.op] = ops.get(r.op, 0) + 1
    keys = [r.o_orderkey for r in rows]
    assert len(keys) == len(set(keys))  # merge output is keyed
    # every base row either survives (keep/update) or was deleted
    n_deleted = base_n - ops.get("keep", 0) - ops.get("update", 0)
    assert n_deleted > 0 and ops.get("insert", 0) > 0 and ops.get("update", 0) > 0
    assert len(rows) == base_n - n_deleted + ops["insert"]
    # updates raised prices by exactly 10% in integer cents
    base_cents = {
        r.o_orderkey: int(r.o_totalprice * 100 + 0.5)
        for r in tables["orders"].select("o_orderkey", "o_totalprice").collect()
    }
    for r in rows:
        if r.op == "update":
            assert abs(r.price_cents - base_cents[r.o_orderkey] * 1.1) <= 2
        elif r.op == "keep":
            assert r.price_cents == base_cents[r.o_orderkey]


def test_percent_rank_bounds_and_order(tables):
    from databricks_observe_spark.operators import relational as R

    rows = R.balance_percent_rank(tables).collect()
    assert len(rows) == tables["customer"].count()
    by_nation: dict = {}
    for r in rows:
        assert 0.0 <= r.pr <= 1.0 and 0.0 < r.cd <= 1.0
        by_nation.setdefault(r.c_nationkey, []).append(r)
    for rs in by_nation.values():
        rs.sort(key=lambda r: (r.bal_cents, r.c_custkey))
        assert rs[0].pr == 0.0 and rs[-1].pr == 1.0 or len(rs) == 1
        prs = [r.pr for r in rs]
        assert prs == sorted(prs)  # monotone with the balance order


def test_incremental_summary_equals_full_recompute(tables):
    from databricks_observe_spark.operators import relational as R

    full = {
        (r.l_returnflag, r.l_linestatus): r
        for r in R.pricing_summary(tables).collect()
    }
    incr = {
        (r.l_returnflag, r.l_linestatus): r
        for r in R.incremental_pricing_summary(tables).collect()
    }
    assert set(full) == set(incr)
    for k, f in full.items():
        i = incr[k]
        # decimal partial-merge must be EXACTLY lossless, bit-for-bit
        assert (f.sum_qty, f.sum_base_price, f.sum_disc_price, f.sum_charge,
                f.avg_qty, f.avg_price, f.count_order) == (
            i.sum_qty, i.sum_base_price, i.sum_disc_price, i.sum_charge,
            i.avg_qty, i.avg_price, i.count_order)
