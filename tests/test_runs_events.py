from __future__ import annotations

from pyspark.sql import functions as F

from databricks_observe_spark.operators import events as E, runs as R


def test_latest_update_is_singular_per_entity(tables):
    df = R.latest_update_per_entity(tables)
    per_entity = df.groupBy("entity_type", "entity_id").count().collect()
    assert all(r["count"] == 1 for r in per_entity)
    # the reported ts is the max poll ts for that entity
    raw_max = tables["updates"].groupBy("entity_id").agg(F.max("ts").alias("m"))
    got = {r.entity_id: r.ts for r in df.collect()}
    for r in raw_max.collect():
        assert got[r.entity_id] == r.m.strftime("%Y-%m-%d %H:%M:%S.%f")


def test_state_transitions_only_completed_entries(tables):
    rows = R.state_transitions(tables).collect()
    assert len(rows) > 0
    # every emission corresponds to a COMPLETED poll whose predecessor (if
    # any) for the same (entity, update) was not COMPLETED
    first = R.first_completed(tables)
    # transitions >= first-completed set size (re-entries re-emit)
    assert len(rows) >= first.count()


def test_first_completed_exactly_once(tables):
    df = R.first_completed(tables)
    keys = df.select("entity_id", "update_id").collect()
    assert len(keys) == len({(r.entity_id, r.update_id) for r in keys})
    # re-polls exist in the fixture (n_polls > 1 somewhere) — the dedup is real
    assert df.filter(F.col("n_polls") > 1).count() > 0


def test_asof_is_strictly_prior_and_same_user(tables):
    rows = R.asof_last_error_before_purchase(tables).collect()
    with_err = [r for r in rows if r.last_error_ts is not None]
    assert with_err, "fixture should produce at least one matched as-of pair"
    assert all(r.last_error_ts < r.purchase_ts for r in with_err)
    assert all(r.secs_since_error >= 0 for r in with_err)


def test_signup_window_left_join_keeps_zero_rows(tables):
    df = R.signup_purchase_window(tables)
    n_signups = tables["events"].filter(F.col("event_type") == "signup").count()
    assert df.count() == n_signups
    zeros = df.filter(F.col("n_purchases") == 0).collect()
    assert all(r.purchase_value == 0.0 for r in zeros)


def test_tumbling_covers_all_events(tables):
    df = E.tumbling_hourly(tables)
    assert df.agg(F.sum("n_events")).first()[0] == tables["events"].count()


def test_sliding_windows_quadruple_count(tables):
    df = E.sliding_daily(tables)
    assert df.agg(F.sum("n_events")).first()[0] == 4 * tables["events"].count()


def test_sessions_partition_events(tables):
    df = E.user_sessions(tables)
    assert df.agg(F.sum("n_events")).first()[0] == tables["events"].count()
    # gap >= 2h between consecutive sessions of the same user
    sess = df.orderBy("user_id", "session_start").collect()
    prev = {}
    import datetime
    for r in sess:
        start = datetime.datetime.strptime(r.session_start, "%Y-%m-%d %H:%M:%S.%f")
        if r.user_id in prev:
            assert (start - prev[r.user_id]).total_seconds() >= 7200
        prev[r.user_id] = start


def test_event_dedup_windowed_suppresses_bursts(spark, tables):
    import pandas as pd

    from databricks_observe_spark.operators.events import event_dedup_windowed

    ts = pd.to_datetime(
        [
            "2024-01-01 00:00:00",  # kept (first)
            "2024-01-01 00:02:00",  # dropped: 120s gap < 300s
            "2024-01-01 00:04:00",  # dropped vs previous raw (120s)
            "2024-01-01 00:10:00",  # kept: 360s gap
            "2024-01-01 00:10:00",  # other type -> kept (own partition)
        ]
    )
    probe = {"events": spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4, 5],
                "ts": ts,
                "user_id": [7, 7, 7, 7, 7],
                "event_type": ["click", "click", "click", "click", "view"],
                "value": [1.0] * 5,
                "props": ["{}"] * 5,
            }
        )
    )}
    kept = {r.event_id for r in event_dedup_windowed(probe).collect()}
    assert kept == {1, 4, 5}


def test_length_outliers_flags_extremes(spark, tables):
    from databricks_observe_spark.operators.text import length_outliers

    rows = length_outliers(tables).collect()
    assert len(rows) == tables["documents"].count()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, grp in by_lang.items():
        outliers = [r for r in grp if r.is_outlier]
        # robust threshold: the overwhelming majority of docs are inliers
        assert len(outliers) < len(grp) * 0.2
        for r in outliers:
            assert abs(r.n_tokens - r.med_r) > r.mad_r * 3


def test_scd2_history_partitions_the_timeline(tables):
    from databricks_observe_spark.operators import runs as R

    rows = R.scd2_history(tables).collect()
    assert sum(r.n_polls for r in rows) == tables["updates"].count()
    by_entity: dict = {}
    for r in rows:
        by_entity.setdefault((r.entity_type, r.entity_id), []).append(r)
    for rs in by_entity.values():
        rs.sort(key=lambda r: r.version)
        assert [r.version for r in rs] == list(range(1, len(rs) + 1))
        assert sum(1 for r in rs if r.is_current) == 1
        assert rs[-1].is_current and rs[-1].valid_to is None
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from  # no gaps, no overlap
            assert a.state != b.state  # islands collapse same-state runs
            assert a.valid_from < a.valid_to


def test_value_deciles_equal_frequency(tables):
    from databricks_observe_spark.operators import events as E

    rows = E.value_deciles(tables).collect()
    assert sum(r.n_events for r in rows) == tables["events"].count()
    by_type: dict = {}
    for r in rows:
        assert 1 <= r.decile <= 10
        assert r.lo_micro <= r.hi_micro
        by_type.setdefault(r.event_type, []).append(r)
    for rs in by_type.values():
        rs.sort(key=lambda r: r.decile)
        # ntile balance: bin sizes differ by at most 1
        sizes = [r.n_events for r in rs]
        assert max(sizes) - min(sizes) <= 1
        # bins are ordered ranges over value
        for a, b in zip(rs, rs[1:]):
            assert a.hi_micro <= b.lo_micro


def test_funnel_stages_monotonically_decrease(tables):
    from databricks_observe_spark.operators import events as E

    row = E.funnel_conversion(tables).collect()[0]
    assert row.n_users >= row.n_signup >= row.n_click_after_signup
    assert row.n_click_after_signup >= row.n_purchase_after_click >= 0
    # the fixture stream has all three event types, so the funnel is live
    assert row.n_purchase_after_click > 0


def test_retention_cohorts_account_all_users(tables):
    from databricks_observe_spark.operators import events as E

    rows = E.retention_cohorts(tables).collect()
    n_users = tables["events"].select("user_id").distinct().count()
    # offset 0 contains every user exactly once across cohorts
    assert sum(r.n_active for r in rows if r.week_offset == 0) == n_users
    by_cohort: dict = {}
    for r in rows:
        assert r.week_offset >= 0
        by_cohort.setdefault(r.cohort_date, {})[r.week_offset] = r.n_active
    for offs in by_cohort.values():
        assert 0 in offs  # every cohort is active in its own week
        # retention never exceeds the cohort's own size
        assert all(n <= offs[0] for n in offs.values())


def test_lateness_report_covers_stream_and_detects_disorder(tables):
    from databricks_observe_spark.operators import events as E

    rows = E.lateness_report(tables).collect()
    assert sum(r.n_events for r in rows) == tables["events"].count()
    assert all(
        r.lateness_bucket in ("on_time", "lt_1m", "lt_1h", "lt_1d", "ge_1d")
        for r in rows
    )
    # the simulated ingest shuffle produces real disorder to measure
    late = sum(r.n_events for r in rows if r.lateness_bucket != "on_time")
    assert late > 0


def test_lateness_prefix_scan_matches_global_window(tables, spark):
    """The block prefix-scan must equal a naive single-window computation."""
    from pyspark.sql import Window, functions as F

    from databricks_observe_spark.operators import events as E

    naive_w = (
        Window.orderBy("arrival", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    naive = (
        tables["events"]
        .select(
            "event_id",
            "event_type",
            "ts",
            E._arrival(F.col("event_id")).alias("arrival"),
        )
        .withColumn("seen_max", F.max("ts").over(naive_w))
        .withColumn(
            "lag_s",
            F.floor(F.col("seen_max").cast("double") - F.col("ts").cast("double")),
        )
    )
    n_late_naive = naive.filter(F.col("lag_s") > 0).count()
    dist = E.lateness_report(tables)
    n_late_dist = sum(
        r.n_events for r in dist.collect() if r.lateness_bucket != "on_time"
    )
    assert n_late_naive == n_late_dist


def test_event_type_pivot_matrix_totals(tables):
    from databricks_observe_spark.operators import events as E

    rows = E.event_type_pivot(tables).collect()
    assert len(rows) == tables["events"].select("user_id").distinct().count()
    total = sum(
        r.click + r.error + r.purchase + r.signup + r.view for r in rows
    )
    assert total == tables["events"].count()


def test_range_join_matches_naive_interval_join(tables):
    """The bucket-decomposed range join must equal the naive BETWEEN
    formulation (which Spark would plan as a nested loop) row for row."""
    got = {
        (r.window_start, r.n_events, r.n_users, r.sum_value)
        for r in E.range_join_incidents(tables).collect()
    }
    ev = tables["events"]
    windows = (
        ev.filter((F.col("event_type") == "error") & (F.col("value") > 95))
        .select(F.date_trunc("hour", "ts").alias("w_start"))
        .distinct()
    )
    naive = (
        ev.join(
            windows,
            (F.col("ts") >= F.col("w_start"))
            & (F.col("ts") < F.col("w_start") + F.expr("INTERVAL 2 HOURS")),
        )
        .groupBy("w_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("window_start"),
            "n_events",
            "n_users",
            "sum_value",
        )
    )
    want = {
        (r.window_start, r.n_events, r.n_users, r.sum_value) for r in naive.collect()
    }
    assert got == want and len(got) > 0


def test_time_rollup_grains_consistent(tables):
    """Each ROLLUP grain must equal the equivalent standalone GROUP BY,
    and finer grains must sum exactly to coarser ones."""
    rows = E.time_rollup_multigrain(tables).collect()
    by_grain = {}
    for r in rows:
        by_grain.setdefault(r.grain, []).append(r)
    assert set(by_grain) == {0, 1, 3}
    # grand total equals the raw count
    total = by_grain[3][0]
    assert total.day is None and total.hour is None
    assert total.n_events == tables["events"].count()
    # hour rows sum to their day row; day rows sum to the grand total
    day_from_hours = {}
    for r in by_grain[0]:
        day_from_hours[r.day] = day_from_hours.get(r.day, 0) + r.n_events
    day_rows = {r.day: r.n_events for r in by_grain[1]}
    assert day_from_hours == day_rows
    assert sum(day_rows.values()) == total.n_events
    # a day's standalone aggregate matches the rollup's day grain
    some_day = by_grain[1][0].day
    standalone = (
        tables["events"]
        .where(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd") == some_day)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("u"),
        )
        .collect()[0]
    )
    got_day = next(r for r in by_grain[1] if r.day == some_day)
    assert (got_day.n_events, got_day.n_users) == (standalone.n, standalone.u)


def test_zscore_constant_user_agrees_across_engines(spark):
    """The variance-clamp guard: a constant-value user's variance
    numerator rounds to a tiny NEGATIVE double (independent decimal->
    double casts), which unclamped makes Spark emit NaN zscores (every
    event a spurious outlier) and makes DuckDB RAISE on sqrt(negative).
    Clamped, both engines agree: NULL zscore / NULL is_outlier, and the
    single-event user stays NULL too (0/0, not greatest-coerced 0)."""
    import math

    import duckdb

    rows = [
        (i, "2024-01-01 00:00:00", 7, "click", 0.01, "{}") for i in range(5)
    ] + [
        (10, "2024-01-01 01:00:00", 8, "click", 5.0, "{}"),  # n=1 user
        (11, "2024-01-01 02:00:00", 9, "click", 1.0, "{}"),  # varying user
        (12, "2024-01-01 03:00:00", 9, "click", 2.0, "{}"),
        (13, "2024-01-01 04:00:00", 9, "click", 4.0, "{}"),
    ]
    df = spark.createDataFrame(
        [(e, __import__("datetime").datetime.fromisoformat(ts), u, et, v, p)
         for e, ts, u, et, v, p in rows],
        "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string,"
        " value double, props string",
    )
    got = {r.event_id: r for r in E.user_value_zscores({"events": df}).collect()}
    # constant-value user: zero variance -> NULL, never NaN
    for e in range(5):
        assert got[e].zscore is None and got[e].is_outlier is None
    assert got[10].zscore is None  # n=1: 0/0 stays NULL
    assert got[11].zscore is not None and not math.isnan(got[11].zscore)

    con = duckdb.connect()
    vals = ", ".join(
        f"({e}, TIMESTAMP '{ts}', {u}, '{et}', {v}, '{{}}')"
        for e, ts, u, et, v, _p in rows
    )
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM (VALUES {vals})"
        f" AS t(event_id, ts, user_id, event_type, value, props)"
    )
    want = {r[0]: r for r in con.execute(E.USER_VALUE_ZSCORES_SQL).fetchall()}
    for e, g in got.items():
        w = want[e]
        assert (g.zscore is None) == (w[4] is None)
        assert g.zscore == w[4] or (g.zscore is None and w[4] is None)
        assert (g.is_outlier is None) == (w[5] is None)


def test_drift_psi_matches_python_recompute(tables):
    """Exact Python replay of the quantized PSI pipeline over the raw
    fixture events — bins, Laplace smoothing, nano shares, micro ln
    floors, femto terms — plus the nonnegativity and ln-margin
    invariants the operator's determinism argument rests on."""
    import datetime
    import math
    from collections import defaultdict

    from databricks_observe_spark.operators.events import (
        DRIFT_BIN_WIDTH,
        DRIFT_N_BINS,
        DRIFT_SPLIT_TS,
        drift_psi,
    )

    split = datetime.datetime.fromisoformat(DRIFT_SPLIT_TS)
    ref = defaultdict(lambda: defaultdict(int))
    cur = defaultdict(lambda: defaultdict(int))
    for r in tables["events"].select("event_type", "ts", "value").collect():
        if r.value is None:
            continue
        b = min(max(int(math.floor(r.value / DRIFT_BIN_WIDTH)), 0), DRIFT_N_BINS - 1)
        (ref if r.ts < split else cur)[r.event_type][b] += 1

    def nano(cnt, total):
        return max(math.floor((cnt + 1) / (total + DRIFT_N_BINS) * 1e9 + 0.5), 1)

    got = {r.event_type: r for r in drift_psi(tables).collect()}
    assert set(got) == set(ref) | set(cur)
    attained = set()
    for et, g in got.items():
        rt, ct = sum(ref[et].values()), sum(cur[et].values())
        assert g.n_ref == rt and g.n_cur == ct
        femto = 0
        for b in range(DRIFT_N_BINS):
            pn, qn = nano(ref[et][b], rt), nano(cur[et][b], ct)
            attained.update((pn, qn))
            femto += (pn - qn) * (
                math.floor(math.log(pn) * 1e6 + 0.5)
                - math.floor(math.log(qn) * 1e6 + 0.5)
            )
        assert g.psi_femto == femto
        assert g.psi_femto >= 0
        assert g.psi_micro == (femto + 500000000) // 1000000000
    for pn in attained:  # ln-site margin rule, checked (error-relative
        # form: a 1-ulp cross-engine ln divergence moves the scaled value
        # by |ln|*1.1e-16*1e6 ~ 2e-9; require 1000x that distance)
        v = (math.log(pn) * 1e6 + 0.5) % 1.0
        err = abs(math.log(pn)) * 1.1e-16 * 1e6
        assert min(v, 1.0 - v) > 1000.0 * err, pn


def test_ks_drift_matches_python_recompute(tables):
    """Exact Python replay of the binned two-sample KS pipeline — grid
    binning, per-type ECDFs, the integer cross-product gap, and the
    half-up integer division — plus the D <= P*N bound the BIGINT-safety
    argument rests on."""
    import datetime
    import math
    from collections import defaultdict

    from databricks_observe_spark.operators.events import (
        DRIFT_SPLIT_TS,
        KS_BIN_WIDTH,
        KS_N_BINS,
        ks_drift,
    )

    split = datetime.datetime.fromisoformat(DRIFT_SPLIT_TS)
    ref = defaultdict(lambda: [0] * KS_N_BINS)
    cur = defaultdict(lambda: [0] * KS_N_BINS)
    for r in tables["events"].select("event_type", "ts", "value").collect():
        if r.value is None:
            continue
        b = min(max(int(math.floor(r.value / KS_BIN_WIDTH)), 0), KS_N_BINS - 1)
        (ref if r.ts < split else cur)[r.event_type][b] += 1

    got = {r.event_type: r for r in ks_drift(tables).collect()}
    assert set(got) == set(ref) | set(cur)
    for et, g in got.items():
        n_ref, n_cur = sum(ref[et]), sum(cur[et])
        assert g.n_ref == n_ref and g.n_cur == n_cur
        d, cr, cc = 0, 0, 0
        for b in range(KS_N_BINS):
            cr += ref[et][b]
            cc += cur[et][b]
            d = max(d, abs(cr * n_cur - cc * n_ref))
        assert g.d_num == d
        assert d <= n_ref * n_cur  # D/PN <= 1, so ks_micro is bounded
        # the same correctly-rounded double division as both engines
        assert g.ks_micro == math.floor(
            float(d) * 1e6 / (float(n_ref) * float(n_cur)) + 0.5
        )
        assert 0 <= g.ks_micro <= 1000000


def test_rate_anomaly_matches_python_recompute(tables):
    """Exact replay of the grid-filled trailing-baseline z^2 test —
    including the empty-hour fill, the warm-up NULL convention, and the
    integer cross-multiplied comparison."""
    import datetime
    from collections import defaultdict

    from databricks_observe_spark.operators.events import (
        RATE_BASELINE_HOURS,
        RATE_Z,
        rate_anomaly,
    )

    counts = defaultdict(lambda: defaultdict(int))
    hours = []
    for r in tables["events"].select("event_type", "ts").collect():
        h = r.ts.replace(minute=0, second=0, microsecond=0)
        counts[r.event_type][h] += 1
        hours.append(h)
    h_min, h_max = min(hours), max(hours)
    all_hours = []
    h = h_min
    while h <= h_max:
        all_hours.append(h)
        h += datetime.timedelta(hours=1)

    got = {
        (r.event_type, r.window_start): r for r in rate_anomaly(tables).collect()
    }
    assert len(got) == len(counts) * len(all_hours)
    n_flagged = n_null = 0
    for et, by_h in counts.items():
        series = [by_h.get(h, 0) for h in all_hours]
        for i, h in enumerate(all_hours):
            key = (et, h.strftime("%Y-%m-%d %H:%M:%S.%f"))
            r = got[key]
            assert r.n_events == series[i]
            base = series[max(i - RATE_BASELINE_HOURS, 0) : i]
            assert r.base_cnt == len(base)
            assert r.base_sum == sum(base)
            if len(base) < RATE_BASELINE_HOURS:
                assert r.is_anomaly is None  # warm-up convention
                n_null += 1
                continue
            w, s, ss = len(base), sum(base), sum(x * x for x in base)
            var_num = w * ss - s * s
            if var_num == 0:
                assert r.is_anomaly is None
                n_null += 1
                continue
            dev = series[i] * w - s
            assert r.is_anomaly == int(dev * dev > RATE_Z * RATE_Z * var_num)
            n_flagged += r.is_anomaly
    assert n_null > 0  # the fixture always has warm-up rows
    # scored rows dominate: the alarm is live on virtually the whole grid
    assert len(got) - n_null > len(got) // 2
