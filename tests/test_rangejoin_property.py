"""Property-based check of range_join_incidents against a pure-Python
interval-attribution fold.

The bucket decomposition (window = 2 aligned hours -> event matches iff
its trunc-hour is one of the 2 covering buckets) is the step worth
adversarial coverage: hour-boundary events, events in the second hour of
a window, overlapping windows from adjacent incident hours, and windows
with no non-error traffic. Generate tiny event streams with minute
resolution and values straddling the severity threshold, then compare
against a dict fold that applies the raw containment predicate.
"""

from __future__ import annotations

import datetime
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from databricks_observe_spark.operators.events import range_join_incidents

BASE = datetime.datetime(2024, 3, 1, 0, 0, 0)

event_strategy = st.tuples(
    st.integers(min_value=0, max_value=60 * 12),  # minute offset, 12h span
    st.integers(min_value=0, max_value=4),  # user
    st.sampled_from(["error", "click", "view"]),
    st.sampled_from([10.0, 50.0, 95.0, 96.5, 120.25]),  # straddles >95
)
stream_strategy = st.lists(event_strategy, min_size=1, max_size=40)


def python_range_join(events):
    """Raw containment predicate, no bucketing: the obviously-correct form."""
    hours = {
        (BASE + datetime.timedelta(minutes=m)).replace(minute=0, second=0)
        for (m, _u, et, v) in events
        if et == "error" and v > 95
    }
    out = {}
    for w in hours:
        hits = [
            (u, v)
            for (m, u, et, v) in events
            if w <= BASE + datetime.timedelta(minutes=m) < w + datetime.timedelta(hours=2)
        ]
        if hits:
            cents = sum(
                int((Decimal(str(v)) * 100).to_integral_value()) for _u, v in hits
            )
            out[w.strftime("%Y-%m-%d %H:%M:%S.%f")] = (
                len(hits),
                len({u for u, _v in hits}),
                cents / 100.0,
            )
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=stream_strategy)
def test_range_join_matches_python_reference(spark, events):
    rows = [
        (i, BASE + datetime.timedelta(minutes=m), u, et, v, "{}")
        for i, (m, u, et, v) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string,"
        " value double, props string",
    )
    got = {
        r.window_start: (r.n_events, r.n_users, r.sum_value)
        for r in range_join_incidents({"events": df}).collect()
    }
    assert got == python_range_join(events)
