"""Property-based check of scd2_history against a pure-Python reference.

Gaps-and-islands is the classic off-by-one minefield (change marks,
running sums, lead bounds); exercise it on arbitrary small poll
sequences — repeated states, alternations, duplicate timestamps —
and compare against an obviously-correct linear fold.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from databricks_observe_spark.operators.runs import scd2_history

STATES = ["WAITING", "RUNNING", "COMPLETED", "FAILED"]

polls_strategy = st.lists(
    st.tuples(
        st.sampled_from(["e1", "e2"]),
        st.integers(min_value=0, max_value=20),  # seconds offset (dups ok)
        st.sampled_from(STATES),
    ),
    min_size=1,
    max_size=16,
)


def python_islands(polls):
    """Linear fold: per entity, order by (ts, event_id) and collapse
    consecutive equal states into (state, n_polls) islands."""
    out: dict[str, list[list]] = {}
    rows = sorted(enumerate(polls), key=lambda p: (p[1][0], p[1][1], p[0]))
    for eid, (ent, _ts, state) in rows:
        isl = out.setdefault(ent, [])
        if isl and isl[-1][0] == state:
            isl[-1][1] += 1
        else:
            isl.append([state, 1])
    return {e: [tuple(i) for i in isl] for e, isl in out.items()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(polls=polls_strategy)
def test_scd2_islands_match_python_reference(spark, polls):
    values = ", ".join(
        f"('pipeline', '{ent}', 'u{i}', '{state}',"
        f" timestamp'2024-01-01 00:00:{off:02d}', {i})"
        for i, (ent, off, state) in enumerate(polls)
    )
    updates = spark.sql(
        f"SELECT * FROM (VALUES {values})"
        " AS t(entity_type, entity_id, update_id, state, ts, event_id)"
    )
    got = scd2_history({"updates": updates}).collect()
    by_entity: dict = {}
    for r in got:
        by_entity.setdefault(r.entity_id, []).append(r)
    expected = python_islands(polls)
    assert set(by_entity) == set(expected)
    for ent, rs in by_entity.items():
        rs.sort(key=lambda r: r.version)
        assert [(r.state, r.n_polls) for r in rs] == expected[ent]
        assert [r.version for r in rs] == list(range(1, len(rs) + 1))
        assert [r.is_current for r in rs] == [False] * (len(rs) - 1) + [True]
