"""Property-based check of weighted_sample_topk against a pure-Python
A-ES reference.

The determinism claim is that every arithmetic step is reproducible
across engines; the reference recomputes the exact pipeline (md5 52-bit
uniform -> ln floored to micro-units -> fl(int)/fl(int) key -> top-k by
(key desc, doc_id)) with hashlib/math and must produce identical winners
and identical key bits. Examples whose ln(u)*1e6 sits inside the guarded
floor margin are discarded (assume), mirroring the fixture-level margin
guard in test_aes_ln_floor_margin.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from databricks_observe_spark.operators.dedup import (
    AES_K,
    _AES_U_DENOM,
    weighted_sample_topk,
)

doc_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000_000),  # doc_id
        st.sampled_from(["s0", "s1", "s2"]),  # source
        st.integers(min_value=1, max_value=600),  # n_chars weight
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda d: d[0],
)


def python_aes(docs):
    keyed = []
    for doc_id, source, n_chars in docs:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:13], 16)
        u = (h + 1) / _AES_U_DENOM
        scaled = math.log(u) * 1e6
        frac = scaled - math.floor(scaled)
        if not (1e-4 < frac < 1 - 1e-4):  # inside the guarded floor margin
            return None
        key = float(math.floor(scaled)) / float(n_chars)
        keyed.append((source, doc_id, n_chars, key))
    out = {}
    for source in {s for s, *_ in keyed}:
        grp = sorted(
            (r for r in keyed if r[0] == source), key=lambda r: (-r[3], r[1])
        )
        for rank, r in enumerate(grp[:AES_K], start=1):
            out[r[1]] = (r[0], r[2], r[3], rank)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=doc_strategy)
def test_weighted_sample_matches_python_reference(spark, docs):
    want = python_aes(docs)
    assume(want is not None)
    rows = [(d, "x" * min(n, 5), "en", s, n) for d, s, n in docs]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    got = {
        r.doc_id: (r.source, r.n_chars, r.aes_key, r["rank"])
        for r in weighted_sample_topk({"documents": df}).collect()
    }
    assert got == want
