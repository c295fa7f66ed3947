"""Property-based check of duplicated_spans against a pure-Python
reference.

Rolling-window + cross-document distinct counting is another off-by-one
minefield (frame bounds at doc edges, the window-shorter-than-K filter,
within-doc repeats that must NOT count as cross-doc duplication).
Generate tiny corpora from a 4-token vocabulary — collisions are forced,
within-doc repeats are common — and compare against an obviously-correct
dict-of-sets fold.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from databricks_observe_spark.operators.dedup import SPAN_K, duplicated_spans

VOCAB = ["a", "b", "c", "d"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3 * SPAN_K),
    min_size=1,
    max_size=6,
)


def python_spans(docs: list[list[str]]):
    """Dict-of-sets fold: gram -> {doc ids}, then per-doc window counts."""
    owners: dict[tuple, set[int]] = {}
    for i, toks in enumerate(docs):
        for p in range(len(toks) - SPAN_K + 1):
            owners.setdefault(tuple(toks[p : p + SPAN_K]), set()).add(i)
    out = {}
    for i, toks in enumerate(docs):
        n = max(len(toks) - SPAN_K + 1, 0)
        dup = sum(
            1
            for p in range(n)
            if len(owners[tuple(toks[p : p + SPAN_K])]) >= 2
        )
        if dup >= 1:
            out[i] = (n, dup, dup * 10000 // n)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpus_strategy)
def test_duplicated_spans_matches_python_reference(spark, docs):
    rows = [(i, " ".join(toks), "en", "s", len(toks)) for i, toks in enumerate(docs)]
    t = {
        "documents": spark.createDataFrame(
            rows,
            "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint",
        )
    }
    got = {
        r.doc_id: (r.n_grams, r.n_dup_grams, r.dup_span_bp)
        for r in duplicated_spans(t).collect()
    }
    assert got == python_spans(docs)
