"""Edge-path pins for the r21 optimization rewrites.

Each rewrite proved bulk equivalence through the differential oracle;
these tests pin the EDGE semantics the oracle fixtures cannot reach —
the paths where the restructured plans had to reproduce the old forms'
behavior by explicit construction rather than by shared shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_observe_spark.operators import catalog_ops as C


def test_table_profiles_empty_table_still_yields_zero_row(tables):
    """The fused single-aggregate count form (r21) loses empty tables at
    the groupBy; the static-name left join + coalesce must restore the
    reference COUNT(*) semantics: an empty table still profiles with
    row_count = 0."""
    t2 = dict(tables)
    t2["region"] = tables["region"].filter(F.lit(False))
    rows = {r["table"]: r for r in C.table_profiles(t2).collect()}
    assert rows["region"].row_count == 0
    assert rows["region"].n_columns == 2  # catalog side unaffected
    assert len(rows) == 10  # every profiled table still present


def test_lsh_dedup_recall_sum_form_matches_left_semi_multiplicity(spark):
    """The single-pass union+aggregate form (r21) replaced a left-semi
    join; n_hit must count EXACT-side rows that have >=1 candidate match
    — duplicate exact rows count per occurrence, duplicate candidate
    rows never multiply, and empty inputs coalesce to 0 (the vacuous
    recall path divides by n_true only when it is nonzero)."""
    exact = spark.createDataFrame(
        [(1, 2), (1, 2), (3, 4)], "doc_a bigint, doc_b bigint"
    )
    cand = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 2), (5, 6)], "doc_a bigint, doc_b bigint"
    )

    def sum_form(e_df, c_df):
        e = e_df.select("doc_a", "doc_b", F.lit(1).alias("e"), F.lit(0).alias("c"))
        c = c_df.select("doc_a", "doc_b", F.lit(0).alias("e"), F.lit(1).alias("c"))
        per_pair = (
            e.union(c)
            .groupBy("doc_a", "doc_b")
            .agg(F.sum("e").alias("n_e"), F.sum("c").alias("n_c"))
        )
        return per_pair.agg(
            F.coalesce(F.sum("n_e"), F.lit(0).cast("bigint")).alias("n_true"),
            F.coalesce(F.sum("n_c"), F.lit(0).cast("bigint")).alias("n_cand"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("n_e") > 0) & (F.col("n_c") > 0), F.col("n_e")
                    ).otherwise(F.lit(0))
                ),
                F.lit(0).cast("bigint"),
            ).alias("n_hit"),
        ).first()

    got = sum_form(exact, cand)
    semi = exact.join(cand, on=["doc_a", "doc_b"], how="left_semi").count()
    assert got.n_true == exact.count() == 3
    assert got.n_cand == cand.count() == 4
    assert got.n_hit == semi == 2

    empty = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    vac = sum_form(empty, empty)
    assert (vac.n_true, vac.n_cand, vac.n_hit) == (0, 0, 0)


def test_psi_map_grid_fills_missing_bins(spark):
    """psi_from_counts' map-exploded grid (r21) must cover every bin of
    the fixed grid with zero-filled counts — identical totals to the old
    cross-join + left-join fill, and one output row per type."""
    from databricks_observe_spark.operators.events import psi_from_counts

    counts = spark.createDataFrame(
        [("a", 0, 10, 5), ("a", 3, 2, 8), ("b", 1, 7, 7)],
        "event_type string, bin long, ref_n long, cur_n long",
    )
    out = {r.event_type: r for r in psi_from_counts(counts).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"].n_ref == 12 and out["a"].n_cur == 13
    assert out["b"].n_ref == 7 and out["b"].n_cur == 7
    # a type with identical ref/cur distributions has PSI exactly 0
    assert out["b"].psi_micro == 0
