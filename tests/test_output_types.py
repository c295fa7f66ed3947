"""Registry-wide output-type lint (r09 verdict task 3).

The only driver hash failures in rounds 7-9 were ``score_auc`` /
``score_auc_parts`` — and the r09 localization run pinned the cause to
their output TYPE, not their values: ``auc_num2`` was the single
DECIMAL-typed output column in the whole 146-query registry, and the
driver's order-insensitive hasher canonicalizes Spark
``DecimalType(38,0)`` and DuckDB ``DECIMAL(38,0)`` differently. The
values were bit-identical; the type alone diverged the hash.

This lint turns that lesson into a permanent gate over EVERY hashed
projection the driver sees:

- **No DecimalType anywhere** (top-level or nested) — decimal arithmetic
  is fine INTERNALLY (the AUC pair's 2*U envelope needs DECIMAL(38,0)
  past ~3e9 docs), but the hashed output must cast down to BIGINT.
- **No unaudited DoubleType/FloatType**: every float output column must
  be in the explicit allowlist below, each entry either a raw fixture
  column (events.value is double in the parquet) or a value produced by
  the round-half-up-on-a-fixed-grid idiom that has already been
  driver-green. A NEW float column fails the lint until it is audited
  (is it grid-quantized? does the oracle compute it identically?) and
  added here deliberately. Stale entries fail too (exact set equality),
  so the allowlist cannot rot into a dead list.

The walk is the real thing — it builds every registered query's
DataFrame at sf0.001 (including the six streaming queries, which run
their availableNow micro-batches to completion) and inspects the
resulting schemas recursively, exactly the frames the driver hashes.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DataType,
    DecimalType,
    DoubleType,
    FloatType,
    MapType,
    StructType,
)

from databricks_observe_spark import registry as R

# single-source the fixture path: the live/streaming walks below must
# lint the SAME dataset the session-scoped `tables`/`spark` fixtures use
from tests.conftest import SF_DIR

# (query, column-path) pairs allowed to be float/double. Audit trail:
# "fixture" = carries the raw events.value double straight through;
# "rounded" = the round-half-up / fixed-denominator idiom (the value is
# an exact small-integer ratio representable in a double, so both
# engines produce the identical bit pattern); "ratio" = quotient of two
# exact integers computed with the same operand order on both engines —
# all of these have driver-green history (CORRECTNESS r06-r10; r10 was
# the first fully-green round, 145/145 hash-checkable cumulative).
FLOAT_ALLOWLIST: frozenset[tuple[str, str]] = frozenset(
    {
        # -- fixture passthrough: the parquet column itself is double
        # (events.value, customer.c_acctbal, orders.o_totalprice), so
        # both engines read the identical IEEE754 bits
        ("dormant_customers", "c_acctbal"),
        ("event_dedup_windowed", "value"),
        ("flagship_us_customers", "c_acctbal"),
        ("high_value_events", "value"),
        ("media_features", "value"),
        ("returned_item_revenue", "c_acctbal"),
        ("signup_purchase_window", "purchase_value"),
        ("top_balance_per_nation", "c_acctbal"),
        ("top_orders_per_customer", "o_totalprice"),
        ("user_value_zscores", "value"),
        # -- sums/avgs of fixture doubles, driver-green r06-r09 (the
        # hasher's float canonicalization tolerates them; TPC-H money
        # sums agree across engines at fixture scale)
        ("event_type_stats", "avg_value"),
        ("event_type_stats", "sum_value"),
        ("events_cube", "sum_value"),
        ("incremental_pricing_summary", "avg_price"),
        ("incremental_pricing_summary", "avg_qty"),
        ("incremental_pricing_summary", "sum_base_price"),
        ("incremental_pricing_summary", "sum_charge"),
        ("incremental_pricing_summary", "sum_disc_price"),
        ("incremental_pricing_summary", "sum_qty"),
        ("local_supplier_revenue", "revenue"),
        ("nation_market_share", "brazil_revenue"),
        ("nation_market_share", "mkt_share"),
        ("nation_market_share", "total_revenue"),
        ("order_priority_rollup", "total_price"),
        ("order_value_percentiles", "p25"),
        ("order_value_percentiles", "p50"),
        ("order_value_percentiles", "p75"),
        ("percentile_sketch_accuracy", "exact_p50"),
        ("percentile_sketch_accuracy", "exact_p90"),
        ("pricing_summary", "avg_price"),
        ("pricing_summary", "avg_qty"),
        ("pricing_summary", "sum_base_price"),
        ("pricing_summary", "sum_charge"),
        ("pricing_summary", "sum_disc_price"),
        ("pricing_summary", "sum_qty"),
        ("range_join_incidents", "sum_value"),
        ("returned_item_revenue", "revenue"),
        ("segment_order_stats", "avg_order_value"),
        ("segment_order_stats", "max_order"),
        ("segment_order_stats", "min_order"),
        ("segment_order_stats", "total_revenue"),
        ("shipping_priority", "revenue"),
        ("time_rollup_multigrain", "sum_value"),
        ("tumbling_hourly", "sum_value"),
        ("user_sessions", "sum_value"),
        ("user_value_zscores", "user_mean"),
        ("user_value_zscores", "zscore"),
        ("streaming_sessionize", "sum_value"),
        # -- exact small-integer ratios (numerator/denominator both
        # exact ints, same operand order on both engines)
        ("balance_percent_rank", "cd"),
        ("balance_percent_rank", "pr"),
        ("chunk_dedup", "dup_chunk_frac"),
        ("contamination_check", "overlap_frac"),
        ("curation_pipeline_e2e", "fill_ratio"),
        ("lang_profile", "avg_chars"),
        ("minhash_lsh_pairs", "est_jaccard"),
        ("ngram_jaccard_pairs", "jaccard"),
        ("ngram_jaccard_pairs_capped", "jaccard"),
        ("repetition_signals", "adjacent_repeat_frac"),
        ("repetition_signals", "distinct_ratio"),
        ("repetition_signals", "top_bigram_share"),
        ("sequence_packing", "fill_ratio"),
        ("skew_report", "share"),
        ("skew_report", "skew_factor"),
        ("text_stats", "avg_token_len"),
        ("text_stats", "stopword_ratio"),
        ("text_stats", "ttr"),
        ("tfidf_keywords", "tfidf"),
        ("vocab_coverage", "cum_share"),
        # -- exact-integer quotient, but NOT a small-integer ratio: the
        # A-Res weighted-sampling key (dedup.py `weighted_sample_topk`)
        # is floor(ln(u)*1e6) — an exact BIGINT on both engines — cast
        # to double and divided by n_chars (also an exact integer).
        # IEEE754 division is correctly rounded, and both engines divide
        # the same two exact operands in the same order, so the bit
        # pattern is deterministic even though the quotient is neither
        # small nor grid-quantized. Driver-green in both of its driver-
        # head rounds (r06 and r09, per CORRECTNESS_r06/r09.json) and in
        # every local strict-oracle run since.
        ("weighted_sample_topk", "aes_key"),
        # -- round-half-up-on-a-fixed-grid idiom (the *_r suffix: the
        # value is k/10^d for small k, exactly representable or within
        # the hasher's rounding on both engines)
        ("ann_bruteforce_topk", "cosine_r"),
        ("ann_lsh_topk", "cosine_r"),
        ("column_histograms", "max_r"),
        ("column_histograms", "min_r"),
        ("corpus_card", "avg_chars_r"),
        ("corpus_card", "avg_tokens_r"),
        ("embedding_near_dup", "cosine_r"),
        ("embedding_near_dup_lsh", "cosine_r"),
        ("ivf_ann_topk", "cosine_r"),
        ("kmeans_assign", "sq_dist_r"),
        ("length_outliers", "mad_r"),
        ("length_outliers", "med_r"),
        ("mixture_weights", "actual_share_r"),
        ("mixture_weights", "weight_r"),
        ("mixture_weights_temperature", "temp_share_r"),
        ("mixture_weights_temperature", "temp_weight_r"),
        ("ngram_diversity", "distinct1_r"),
        ("ngram_diversity", "distinct2_r"),
        ("quality_filter", "stopword_ratio_r"),
        ("quality_filter", "ttr_r"),
        ("semantic_dedup", "cosine_r"),
        ("tokenizer_fertility", "chars_per_unit_r"),
        ("tokenizer_fertility", "fertility_r"),
        ("unigram_kl", "kl_r"),
        ("unimax_allocation", "epochs_r"),
        # -- rows-only tail (never hashed — engine-specific HLL
        # accuracy report); listed so the walk stays total
        ("approx_user_counts", "rel_error"),
    }
)


def _walk(dt: DataType, path: str):
    """Yield (path, kind) for every decimal/float leaf, nested included."""
    if isinstance(dt, DecimalType):
        yield path, "decimal"
    elif isinstance(dt, (DoubleType, FloatType)):
        yield path, "float"
    elif isinstance(dt, ArrayType):
        yield from _walk(dt.elementType, path + "[]")
    elif isinstance(dt, MapType):
        yield from _walk(dt.keyType, path + ".key")
        yield from _walk(dt.valueType, path + ".val")
    elif isinstance(dt, StructType):
        for f in dt.fields:
            yield from _walk(f.dataType, path + "." + f.name)


def _lint(name: str, schema: StructType, decimals: list, floats: set):
    for f in schema.fields:
        for path, kind in _walk(f.dataType, f.name):
            if kind == "decimal":
                decimals.append((name, path))
            else:
                floats.add((name, path))


def test_batch_registry_output_types(spark, tables):
    """Every batch + live query's hashed projection: no DecimalType,
    floats exactly the audited allowlist (schema-only — nothing runs
    beyond the memoized setup artifacts the suite builds anyway)."""
    decimals: list = []
    floats: set = set()
    for name, (fn, _sql) in R._REGISTRY.items():
        _lint(name, fn(tables).schema, decimals, floats)
    for name, (fn, _sql) in R._LIVE_QUERIES.items():
        _lint(name, fn(spark, SF_DIR).schema, decimals, floats)
    assert decimals == [], f"DecimalType output (the score_auc class): {decimals}"
    batch_allowed = {
        (q, c) for q, c in FLOAT_ALLOWLIST if not q.startswith("streaming_")
    }
    assert floats == batch_allowed, (
        f"unaudited float columns: {sorted(floats - batch_allowed)}; "
        f"stale allowlist entries: {sorted(batch_allowed - floats)}"
    )


def test_streaming_registry_output_types(spark):
    """Same gate over the six streaming queries — each runs its
    availableNow micro-batches to completion (~12 s total at sf0.001)
    and the emitted memory-sink frame is linted, i.e. the exact frame
    the driver hashes."""
    decimals: list = []
    floats: set = set()
    for name, (fn, _sql) in R._STREAMING_QUERIES.items():
        _lint(name, fn(spark, SF_DIR).schema, decimals, floats)
    assert decimals == [], f"DecimalType output (the score_auc class): {decimals}"
    stream_allowed = {
        (q, c) for q, c in FLOAT_ALLOWLIST if q.startswith("streaming_")
    }
    assert floats == stream_allowed, (
        f"unaudited float columns: {sorted(floats - stream_allowed)}; "
        f"stale allowlist entries: {sorted(stream_allowed - floats)}"
    )


def test_auc_pair_pandas_surface_is_int64_on_both_engines(tables):
    """The demonstrated r07-r09 divergence mechanism, pinned shut: for a
    DECIMAL(38,0) column DuckDB's ``.df()`` converts to float64
    (``78724.0``) while Spark's ``toPandas`` yields an object column of
    ``Decimal('78724')`` — identical values, diverging pandas
    canonicalization, exactly the driver's rows+schema-green/hash-red
    signature. The BIGINT projection must land BOTH engines on int64 on
    that same surface."""
    import duckdb

    from databricks_observe_spark.operators.text import (
        SCORE_AUC_PARTS_SQL,
        SCORE_AUC_SQL,
        score_auc,
        score_auc_parts,
    )

    for df in (score_auc(tables), score_auc_parts(tables)):
        pdf = df.toPandas()
        assert all(str(dt) == "int64" for dt in pdf.dtypes), pdf.dtypes

    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    for sql in (SCORE_AUC_SQL, SCORE_AUC_PARTS_SQL):
        ddf = con.execute(sql).df()
        assert all(str(dt) == "int64" for dt in ddf.dtypes), ddf.dtypes


def test_registry_walk_is_total():
    """The two lint tests above must between them see every registered
    query — if a new registration family is added beside _REGISTRY /
    _LIVE_QUERIES / _STREAMING_QUERIES, this fails until the lint
    covers it."""
    covered = (
        set(R._REGISTRY) | set(R._LIVE_QUERIES) | set(R._STREAMING_QUERIES)
    )
    assert covered == set(R.queries())
