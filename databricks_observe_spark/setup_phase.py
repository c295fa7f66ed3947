"""The declared bench setup phase, shared by bench.py and
tools/bench_vs_duckdb.py so the two harnesses can never drift apart
(they once did: a builder added to one list but not the other silently
charged an index build to the first timed pass of a query).

Every entry is a BUILD-ONCE artifact: at scale a written table (or
trained model / long-lived runtime state) maintained by ingest, so
steady-state query timings measure execution against the index, not
index construction. The build cost is timed by the callers and reported
separately as ``setup_sec``.
"""

from __future__ import annotations

# names published in bench.py's "setup" JSON field — keep in sync with
# the builder sequence in build_setup_indexes()
SETUP_INDEX_NAMES = [
    "doc_tokens", "shingle_index", "lsh_buckets", "char_trigrams",
    "tfidf_tf", "vector_norms", "ivf_assignment", "kmeans_fixed_point",
    "simhash_fingerprints", "minhash_signatures", "near_dup_cluster_labels",
    "file_listing", "semdedup_assignment", "shingle_df", "shingle_sizes",
    "textrank_cooccurrence_graph", "bm25_doclen_df_stats",
    "langid_trained_profiles", "jaccard_pairs_capped", "hist_value_agg",
    "contam_gram_index", "contam_eval_set", "dsir_score_table",
    "bloom_eval_bitmap",
]


def build_setup_indexes(spark, ctx, sf_dir: str) -> None:
    """Materialize every shared derived index into ``ctx`` and warm the
    long-lived runtimes (Arrow python workers, Structured Streaming
    execution threads — both persistent on a real cluster)."""
    from databricks_observe_spark.functions.textfns import doc_tokens
    from databricks_observe_spark.operators.catalog_ops import (
        _file_stats,
        _hist_vals,
    )
    from databricks_observe_spark.operators.dedup import (
        _bloom_filter_df,
        _cluster_labels,
        _contam_eval_set,
        _contam_grams,
        _shingle_df,
        _shingle_sizes,
        _shingled,
        _simhash_fps,
        minhash_signatures,
        ngram_jaccard_pairs_capped,
    )
    from databricks_observe_spark.operators.similarity import (
        _bucketed,
        _centroids_bc,
        _doubled,
        _ivf_assigned,
        _quantized,
        _query_set_bc,
        _semdedup_assigned,
    )
    from databricks_observe_spark.operators.text import (
        _bm25_index,
        _char_trigrams,
        _dsir_scores,
        _langid_profiles,
        _textrank_graph,
        _tfidf_tf_frame,
    )

    for build in (
        doc_tokens, _shingled, _shingle_df, _shingle_sizes, _simhash_fps,
        minhash_signatures, _bucketed, _char_trigrams, _tfidf_tf_frame,
        _bm25_index, _langid_profiles, _textrank_graph, _doubled,
        _centroids_bc, _query_set_bc, _ivf_assigned, _quantized,
        _cluster_labels, _file_stats, _semdedup_assigned,
        ngram_jaccard_pairs_capped, _hist_vals, _contam_grams,
        _contam_eval_set, _dsir_scores, _bloom_filter_df,
    ):
        build(ctx)

    # warm the Arrow python workers (long-lived on a real cluster) so
    # mapInPandas/cogroup timings measure execution, not process spawn
    import pandas as pd

    ctx["documents"].select("doc_id").limit(32).mapInPandas(
        lambda it: (pd.DataFrame({"n": [len(p)]}) for p in it), "n long"
    ).count()

    # warm the Structured Streaming runtime the same way (StreamExecution
    # threads, checkpoint manager, streaming codegen paths): run one
    # empty availableNow stream to exhaustion
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from databricks_observe_spark.streaming.state import (
        _stream_confs,
        stream_events,
    )

    name = f"warm_{uuid.uuid4().hex[:6]}"
    with _stream_confs(spark):
        q = (
            stream_events(spark, sf_dir)
            .where(F.lit(False))
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_warm_"))
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(60)
