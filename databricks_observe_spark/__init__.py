"""databricks_observe_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of the
reference Dagster/Databricks observer (``/root/reference/``, see SURVEY.md):

- three-level catalog introspection and metadata profiling,
- lineage-graph construction with recursive transitive closure,
- latest-run / state-transition detection over update streams (batch + streaming),
- the flagship filter -> write -> count -> preview query,

plus a scale-oriented extension surface: exact/near deduplication (MinHash LSH,
SimHash, n-gram Jaccard), top-k embedding similarity search, text analysis and
multimodal-column plumbing.

Everything is expressed with the DataFrame/SQL API so Catalyst handles
pushdown, pruning, join selection and AQE; Python row loops appear only as
driver-side orchestration of fixpoint iterations (lineage closure).
"""

from databricks_observe_spark.session import get_spark

__all__ = ["get_spark"]
