"""Similarity search over the ``embeddings`` table.

- ``ann_bruteforce_topk`` — exact cosine top-5 per query vector: the
  correctness baseline. Queries are broadcast (tiny side), so the big table
  is scanned once with no shuffle of the embedding payload; ranking happens
  in a per-query window.
- ``lsh_bucket_stats`` / ``ann_lsh_topk`` — sign-random-projection LSH,
  multi-table: two independent 4-hyperplane tables (16 buckets each);
  candidates are the union of the query's buckets across tables (the
  standard recall amplification: P(hit) = 1-(1-p)^T). This is the 100 TB
  path: bucketing turns an O(n*q) scan into a partition-pruned lookup
  (bucket id is a first-class partition key at scale). Recall is measured
  against the brute-force baseline in tests/test_dedup_similarity.py.

Hyperplanes are literal constants (functions/vectors.py:hyperplanes) embedded
in both the Spark plan and the DuckDB oracle, so bucket assignments agree
exactly; cosine order ties are broken by vec_id for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from databricks_observe_spark.functions.vectors import cosine_expr, dot_expr, hyperplanes

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
N_PLANES = 4  # per table: 2^4 = 16 buckets
N_TABLES = 2
DIM = 64

_ALL_PLANES = hyperplanes(N_PLANES * N_TABLES, DIM)
TABLES_PLANES = [
    _ALL_PLANES[t * N_PLANES : (t + 1) * N_PLANES] for t in range(N_TABLES)
]
PLANES = TABLES_PLANES[0]  # table 0 doubles as the bucket-stats histogram


def _doubled(t: dict[str, DataFrame]) -> DataFrame:
    return t["embeddings"].select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        "label",
    )


def ann_bruteforce_topk(t: dict[str, DataFrame]) -> DataFrame:
    """Exact cosine top-5 neighbors for each query vector (vec_id < 10)."""
    e = _doubled(t)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        e.join(F.broadcast(q), on=F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr("qv", "v"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("cosine", 6).alias("cosine_r"),
            "label",
        )
    )


ANN_BRUTEFORCE_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id, e.label,
         list_dot_product(q.qv, e.v) /
         (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS cosine
  FROM q JOIN e ON e.vec_id <> q.query_id
)
SELECT query_id, vec_id AS neighbor_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank,
       round(cosine, 6) AS cosine_r, label
FROM scored
QUALIFY rank <= {TOP_K}
"""


def _bucket_expr(vec_col: str, planes=None) -> F.Column:
    """Sign-LSH bucket id: concatenated sign bits of hyperplane dots."""
    bits = []
    for plane in planes if planes is not None else PLANES:
        lit_plane = F.array(*[F.lit(x) for x in plane])
        bits.append(
            F.when(dot_expr(F.col(vec_col), lit_plane) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
        )
    return F.concat(*bits)


def _bucket_sql(vec_col: str, planes=None) -> str:
    parts = []
    for plane in planes if planes is not None else PLANES:
        arr = "[" + ", ".join(repr(x) for x in plane) + "]"
        parts.append(
            f"CASE WHEN list_dot_product({vec_col}, {arr}::DOUBLE[]) >= 0 THEN '1' ELSE '0' END"
        )
    return " || ".join(parts)


def lsh_bucket_stats(t: dict[str, DataFrame]) -> DataFrame:
    """Vectors per LSH bucket — the partition-pruning histogram."""
    return (
        _doubled(t)
        .withColumn("bucket", _bucket_expr("v"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.countDistinct("label").alias("n_labels"),
        )
    )


LSH_BUCKET_STATS_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings)
SELECT {_bucket_sql('v')} AS bucket, COUNT(*) AS n_vecs, COUNT(DISTINCT label) AS n_labels
FROM e GROUP BY 1
"""


def ann_lsh_topk(t: dict[str, DataFrame]) -> DataFrame:
    """Approximate top-5: rank only candidates sharing an LSH bucket with
    the query in ANY of the hash tables (multi-table union).

    The join keys are bucket ids — at scale each table is a
    partition-local lookup instead of a full scan; the union of small
    candidate sets replaces the O(n*q) cross product. Compare with
    ann_bruteforce_topk for recall (the quality/efficiency trade)."""
    e = _doubled(t)
    for i, planes in enumerate(TABLES_PLANES):
        e = e.withColumn(f"bucket{i}", _bucket_expr("v", planes))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        *[F.col(f"bucket{i}").alias(f"qbucket{i}") for i in range(N_TABLES)],
    )
    cands = None
    for i in range(N_TABLES):
        c = (
            e.join(
                F.broadcast(q.select("query_id", "qv", f"qbucket{i}")),
                on=F.col(f"bucket{i}") == F.col(f"qbucket{i}"),
            )
            .filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "qv", "vec_id", "v")
        )
        cands = c if cands is None else cands.union(c)
    scored = cands.dropDuplicates(["query_id", "vec_id"]).withColumn(
        "cosine", cosine_expr("qv", "v")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("cosine", 6).alias("cosine_r"),
        )
    )


ANN_LSH_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         {_bucket_sql('embedding::DOUBLE[]', TABLES_PLANES[0])} AS bucket0,
         {_bucket_sql('embedding::DOUBLE[]', TABLES_PLANES[1])} AS bucket1
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv, bucket0 AS qb0, bucket1 AS qb1
      FROM e WHERE vec_id < {N_QUERIES}),
cand AS (
  SELECT DISTINCT q.query_id, q.qv, e.vec_id, e.v
  FROM q JOIN e ON (e.bucket0 = q.qb0 OR e.bucket1 = q.qb1) AND e.vec_id <> q.query_id
),
scored AS (
  SELECT query_id, vec_id,
         list_dot_product(qv, v) /
         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
  FROM cand
)
SELECT query_id, vec_id AS neighbor_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank,
       round(cosine, 6) AS cosine_r
FROM scored
QUALIFY rank <= {TOP_K}
"""
