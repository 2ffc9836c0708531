"""Similarity search over embedding columns (array<float>).

Two paths:
- brute-force cosine top-k — the exact baseline; a broadcast of the
  (small) query set against the corpus, ranked per query. Correct at
  any corpus size: the corpus is never shuffled, scores reduce via a
  per-query top-k window.
- sign-LSH bucketed ANN — the scale path: R deterministic ±1
  hyperplanes → R sign bits → bucket key; candidates equi-join on the
  bucket (hash shuffle), so cost is corpus-linear + per-bucket work.

Dot products use F.aggregate's strict left-fold in DOUBLE: the result
is bit-identical regardless of partitioning (per-row scalar math), and
matches DuckDB's unnest-in-order SUM — which is why the oracle queries
can hash-compare scores exactly. (DuckDB's list_dot_product accumulates
in FLOAT and does NOT match — deliberately avoided.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_engineer_project_spark.functions.text import hyperplane


def dot(a: Column, b: Column) -> Column:
    """Exact-order double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set over the corpus.

    Returns (query_id, neighbor_id, score). Self-matches excluded.
    Deterministic: ties broken by neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )


def lsh_bucket(vec: Column, num_planes: int = 4, dim: int = 64) -> Column:
    """Sign-LSH bucket id: bit r = sign(vec · hyperplane_r), planes are
    deterministic ±1 literals shared with the oracle SQL."""
    bucket = F.lit(0)
    for r in range(num_planes):
        plane = F.array(*[F.lit(float(v)) for v in hyperplane(r, dim)])
        bucket = bucket + F.when(dot(vec, plane) > 0, F.lit(1 << r)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    num_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via sign-LSH: candidates share the query's bucket; exact
    cosine + top-k within bucket. Returns (query_id, neighbor_id,
    bucket, score)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        lsh_bucket(F.col(vec_col), num_planes, dim).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        lsh_bucket(F.col(vec_col), num_planes, dim).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "bucket",
            cosine(F.col("qvec"), F.col("cvec")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "bucket", "score")
    )
