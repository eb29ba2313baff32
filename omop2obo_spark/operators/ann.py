"""Approximate-nearest-neighbor search over embedding columns.

Two strategies over an ``array<float>`` embedding column:
  * brute-force cosine top-k — the exactness baseline: broadcast the query
    set, one native ``zip_with``/``aggregate`` dot product per (query,
    candidate), window top-k. No UDF, no shuffle of the big side.
  * IVF (inverted-file) top-k — the scale path: pick C deterministic
    centroids, assign every vector to its nearest centroid (broadcast
    centroids), probe only the ``nprobe`` nearest centroid buckets per
    query. Cuts the candidate set by ~C/nprobe at the cost of recall.

Cosine here assumes unnormalized vectors (full formula); pre-normalized
embeddings short-circuit to the dot product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k of ``vectors`` for each row of ``queries``.

    ``queries`` must be small (broadcast side); vectors scan stays local.
    Output: (query_id, vec_id, cos, rank), rank 1..k, self-match excluded
    when ids collide.
    """
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv"))
    joined = vectors.join(F.broadcast(q), on=F.col(id_col) != F.col(query_id_col))
    scored = joined.select(
        query_id_col, id_col,
        F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    vectors: DataFrame, n_centroids: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF: centroids = the ``n_centroids`` lowest-id vectors
    (stable, no RNG/k-means iterations — a production system would run
    k-means; the bucketing/probing mechanics are identical).

    Returns (centroids, assignments(vec_id, centroid_id)).
    """
    centroids = vectors.orderBy(id_col).limit(n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec")
    )
    scored = vectors.join(F.broadcast(centroids)).select(
        id_col, "centroid_id", cosine(F.col(vec_col), F.col("cvec")).alias("ccos")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("ccos"), F.asc("centroid_id"))
    assignments = (
        scored.withColumn("r", F.row_number().over(w)).filter(F.col("r") == 1)
        .select(id_col, "centroid_id")
    )
    return centroids, assignments


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-bucketed approximate top-k: probe the ``nprobe`` nearest
    centroid buckets per query, brute-force inside them."""
    centroids, assignments = ivf_assign(vectors, n_centroids, id_col, vec_col)
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv"))
    qc = q.join(F.broadcast(centroids)).select(
        query_id_col, "centroid_id", "__qv", cosine(F.col("__qv"), F.col("cvec")).alias("ccos")
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.desc("ccos"), F.asc("centroid_id"))
    probes = qc.withColumn("r", F.row_number().over(wq)).filter(F.col("r") <= nprobe).select(
        query_id_col, "centroid_id", "__qv"
    )
    bucketed = vectors.join(assignments, on=id_col)
    cand = bucketed.join(
        F.broadcast(probes),
        on=(bucketed["centroid_id"] == probes["centroid_id"]) & (F.col(id_col) != F.col(query_id_col)),
    )
    scored = cand.select(
        query_id_col, id_col, F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("cos")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
