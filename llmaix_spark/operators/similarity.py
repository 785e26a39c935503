"""Similarity search over an embedding column (array<float>).

Two paths:
  cosine_topk — brute-force exact top-k (baseline + oracle): broadcast
    the query set, one narrow pass over the corpus, per-query window
    top-k. Exact, deterministic tie-break on vec_id.
  ivf_topk — IVF-lite approximate path for scale: deterministic
    centroids (first n_centroids vectors by id), corpus bucketed by
    nearest centroid (one narrow pass), queries probe the nprobe nearest
    buckets only. Search cost drops by ~n_centroids/nprobe; recall
    degrades gracefully. Bucket assignment is a plain column, so the
    corpus can be written partitioned-by-bucket for pruned scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from llmaix_spark.operators.dedup import cosine_expr


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Exact top-k by cosine for each query id. Returns
    (query_id, vec_id, rank, cosine); the query row itself is excluded.
    The query set is tiny → broadcast; the corpus is scanned once."""
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), round_dp).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "cosine")
    )


def assign_buckets(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """IVF bucket assignment with deterministic centroids (the
    n_centroids lowest ids — reproducible without a kmeans fit; swap in
    persisted kmeans centroids at scale). Returns (bucketed, centroids).

    Nearest-centroid choice orders by ROUNDED cosine with centroid_id as
    tiebreak: the rounding makes assignment reproducible across engines
    and float orders (the DuckDB oracle computes cosine in float32,
    Spark in double — see SQL_ANN_IVF_TOPK)."""
    centroids = (
        embeddings.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centv")
        )
    )
    scored = F.broadcast(centroids).join(
        embeddings.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.round(cosine_expr(F.col("centv"), F.col("v")), round_dp).desc(),
        F.col("centroid_id").asc(),
    )
    bucketed = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter("rnk = 1")
        .select("vec_id", "v", F.col("centroid_id").alias("bucket"))
    )
    return bucketed, centroids


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """Approximate top-k: probe only the nprobe buckets nearest to each
    query. Same output schema as cosine_topk. Fully deterministic
    (rounded-cosine orderings with id tiebreaks), so the whole IVF path —
    centroid choice, bucket assignment, probing, final ranks — has an
    exact SQL twin despite recall < 1 vs brute force."""
    bucketed, centroids = assign_buckets(
        embeddings, n_centroids, id_col, vec_col, round_dp
    )
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    qc = F.broadcast(q).join(centroids)
    wq = Window.partitionBy("query_id").orderBy(
        F.round(cosine_expr(F.col("qv"), F.col("centv")), round_dp).desc(),
        F.col("centroid_id").asc(),
    )
    probes = (
        qc.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= nprobe)
        .select("query_id", "qv", F.col("centroid_id").alias("bucket"))
    )
    scored = (
        F.broadcast(probes)
        .join(bucketed, "bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_expr(F.col("qv"), F.col("v")), round_dp).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "cosine")
    )
