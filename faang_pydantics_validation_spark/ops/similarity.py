"""Similarity search over an embedding column (array<float>).

Two paths, mirroring what a 100 TB pipeline actually deploys:

* brute-force cosine top-k — the exact baseline. The query set is small
  and broadcast; the corpus is scanned ONCE, scored row-locally with a
  deterministic left-to-right fold (no UDF, bitwise-reproducible doubles),
  and top-k is a per-query window. Cost: O(|corpus| * |queries| * dim)
  spread across executors with zero corpus shuffle.

* random-hyperplane LSH — the approximate scale path. Each vector hashes
  row-locally to a bucket id from the signs of H pseudo-random projections
  (hyperplanes derived deterministically from xxhash64, identical on every
  executor — no state to ship). Candidates are only corpus rows sharing
  the query's bucket: the crossJoin disappears, the join key is uniform,
  recall is tunable by H and by probing neighbor buckets.

The same dot-product kernel doubles as the embedding-cosine near-dup
check (cosine ≥ threshold on LSH-cohabiting pairs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Deterministic double-precision dot product: elementwise multiply,
    then an ordered fold (left→right), so Spark and any external oracle
    computing in the same order agree bit-for-bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, score, rank).

    ``queries`` is broadcast — the corpus never shuffles; ranking ties
    break on neighbor id ascending so results are fully deterministic.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    scored = c.crossJoin(q).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("__qvec"), F.col("__cvec")).alias("score"),
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


# ------------------------------------------------------------------- LSH --


def hyperplane_component(plane: int, j: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    xxhash64 of (plane, j) scaled. Pure literal expression — identical on
    driver, executors, and any re-run."""
    h = F.xxhash64(F.lit(plane), F.lit(j))
    return (h.cast("double") / F.lit(float(2**63)))


def lsh_bucket(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Sign-of-projection bucket id (0..2^n_planes-1) computed row-locally.
    dim is a plan-time constant (embedding width)."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = None
        for j in range(dim):
            term = F.element_at(vec, j + 1).cast("double") * hyperplane_component(p, j)
            proj = term if proj is None else proj + term
        bucket = bucket + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: score only corpus rows in the query's LSH bucket.

    With H planes the corpus splits into ≈2^H buckets; expected candidate
    count is |corpus| / 2^H per query, and the join on ``bucket`` replaces
    the crossJoin. Recall < 1 by design — callers trade it against H.
    Output schema matches :func:`cosine_topk`.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("__qvec"),
            lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
        )
    )
    scored = c.join(q, "bucket").select(
        "query_id",
        "neighbor_id",
        cosine(F.col("__qvec"), F.col("__cvec")).alias("score"),
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-cohabiting pairs with
    cosine ≥ threshold → (id_a, id_b, score). The all-pairs check never
    materializes — only within-bucket pairs are scored."""
    h = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).alias("__vec"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    left, right = h.alias("l"), h.alias("r")
    pairs = left.join(
        right,
        on=(F.col("l.bucket") == F.col("r.bucket"))
        & (F.col("l.doc_id") < F.col("r.doc_id")),
    ).select(
        F.col("l.doc_id").alias("id_a"),
        F.col("r.doc_id").alias("id_b"),
        cosine(F.col("l.__vec"), F.col("r.__vec")).alias("score"),
    )
    return pairs.filter(F.col("score") >= threshold)
