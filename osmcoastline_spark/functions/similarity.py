"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exactness baseline: JVM-side dot products
  via zip_with/aggregate (no Python), window top-k per query.
* LSH-bucketed variant — the scale path: random-hyperplane sign buckets
  (deterministic seeded planes) bound the candidate set; exact cosine only
  within a bucket. Recall grows with n_tables; the bucket join replaces the
  O(n²) cross join exactly like cell binning replaces the spatial sweep.
* IVF-style variant — deterministic grid-coarse quantizer (no kmeans dep):
  route each vector to its dominant-dimension sign cell.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def with_unit_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    n = _norm(F.col(vec_col))
    return df.withColumn("_norm", n).filter(F.col("_norm") > 0)


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 5,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self)."""
    v = vectors.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("nbr_vec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    scored = (
        q.crossJoin(v)
        .filter(F.col("query_id") != F.col("nbr_id"))
        .withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("nbr_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cos", "rank")
    )


def hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((bits, dim))


def lsh_bucket_expr(vec_col: str, planes: np.ndarray) -> Column:
    """Sign-bucket id as pure column math: bit b = (vec · plane_b) > 0."""
    code = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        d = _dot(F.col(vec_col), arr)
        code = code + F.when(d > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return code


def lsh_topk(
    vectors: DataFrame, k: int = 5, bits: int = 8, n_tables: int = 2,
    vec_col: str = "embedding", id_col: str = "vec_id", seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share a sign-bucket in ≥1 table."""
    dim = len(vectors.select(vec_col).first()[0])
    tagged = vectors
    bucket_cols = []
    for t in range(n_tables):
        planes = hyperplanes(dim, bits, seed + t)
        col = f"bucket_{t}"
        tagged = tagged.withColumn(col, lsh_bucket_expr(vec_col, planes))
        bucket_cols.append(col)
    tagged = tagged.select(id_col, vec_col, *bucket_cols).cache()

    cands = None
    for col in bucket_cols:
        a = tagged.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), F.col(col).alias("bk"))
        b = tagged.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("nbr_vec"), F.col(col).alias("bk"))
        c = a.join(b, "bk").filter(F.col("query_id") != F.col("nbr_id")).drop("bk")
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.dropDuplicates(["query_id", "nbr_id"])

    scored = cands.withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("nbr_vec")), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cos", "rank")
    )


def embedding_near_dup_pairs(
    vectors: DataFrame, threshold: float = 0.95, bits: int = 8,
    n_tables: int = 2, vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets + exact verify."""
    top = lsh_topk(vectors, k=50, bits=bits, n_tables=n_tables, vec_col=vec_col, id_col=id_col)
    return (
        top.filter(F.col("cos") >= threshold)
        .filter(F.col("query_id") < F.col("nbr_id"))
        .select(F.col("query_id").alias("a"), F.col("nbr_id").alias("b"), "cos")
    )
