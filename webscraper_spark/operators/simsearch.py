"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the correctness baseline; native F.zip_with /
  F.aggregate dot products (JVM-side), window top-k.
- sign-LSH (random hyperplanes) bucketed ANN: the scale path — candidates
  share at least one band bucket, so the join is per-bucket instead of n².
  Recall vs brute force is measured in tests.

Hyperplanes are xxhash64-derived pseudo-randoms (deterministic, seeded) —
no numpy RNG state at plan-build time, so plans are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d == 0, F.lit(0.0)).otherwise(dot(a, b) / d)


def brute_force_topk(
    df: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    q_id_col: str = "q_id", q_vec_col: str = "q_vec",
) -> DataFrame:
    """Top-k cosine neighbours per query. queries is broadcast (queries are
    few; the corpus is big — never the other way around)."""
    q = queries.select(F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("q_vec"))
    scored = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")).join(F.broadcast(q)).withColumn(
        "cos", cosine(F.col("vec"), F.col("q_vec"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "vec_id", F.round("cos", 6).alias("cos"), F.col("rk").alias("rank"))
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from a hash chain."""
    vals = []
    state = (plane_idx + 1) * 0x9E3779B97F4A7C15 % (1 << 64)
    for i in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        vals.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
    return vals


def sign_lsh_buckets(vec: Column, dim: int, n_planes: int = 16, bands: int = 4) -> Column:
    """array<struct<band,bucket>>: sign bits of `n_planes` hyperplane dots,
    grouped into `bands` keys."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(v) for v in _hyperplane(dim, p)])) >= 0, F.lit(1)).otherwise(F.lit(0))
        for p in range(n_planes)
    ]
    per_band = n_planes // bands
    out = []
    for b in range(bands):
        key = F.lit(0)
        for j in range(per_band):
            key = key * 2 + bits[b * per_band + j]
        out.append(F.struct(F.lit(b).alias("band"), key.cast("long").alias("bucket")))
    return F.array(*out)


def lsh_ann_topk(
    df: DataFrame, queries: DataFrame, dim: int, k: int = 10,
    n_planes: int = 16, bands: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    q_id_col: str = "q_id", q_vec_col: str = "q_vec",
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing any LSH band
    bucket with the query, then exact cosine + window top-k on candidates."""
    base = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")).withColumn(
        "bb", F.explode(sign_lsh_buckets(F.col("vec"), dim, n_planes, bands))
    ).select("vec_id", "vec", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    q = queries.select(F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("q_vec")).withColumn(
        "bb", F.explode(sign_lsh_buckets(F.col("q_vec"), dim, n_planes, bands))
    ).select("q_id", "q_vec", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    cand = base.join(F.broadcast(q), ["band", "bucket"]).dropDuplicates(["q_id", "vec_id"])
    scored = cand.withColumn("cos", cosine(F.col("vec"), F.col("q_vec")))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "vec_id", F.round("cos", 6).alias("cos"), F.col("rk").alias("rank"))
    )
