"""Similarity search over an embedding column (`array<float>`).

- `cosine_topk`: brute-force exact top-k — the correctness baseline.
  The dot product is a JVM-side `aggregate(zip_with(...))` fold (no
  Python); the self-join broadcasts the (small) query side.
- `lsh_buckets` / `lsh_topk`: the scale path — random-hyperplane LSH:
  each vector is reduced to a B-bit sign signature; candidates share a
  signature bucket, so the join is a key join with O(n) shuffle volume
  instead of an O(n^2) cross product. Hyperplanes are generated
  deterministically from a seed via md5 folding, so the oracle can
  reproduce them.
- `embedding_near_dup`: threshold variant for near-duplicate removal.

Norms and dots are computed in float64 from float32 inputs with a
fixed left-to-right fold in both engines; outputs are rounded for
hash portability.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def with_norm(emb: DataFrame) -> DataFrame:
    return emb.withColumn("norm", F.sqrt(_dot(F.col("embedding"), F.col("embedding"))))


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k neighbors of each query vector (excluding itself).
    (query_id, neighbor_id, rank, cosine). Deterministic tie-break by
    neighbor id."""
    from pyspark.sql import Window

    base = with_norm(emb).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("emb_n"),
        F.col("norm").alias("norm_n"),
    )
    q = with_norm(queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("emb_q"),
        F.col("norm").alias("norm_q"),
    )
    joined = base.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("emb_q"), F.col("emb_n")) / (F.col("norm_q") * F.col("norm_n")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_near_dup(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """All pairs with cosine >= threshold (doc_a < doc_b)."""
    base = with_norm(emb)
    a = base.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), F.col("norm").alias("na")
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), F.col("norm").alias("nb")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6).alias(
                "cosine"
            ),
        )
        .where(F.col("cosine") >= threshold)
    )


def hyperplanes(dim: int, bits: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (i, j) is a
    signed value derived from md5(f"{seed}:{i}:{j}") — reproducible in
    any engine without an RNG."""
    planes = []
    for i in range(bits):
        row = []
        for j in range(dim):
            h = hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()
            v = int(h[:8], 16) / float(0xFFFFFFFF) - 0.5
            row.append(v)
        planes.append(row)
    return planes


def lsh_buckets(emb: DataFrame, bits: int = 16, seed: int = 42) -> DataFrame:
    """(vec_id, bucket): sign-of-projection signature. The plane matrix
    is a broadcast literal; projection is a JVM fold per plane."""
    dim = len(emb.select("embedding").first()[0])
    planes = hyperplanes(dim, bits, seed)
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(p) for p in plane]),
                lambda x, p: x.cast("double") * p,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
    return emb.select("vec_id", sig.alias("bucket"))


def lsh_topk(emb: DataFrame, k: int = 5, bits: int = 8, seed: int = 42) -> DataFrame:
    """Approximate top-k: exact ranking *within* each LSH bucket. The
    pair join is keyed on the bucket, so shuffle volume stays linear;
    recall is tuned with `bits` (fewer bits -> bigger buckets)."""
    from pyspark.sql import Window

    buckets = lsh_buckets(emb, bits, seed)
    base = with_norm(emb).join(buckets, "vec_id")
    a = base.select(
        F.col("bucket"),
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("eq"),
        F.col("norm").alias("nq"),
    )
    b = base.select(
        F.col("bucket"),
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("en"),
        F.col("norm").alias("nn"),
    )
    scored = (
        a.join(b, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("eq"), F.col("en")) / (F.col("nq") * F.col("nn")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
