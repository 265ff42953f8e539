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


def _query_matrix(queries: DataFrame):
    """Collect the (small) query side to a normalized NumPy matrix —
    the broadcast dimension of the block nested-loop join."""
    rows = queries.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.sqrt((m * m).sum(axis=1))
    return ids, m, norms


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k neighbors of each query vector (excluding itself):
    (query_id, neighbor_id, rank, cosine), ties broken by neighbor id.

    Physical shape: the query matrix is broadcast; every partition of
    the neighbor side computes a NumPy/BLAS block matmul and emits only
    its LOCAL top-k per query, so the final shuffle carries
    O(queries x k x partitions) rows instead of O(queries x n) — the
    global top-k is a subset of the union of local top-ks."""
    from pyspark.sql import Window
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    qids, qm, qnorms = _query_matrix(queries)
    sc = emb.sparkSession.sparkContext
    bq = sc.broadcast((qids, qm, qnorms))
    schema = StructType(
        [
            StructField("query_id", LongType(), False),
            StructField("neighbor_id", LongType(), False),
            StructField("cosine", DoubleType(), False),
        ]
    )

    def run(batches):
        import pandas as pd

        ids_q, m_q, n_q = bq.value
        for pdf in batches:
            nid = pdf["vec_id"].to_numpy().astype(np.int64)
            block = np.array(list(pdf["embedding"]), dtype=np.float64)
            bnorm = np.sqrt((block * block).sum(axis=1))
            sims = (m_q @ block.T) / np.outer(n_q, bnorm)  # queries x block
            sims[np.equal.outer(ids_q, nid)] = -np.inf  # exclude self
            sims = np.round(sims, 6)
            kk = min(k, nid.size)
            # local top-k per query with (cosine desc, neighbor asc) ties
            order = np.lexsort((nid[None, :].repeat(len(ids_q), 0), -sims), axis=1)[
                :, :kk
            ]
            rows_q = np.repeat(ids_q, kk)
            rows_n = nid[order].ravel()
            rows_c = np.take_along_axis(sims, order, axis=1).ravel()
            keep = rows_c > -np.inf
            yield pd.DataFrame(
                {
                    "query_id": rows_q[keep],
                    "neighbor_id": rows_n[keep],
                    "cosine": rows_c[keep],
                }
            )

    local = emb.select("vec_id", "embedding").mapInPandas(run, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_near_dup(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """All pairs with cosine >= threshold (vec_a < vec_b). Block
    nested-loop with a broadcast full matrix (fine while one side fits
    in executor memory; beyond that, switch to lsh_buckets and join on
    the bucket key)."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    ids, m, norms = _query_matrix(emb)
    bq = emb.sparkSession.sparkContext.broadcast((ids, m, norms))
    schema = StructType(
        [
            StructField("vec_a", LongType(), False),
            StructField("vec_b", LongType(), False),
            StructField("cosine", DoubleType(), False),
        ]
    )

    def run(batches):
        import pandas as pd

        ids_all, m_all, n_all = bq.value
        for pdf in batches:
            aid = pdf["vec_id"].to_numpy().astype(np.int64)
            block = np.array(list(pdf["embedding"]), dtype=np.float64)
            bnorm = np.sqrt((block * block).sum(axis=1))
            sims = np.round((block @ m_all.T) / np.outer(bnorm, n_all), 6)
            mask = (sims >= threshold) & (aid[:, None] < ids_all[None, :])
            ai, bi = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "vec_a": aid[ai],
                    "vec_b": ids_all[bi],
                    "cosine": sims[ai, bi],
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(run, schema)


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
