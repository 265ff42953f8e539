"""Scan-parallelism floor for narrow inputs.

The driver's fixture tables are single-file, single-row-group parquet
(`documents` / `embeddings` / `events` are one unsplittable split each),
so any CPU-heavy map stage planned directly over the scan — shingling +
md5 minhashing, LSH signature matmuls, per-row container codecs — runs
as ONE task no matter how many cores the session has. This is the
"input skew" case of the optimization playbook (guide §2.5: one huge
unsplittable file -> repartition immediately after the read).

`fan_out` repartitions such a frame to the session's default
parallelism, keyed by a deterministic column (hash partitioning — no
round-robin sort, and task retries are trivially deterministic). It is
a no-op whenever the source already produced at least that many
partitions, so at production scale (thousands of splits) no extra
exchange is added — the knob stays scale-adaptive rather than tuned to
local[32].
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, key: str | None = None) -> DataFrame:
    """Repartition `df` up to the session's default parallelism when the
    underlying scan produced fewer partitions. `key` picks hash
    partitioning on that column; None falls back to round-robin."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n >= par:
        return df
    return df.repartition(par, key) if key else df.repartition(par)
