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

#: fan-out granularity: one task per this many input bytes (compressed)
#: when the source is a file scan. Small enough that the CPU-heavy map
#: work this module exists for (md5 minhashing, BLAS matmuls, container
#: codecs) parallelizes fully at the fixture scales, large enough that a
#: tiny correctness-gate input does not explode into empty tasks.
_BYTES_PER_TASK = 128 * 1024


def fan_out(df: DataFrame, key: str | None = None) -> DataFrame:
    """Repartition `df` up to the session's default parallelism when the
    underlying scan produced fewer partitions. `key` picks hash
    partitioning on that column; None falls back to round-robin.

    The target is size-adaptive: for file sources, at most one task per
    `_BYTES_PER_TASK` of input, capped at defaultParallelism — so a
    tiny input (the sf0.01 correctness gate) keeps its single partition
    and pays NO extra exchange, while anything big enough to matter
    fans out fully; at production scale the scan already has more
    partitions than the cap and the whole function is a no-op."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n >= par:
        return df
    target = par
    try:
        files = df.inputFiles()
        if files:
            import os

            total = sum(os.path.getsize(f.replace("file:", "")) for f in files)
            target = max(1, min(par, -(-total // _BYTES_PER_TASK)))
    except Exception:
        pass  # non-file source / remote FS: keep the full fan-out
    if n >= target:
        return df
    return df.repartition(target, key) if key else df.repartition(target)
