"""Time-series utility operators beyond the reference's set:
gap-based sessionization and a bucketized point-in-interval join —
the two joins a transcript/training-data pipeline reaches for first
("split conversations into sessions", "attach each event to the
enclosing window/segment").

Both are pure DataFrame compositions — no Python rows, no UDFs:

- `sessionize` is one window pass (lag -> gap flag -> running sum):
  one shuffle+sort per key, identical shape to the as-of join.
- `interval_join` avoids the cross-product trap: intervals explode
  into the fixed-width buckets they cover (bounded by interval
  length / bucket), points carry exactly one bucket, and the equi-join
  on (keys..., bucket) + exact BETWEEN filter touches only candidate
  pairs sharing a bucket. Each point lives in ONE bucket, so a
  spanning interval never duplicates a match. At 100 TB this is the
  standard interval-join strategy (Spark has no native one); bucket
  width trades replication factor of the interval side against
  candidate density.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DAY_MS = 86_400_000


def sessionize(
    df: DataFrame,
    key: list[str],
    ts: str,
    gap_ms: int,
    out_col: str = "session_idx",
) -> DataFrame:
    """Assign 1-based session indexes per key: a new session starts at
    the first row and wherever the gap to the previous timestamp
    exceeds `gap_ms`. Ties in `ts` share a session regardless of their
    internal order (gap 0), so the result is deterministic even with
    duplicate timestamps."""
    w = Window.partitionBy(*key).orderBy(ts)
    prev = F.lag(F.col(ts)).over(w)
    brk = F.when(
        prev.isNull() | (F.col(ts) - prev > gap_ms), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(*key).orderBy(ts).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, F.sum(brk).over(run))


def session_intervals(
    df: DataFrame,
    key: list[str],
    ts: str,
    gap_ms: int,
) -> DataFrame:
    """Collapse sessions to intervals: (keys..., session_idx, start_ms,
    end_ms, n_rows)."""
    s = sessionize(df, key, ts, gap_ms)
    return s.groupBy(*key, "session_idx").agg(
        F.min(ts).alias("start_ms"),
        F.max(ts).alias("end_ms"),
        F.count("*").alias("n_rows"),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str,
    lo: str,
    hi: str,
    bucket_ms: int = DAY_MS,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to the interval rows that contain it
    (`lo <= ts <= hi`), equi-keyed on `on`. Executes as a bucketized
    equi-join: no cross product, no unbounded task. `how` is "inner"
    or "left" (left keeps pointless rows with NULL interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(how)
    if how == "left":
        # surrogate row id: the unmatched-row recovery anti-joins on
        # this single id — anti-joining on all point columns would
        # re-emit any matched row containing a NULL (null-unsafe
        # equality never matches it back to itself)
        points = points.withColumn("_pid", F.monotonically_increasing_id())
    b_pts = points.withColumn(
        "_ib", (F.col(point_ts) / bucket_ms).cast("long")
    )
    b_iv = intervals.withColumn(
        "_ib",
        F.explode(
            F.sequence(
                (F.col(lo) / bucket_ms).cast("long"),
                (F.col(hi) / bucket_ms).cast("long"),
            )
        ),
    )
    joined = b_pts.join(b_iv, on + ["_ib"], "inner").where(
        (F.col(point_ts) >= F.col(lo)) & (F.col(point_ts) <= F.col(hi))
    )
    if how == "inner":
        return joined.drop("_ib")
    ivcols = [c for c in intervals.columns if c not in on]
    matched = joined.drop("_ib")
    missing = b_pts.join(
        matched.select("_pid").distinct(), "_pid", "left_anti"
    ).drop("_ib")
    for c in ivcols:
        missing = missing.withColumn(
            c, F.lit(None).cast(dict(intervals.dtypes)[c])
        )
    return matched.unionByName(missing).drop("_pid")
