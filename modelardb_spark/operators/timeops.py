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
    # Unmatched-row recovery: NULL-SAFE equality anti-join on every
    # point column. A surrogate monotonically_increasing_id would be
    # evaluated independently in the matched and anti-join branches and
    # is nondeterministic under shuffles/task retries (rows silently
    # dropped or duplicated); value equality is stable. eqNullSafe
    # matches NULL-bearing rows back to themselves, and duplicate point
    # rows are safe because value-identical copies match (and are
    # excluded) or miss (and are kept) together — exactly the per-copy
    # outcome a row id would give.
    pcols = points.columns
    p = points.alias("_ij_p")
    m = matched.select(*pcols).alias("_ij_m")
    cond = F.lit(True)
    for c in pcols:
        cond = cond & F.col(f"_ij_p.{c}").eqNullSafe(F.col(f"_ij_m.{c}"))
    missing = p.join(m, cond, "left_anti").select(*pcols)
    for c in ivcols:
        missing = missing.withColumn(
            c, F.lit(None).cast(dict(intervals.dtypes)[c])
        )
    return matched.unionByName(missing)
