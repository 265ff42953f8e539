"""Sessionization and interval join: hand-computed semantics, plan
shape, and a no-duplicate guarantee for bucket-spanning intervals."""

from __future__ import annotations

from pyspark.sql import functions as F

from modelardb_spark.operators.timeops import (
    interval_join,
    session_intervals,
    sessionize,
)


def test_sessionize_semantics(spark):
    df = spark.createDataFrame(
        [("a", 0), ("a", 10), ("a", 50), ("a", 55), ("b", 7), ("a", 10)],
        "k string, t long",
    )
    out = sessionize(df, ["k"], "t", gap_ms=20).collect()
    got = sorted((r["k"], r["t"], r["session_idx"]) for r in out)
    # gap 40 (10 -> 50) splits; duplicate t=10 shares session 1
    assert got == [
        ("a", 0, 1), ("a", 10, 1), ("a", 10, 1),
        ("a", 50, 2), ("a", 55, 2), ("b", 7, 1),
    ]


def test_session_intervals(spark):
    df = spark.createDataFrame(
        [("a", 0), ("a", 10), ("a", 50)], "k string, t long"
    )
    rows = {
        r["session_idx"]: (r["start_ms"], r["end_ms"], r["n_rows"])
        for r in session_intervals(df, ["k"], "t", gap_ms=20).collect()
    }
    assert rows == {1: (0, 10, 2), 2: (50, 50, 1)}


def test_interval_join_no_duplicates_across_buckets(spark):
    """An interval spanning many buckets matches a contained point
    exactly once (the point joins only via its own bucket)."""
    pts = spark.createDataFrame([("k", 250), ("k", 950), ("k", 20)],
                                "k string, t long")
    ivs = spark.createDataFrame([("k", 100, 990, "wide")],
                                "k string, lo long, hi long, tag string")
    out = interval_join(pts, ivs, ["k"], "t", "lo", "hi", bucket_ms=100)
    rows = sorted((r["t"], r["tag"]) for r in out.collect())
    assert rows == [(250, "wide"), (950, "wide")]
    # left join keeps the unmatched point with NULL interval columns
    left = interval_join(
        pts, ivs, ["k"], "t", "lo", "hi", bucket_ms=100, how="left"
    )
    rows = sorted((r["t"], r["tag"]) for r in left.collect())
    assert rows == [(20, None), (250, "wide"), (950, "wide")]


def test_interval_join_is_equi_join(spark):
    """The plan must contain an equi-join (hash/sort-merge), never a
    BroadcastNestedLoopJoin / cartesian product."""
    pts = spark.createDataFrame([("k", 5)], "k string, t long")
    ivs = spark.createDataFrame([("k", 0, 10)], "k string, lo long, hi long")
    plan = (
        interval_join(pts, ivs, ["k"], "t", "lo", "hi", bucket_ms=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_sessionize_matches_duckdb(spark, sf_small):
    import duckdb

    ev = spark.read.parquet(f"{sf_small}/events.parquet").select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    )
    got = sorted(
        map(
            tuple,
            session_intervals(ev, ["conv_id"], "ts_ms", gap_ms=1_800_000)
            .collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_small}/events.parquet'"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                """
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) AS conv_id, epoch_ms(ts) AS ts_ms FROM events
), g AS (
  SELECT conv_id, ts_ms,
         CASE WHEN LAG(ts_ms) OVER w IS NULL
                   OR ts_ms - LAG(ts_ms) OVER w > 1800000
              THEN 1 ELSE 0 END AS brk
  FROM ev WINDOW w AS (PARTITION BY conv_id ORDER BY ts_ms)
), s AS (
  SELECT conv_id, ts_ms,
         SUM(brk) OVER (PARTITION BY conv_id ORDER BY ts_ms
                        ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM g
)
SELECT conv_id, session_idx, MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms,
       COUNT(*) AS n_rows
FROM s GROUP BY 1, 2
"""
            ).fetchall(),
        )
    )
    assert got == want


def test_interval_join_left_null_columns_no_duplicates(spark):
    """A matched point row containing NULLs must appear exactly once:
    the unmatched-row recovery anti-joins on a surrogate id, not on the
    (null-unsafe) point columns."""
    pts = spark.createDataFrame(
        [("k", 250, None), ("k", 20, None), ("k", 30, "z")],
        "k string, t long, extra string",
    )
    ivs = spark.createDataFrame(
        [("k", 100, 990, "wide")], "k string, lo long, hi long, tag string"
    )
    out = interval_join(
        pts, ivs, ["k"], "t", "lo", "hi", bucket_ms=100, how="left"
    )
    rows = sorted((r["t"], r["extra"], r["tag"]) for r in out.collect())
    assert rows == [(20, None, None), (30, "z", None), (250, None, "wide")]
    assert "_pid" not in out.columns
