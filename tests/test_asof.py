"""AS-OF join operator: inclusive/strict/tolerance semantics against
hand-computed expectations, and the single-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from modelardb_spark.operators.asof import asof_join


def _fixture(spark):
    left = spark.createDataFrame(
        [("a", 5, "l1"), ("a", 9, "l2"), ("a", 4, "l0"), ("b", 3, "l3")],
        "k string, t long, name string",
    )
    right = spark.createDataFrame(
        [("a", 4, 100.0), ("a", 9, 200.0), ("b", 7, 300.0)],
        "k string, rt long, v double",
    )
    return left, right


def test_asof_inclusive_semantics(spark):
    left, right = _fixture(spark)
    out = {
        r["name"]: (r["rt_asof"], r["v_asof"])
        for r in asof_join(left, right, ["k"], "t", "rt", ["v"]).collect()
    }
    assert out == {
        "l0": (4, 100.0),   # equal timestamp matches (inclusive)
        "l1": (4, 100.0),
        "l2": (9, 200.0),
        "l3": (None, None),  # right row is in the future
    }


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _fixture(spark)
    out = {
        r["name"]: r["rt_asof"]
        for r in asof_join(
            left, right, ["k"], "t", "rt", ["v"], strict=True
        ).collect()
    }
    assert out["l0"] is None        # 4 < 4 fails strictly
    assert out["l2"] == 4           # 9 -> the strictly-earlier 4
    assert out["l1"] == 4


def test_asof_tolerance_voids_stale_matches(spark):
    left, right = _fixture(spark)
    out = {
        r["name"]: r["v_asof"]
        for r in asof_join(
            left, right, ["k"], "t", "rt", ["v"], tolerance_ms=1
        ).collect()
    }
    assert out["l0"] == 100.0       # age 0
    assert out["l1"] == 100.0       # age 1 == tolerance
    assert out["l2"] == 200.0       # age 0
    assert out["l3"] is None


def test_asof_plan_is_single_exchange_window(spark):
    """One shuffle, one window sort — no join node, no explosion."""
    left, right = _fixture(spark)
    df = asof_join(left, right, ["k"], "t", "rt", ["v"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan


def test_asof_matches_duckdb_on_events(spark, sf_small):
    """Cross-engine: the union-tag window formulation equals DuckDB's
    native ASOF LEFT JOIN on the events table."""
    import duckdb

    ev = spark.read.parquet(f"{sf_small}/events.parquet").select(
        "event_id",
        F.col("user_id").cast("string").alias("conv_id"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        "event_type",
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "conv_id", F.col("ts_ms").alias("p_ms")
    )
    j = asof_join(ev, purchases, ["conv_id"], "ts_ms", "p_ms", [])
    got = sorted(
        (r["event_id"], r["conv_id"], r["ts_ms"], r["p_ms_asof"])
        for r in j.collect()
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
  SELECT event_id, CAST(user_id AS VARCHAR) AS conv_id,
         epoch_ms(ts) AS ts_ms, event_type
  FROM events
), p AS (SELECT conv_id, ts_ms AS p_ms FROM ev WHERE event_type = 'purchase')
SELECT e.event_id, e.conv_id, e.ts_ms, p.p_ms
FROM ev e ASOF LEFT JOIN p ON e.conv_id = p.conv_id AND e.ts_ms >= p.p_ms
"""
            ).fetchall(),
        )
    )
    assert got == want


def test_bucketed_asof_equals_single_window(spark):
    """The skew-proof two-pass form must produce exactly the single-
    window results for every (strict, tolerance) combination — random
    data, unique timestamps per key, buckets much smaller than the
    time range so carry-in paths are exercised hard."""
    import random

    from modelardb_spark.operators.asof import asof_join_bucketed

    rng = random.Random(11)
    keys = ["a", "b", "c"]
    lts = {k: rng.sample(range(0, 5000), 120) for k in keys}
    rts = {k: rng.sample(range(-50, 4800), 40) for k in keys}
    left = spark.createDataFrame(
        [(k, t, f"{k}{t}") for k in keys for t in lts[k]],
        "k string, t long, name string",
    )
    right = spark.createDataFrame(
        [(k, t, float(t * 2)) for k in keys for t in rts[k]],
        "k string, rt long, v double",
    )
    for strict in (False, True):
        for tol in (None, 300):
            a = sorted(
                map(
                    tuple,
                    asof_join(
                        left, right, ["k"], "t", "rt", ["v"],
                        strict=strict, tolerance_ms=tol,
                    ).select("k", "t", "rt_asof", "v_asof").collect(),
                )
            )
            b = sorted(
                map(
                    tuple,
                    asof_join_bucketed(
                        left, right, ["k"], "t", "rt", ["v"],
                        bucket_ms=250, strict=strict, tolerance_ms=tol,
                    ).select("k", "t", "rt_asof", "v_asof").collect(),
                )
            )
            assert a == b, (strict, tol)


def test_bucketed_asof_windows_are_bucket_partitioned(spark):
    """The in-bucket window must partition by (key, bucket), never by
    the bare key — that is the whole point of the two-pass form."""
    from modelardb_spark.operators.asof import asof_join_bucketed

    left = spark.createDataFrame([("k", 5, "x")], "k string, t long, name string")
    right = spark.createDataFrame([("k", 3, 1.0)], "k string, rt long, v double")
    df = asof_join_bucketed(left, right, ["k"], "t", "rt", ["v"], bucket_ms=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    # at least one window keyed by (k, _ab); none keyed by k alone with
    # the row-level timestamp ordering
    assert any("_ab" in s for s in specs), specs


def test_asof_matched_row_null_column_stays_null(spark):
    """Row semantics: when the MATCHED right row holds a NULL value
    column, the join must carry that NULL — not resurrect an older
    row's value (per-column carry-forward would)."""
    from modelardb_spark.operators.asof import asof_join_bucketed

    left = spark.createDataFrame(
        [("a", 7, "l1"), ("a", 4, "l0")], "k string, t long, name string"
    )
    right = spark.createDataFrame(
        [("a", 3, 100.0, "x"), ("a", 6, None, "y")],
        "k string, rt long, v double, w string",
    )
    for df in (
        asof_join(left, right, ["k"], "t", "rt", ["v", "w"]),
        # bucket width 2: the t=7 row matches rt=6 in-bucket while a
        # carry-in (rt=3) is also visible — the NULL must still win
        asof_join_bucketed(left, right, ["k"], "t", "rt", ["v", "w"], bucket_ms=2),
    ):
        out = {
            r["name"]: (r["rt_asof"], r["v_asof"], r["w_asof"])
            for r in df.collect()
        }
        assert out["l1"] == (6, None, "y"), out
        assert out["l0"] == (3, 100.0, "x"), out


def test_bucketed_asof_tied_right_rows_do_not_mix_columns(spark):
    """Boundary reduction: two right rows tied on ts must carry as ONE
    row — (v, w) from the same row, never v from one and w from the
    other."""
    from modelardb_spark.operators.asof import asof_join_bucketed

    left = spark.createDataFrame([("a", 20, "l")], "k string, t long, name string")
    right = spark.createDataFrame(
        [("a", 5, 1.0, "one"), ("a", 5, 2.0, "two")],
        "k string, rt long, v double, w string",
    )
    r = asof_join_bucketed(
        left, right, ["k"], "t", "rt", ["v", "w"], bucket_ms=10
    ).collect()[0]
    assert (r["v_asof"], r["w_asof"]) in {(1.0, "one"), (2.0, "two")}, r
