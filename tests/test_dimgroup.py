"""Dimension-driven cross-entity grouping tests: registry stability,
exact reconstruction at bound 0 on the transcripts workload, and the
stored-bytes win on a dense aligned fixture (the case the reference's
dimension-member Correlation clauses target)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from modelardb_spark.config import EngineConfig
from modelardb_spark.operators.dimensions import conversation_dimensions
from modelardb_spark.operators.dimgroup import (
    dim_group_members,
    explode_dim_group_segments,
    fit_segments_dim_grouped,
    rollup_from_dim_group_segments,
)
from modelardb_spark.operators.rollup import HOUR_MS, MINUTE_MS
from modelardb_spark.operators.series import derive_series
from modelardb_spark.operators.transcripts import transcripts_from_events

CFG = EngineConfig(error_bound=0.0)


@pytest.fixture(scope="module")
def series(spark, sf_small):
    s = derive_series(transcripts_from_events(spark, sf_small), CFG).cache()
    s.count()
    return s


def test_member_registry_stable_and_bounded(spark, series):
    dims = conversation_dimensions(series)
    members = dim_group_members(series, dims, by="channel", max_group_size=8)
    rows = members.collect()
    # every series registered exactly once
    assert len(rows) == series.select("conv_id", "metric").distinct().count()
    by_g = {}
    for r in rows:
        by_g.setdefault(r["gkey"], []).append(r)
    for g, ms in by_g.items():
        assert len(ms) <= 8
        assert all(r["gsize"] == len(ms) for r in ms)
        assert sorted(r["midx"] for r in ms) == list(range(len(ms)))


def test_dim_group_rollup_matches_raw(spark, series):
    dims = conversation_dimensions(series)
    members = dim_group_members(series, dims, by="channel", max_group_size=8)
    gseg = fit_segments_dim_grouped(series, members, CFG)
    got = {
        (r["conv_id"], r["metric"], r["window_ms"]): (
            r["cnt"], float(r["vmin"]), float(r["vmax"]), round(r["vsum"], 6),
        )
        for r in rollup_from_dim_group_segments(gseg, members, HOUR_MS).collect()
    }
    raw = (
        series.groupBy(
            "conv_id",
            "metric",
            ((F.col("bin_ms") / HOUR_MS).cast("long") * HOUR_MS).alias("window_ms"),
        )
        .agg(
            F.count("*").alias("cnt"),
            F.min("value").cast("double").alias("vmin"),
            F.max("value").cast("double").alias("vmax"),
            F.sum(F.col("value").cast("double")).alias("vsum"),
        )
    )
    want = {
        (r["conv_id"], r["metric"], r["window_ms"]): (
            r["cnt"], r["vmin"], r["vmax"], round(r["vsum"], 6),
        )
        for r in raw.collect()
    }
    assert got == want


def test_dim_group_wins_on_dense_aligned_members(spark):
    """Four conversations in one channel, all metrics constant and
    dense on the same grid: ONE group PMC row must replace eight
    per-series rows — the dimension clause's intended payoff."""
    n = 200
    bins = [60_000 * i for i in range(n)]
    pdfs = []
    for c in range(4):
        for m in ("turn_rate", "tool_usage"):
            pdfs.append(
                pd.DataFrame(
                    {
                        "conv_id": [f"conv{c}"] * n,
                        "metric": [m] * n,
                        "bin_ms": bins,
                        "value": np.float32(5.0),
                    }
                )
            )
    series = spark.createDataFrame(pd.concat(pdfs, ignore_index=True))
    dims = spark.createDataFrame(
        [(f"conv{c}", "web") for c in range(4)], "conv_id string, channel string"
    )
    members = dim_group_members(series, dims, by="channel", max_group_size=8)
    gseg = fit_segments_dim_grouped(series, members, CFG).cache()
    rows = gseg.collect()
    assert all(r["group_size"] == 8 and not r["gaps"] for r in rows)
    grp_bytes = sum(24 + len(r["model"]) + 4 * len(r["gaps"]) for r in rows)
    # per-series floor: 8 series x (24 + 4) PMC bytes minimum
    assert grp_bytes < 8 * 28
    # and the exploded members reconstruct per real (conv_id, metric)
    seg = explode_dim_group_segments(gseg, members)
    agg = seg.groupBy("conv_id", "metric").agg(F.sum("seg_cnt").alias("c"))
    assert all(r["c"] == n for r in agg.collect())
    r1m = rollup_from_dim_group_segments(gseg, members, MINUTE_MS)
    assert r1m.count() == 8 * n
    assert r1m.where("vmin != 5.0 OR vmax != 5.0 OR cnt != 1").count() == 0
