"""Two-view SQL surface: ad-hoc Spark SQL over segments/data_points
must agree with the raw series."""

from __future__ import annotations

from pyspark.sql import functions as F

from modelardb_spark.operators.fit import fit_segments
from modelardb_spark.operators.series import derive_series
from modelardb_spark.operators.transcripts import synthetic_transcripts
from modelardb_spark.operators.views import register_views


def test_sql_over_views(spark):
    t = synthetic_transcripts(spark, n_convs=8, turns_per_conv=200, mega_convs=0)
    series = derive_series(t).cache()
    register_views(spark, fit_segments(series))

    # aggregate on the segment view without reconstruction
    seg_cnt = spark.sql(
        "SELECT SUM(seg_cnt) FROM segments WHERE metric = 'turn_rate'"
    ).first()[0]
    raw_cnt = series.where("metric = 'turn_rate'").count()
    assert seg_cnt == raw_cnt

    # arbitrary SQL over the point view (window fn + having)
    got = spark.sql(
        """
        SELECT conv_id, COUNT(*) AS bins, AVG(value) AS m
        FROM data_points WHERE metric = 'turn_rate'
        GROUP BY conv_id HAVING COUNT(*) > 10 ORDER BY conv_id
        """
    ).collect()
    want = (
        series.where("metric = 'turn_rate'")
        .groupBy("conv_id")
        .agg(F.count("*").alias("bins"), F.avg("value").alias("m"))
        .where("bins > 10")
        .orderBy("conv_id")
        .collect()
    )
    assert [(r["conv_id"], r["bins"]) for r in got] == [
        (r["conv_id"], r["bins"]) for r in want
    ]
    for g, w in zip(got, want):
        assert abs(g["m"] - w["m"]) < 1e-9

    # join the point view against an external dimension table
    dims = spark.createDataFrame(
        [(f"conv-{i}", "team-a" if i % 2 == 0 else "team-b") for i in range(8)],
        ["conv_id", "team"],
    )
    dims.createOrReplaceTempView("conv_dims")
    by_team = spark.sql(
        """
        SELECT d.team, SUM(p.value) AS turns
        FROM data_points p JOIN conv_dims d USING (conv_id)
        WHERE p.metric = 'turn_rate' GROUP BY d.team
        """
    ).collect()
    assert len(by_team) == 2
    assert sum(r["turns"] for r in by_team) == raw_series_total(series)
    series.unpersist()


def raw_series_total(series):
    return (
        series.where("metric = 'turn_rate'")
        .agg(F.sum(F.col("value").cast("double")))
        .first()[0]
    )
