"""File sources for transcripts.

Spark-first replacements for the reference's hand-rolled readers
(core/timeseries/TimeSeriesCSV.java:34-200, TimeSeriesParquet.java,
TimeSeriesORC.java): `spark.read` with an explicit schema plus the same
user-facing knobs — separator, header, timestamp column/format, value
scaling — expressed as options and column expressions instead of ~450
lines of iterator code. Glob/directory expansion (Main.scala:163-185)
is native to Spark paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)


def _finalize(df: DataFrame, ts_format: str | None) -> DataFrame:
    ts = F.col("ts")
    if ts_format is not None:
        ts = F.to_timestamp(F.col("ts").cast("string"), ts_format)
    return df.select(
        F.col("conv_id").cast("string").alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.col("role").cast("string").alias("role"),
        F.col("text").cast("string").alias("text"),
        F.col("tool").cast("string").alias("tool"),
        ts.cast("timestamp").alias("ts"),
    )


def read_transcripts_csv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    header: bool = True,
    ts_format: str | None = None,
) -> DataFrame:
    """CSV/gzip transcripts (reference: TimeSeriesCSV options —
    separator, header, timestamp format; gzip is transparent to Spark)."""
    df = (
        spark.read.option("sep", sep)
        .option("header", str(header).lower())
        .schema(
            TRANSCRIPT_SCHEMA
            if ts_format is None
            else StructType(
                [
                    f if f.name != "ts" else StructField("ts", StringType(), False)
                    for f in TRANSCRIPT_SCHEMA.fields
                ]
            )
        )
        .csv(path)
    )
    return _finalize(df, ts_format)


def read_transcripts_parquet(spark: SparkSession, path: str) -> DataFrame:
    return _finalize(spark.read.parquet(path), None)


def read_transcripts_orc(spark: SparkSession, path: str) -> DataFrame:
    return _finalize(spark.read.orc(path), None)


def register_external_table(
    spark: SparkSession, name: str, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Register any Spark-readable source as a temp view for joins —
    the reference's external-table hook (Spark.scala:147-151), which is
    already a one-liner on Spark."""
    df = spark.read.format(fmt).load(path)
    df.createOrReplaceTempView(name)
    return df
