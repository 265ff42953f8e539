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


def stream_transcripts_socket(
    spark: SparkSession,
    host: str,
    port: int,
    sep: str = ",",
    ts_format: str | None = None,
) -> DataFrame:
    """Streaming transcript source over a TCP socket — the reference's
    AsyncTimeSeriesSocket (core/timeseries/AsyncTimeSeriesSocket.java:
    line-delimited text, configurable split string, timestamp column
    parsed as unix / java millis / a date format) re-expressed as
    Spark's socket stream source + JVM-side column parsing.

    Lines are `conv_id<sep>turn_idx<sep>role<sep>text<sep>tool<sep>ts`;
    `ts` is epoch-millis when ts_format is None (the reference's
    "java" date parser), else parsed with the given pattern. Returns an
    unbounded streaming DataFrame in TRANSCRIPT_SCHEMA shape, ready for
    the same foreachBatch ingest as the file-drop stream."""
    import re

    lines = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    # F.split takes a Java regex: escape the separator so '|', '.'
    # etc. split on the literal character, not the regex meaning
    parts = F.split(F.col("value"), re.escape(sep))
    ts_raw = parts.getItem(5)
    ts = (
        F.timestamp_millis(ts_raw.cast("long"))
        if ts_format is None
        else F.to_timestamp(ts_raw, ts_format)
    )
    return lines.select(
        parts.getItem(0).alias("conv_id"),
        parts.getItem(1).cast("int").alias("turn_idx"),
        parts.getItem(2).alias("role"),
        parts.getItem(3).alias("text"),
        F.when(parts.getItem(4) == "", None)
        .otherwise(parts.getItem(4))
        .alias("tool"),
        ts.cast("timestamp").alias("ts"),
    )


def register_external_table(
    spark: SparkSession, name: str, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Register any Spark-readable source as a temp view for joins —
    the reference's external-table hook (Spark.scala:147-151), which is
    already a one-liner on Spark."""
    df = spark.read.format(fmt).load(path)
    df.createOrReplaceTempView(name)
    return df
