"""Transcripts input: the engine's primary table (BASELINE.json
input_hint): (conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp).

Two deterministic sources:
- `transcripts_from_events`: derives a transcripts-shaped table from
  the driver's synthetic `events` table (conv_id = user_id, turn order
  by (ts, event_id)); used for the DuckDB-checked correctness queries.
- `synthetic_transcripts`: a fully distributed, seed-deterministic
  generator built from `spark.range` + column arithmetic (no Python in
  the loop, no driver-side data), with a mixture of conversation
  shapes — constant-rate (PMC-friendly), ramping (Swing-friendly),
  noisy (Gorilla/raw), gappy, and a few mega-conversations for the
  skew/salting path. Used by tests and the benchmark at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic transcripts view over the events table.

    The matching ANSI-SQL definition lives in __spark_entry__.oracle_sql
    ('transcripts'); keep the two in sync.
    """
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - F.lit(1)).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.when(
            F.col("event_type").isin("click", "purchase"), F.col("event_type")
        ).alias("tool"),
        F.col("ts"),
    )


def synthetic_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    turns_per_conv: int = 1000,
    mega_convs: int = 2,
    mega_factor: int = 50,
    start_ms: int = 1_700_000_000_000,
    seed: int = 42,
) -> DataFrame:
    """Seeded synthetic transcripts at arbitrary scale, generated
    distributedly (spark.range -> column expressions only).

    Conversation shapes by conv_id % 5:
      0: constant rate (1 turn/min)            -> PMC segments
      1: ramping rate (k turns in minute k%32) -> Swing-ish / varied
      2: noisy rate (hash-based 0-7 turns/min) -> Gorilla/raw segments
      3: gappy (3h idle gap every 64 minutes)
      4: bursty short conversations
    conv_id < `mega_convs` get `mega_factor`x the turns (skew case).
    """
    total = n_convs * turns_per_conv + mega_convs * turns_per_conv * mega_factor
    df = spark.range(total).withColumn(
        "conv_num",
        F.when(
            F.col("id") < mega_convs * turns_per_conv * mega_factor,
            F.col("id") % mega_convs,
        ).otherwise(
            mega_convs
            + (F.col("id") - mega_convs * turns_per_conv * mega_factor)
            % n_convs
        ),
    )
    # deterministic pseudo-random stream per row
    h = F.abs(F.xxhash64(F.col("id"), F.lit(seed)))
    shape = F.col("conv_num") % 5
    # turn index by arithmetic (row-number-free: no shuffle in datagen)
    df = df.withColumn(
        "turn_idx",
        F.when(
            F.col("id") < mega_convs * turns_per_conv * mega_factor,
            (F.col("id") / mega_convs).cast("long"),
        )
        .otherwise(
            (
                (F.col("id") - mega_convs * turns_per_conv * mega_factor)
                / n_convs
            ).cast("long")
        )
        .cast("int"),
    )

    # every shape is a monotone non-decreasing integer function of
    # turn_idx, so ts is non-decreasing within a conversation (input
    # contract). h-based jitter keeps monotonicity: step 45000 + delta
    # with |delta| < 30000 is always positive.
    t = F.col("turn_idx").cast("long")
    minute = t  # constant 1 turn/min -> PMC segments
    ramp_minute = F.floor((F.sqrt(8 * t + 1) - 1) / 2)  # k turns in minute k-1
    noisy_ms = t * 45_000 + (h % 30_000)  # noisy 0-3 turns/min
    gappy_minute = t + (t / 64).cast("long") * 180  # 3h idle gap per 64 turns
    bursty_minute = (t / 20).cast("long") + (t / 100).cast("long") * 720

    offset_ms = (
        F.when(shape == 0, minute * 60_000)
        .when(shape == 1, ramp_minute * 60_000)
        .when(shape == 2, (noisy_ms / 60_000).cast("long") * 60_000)
        .when(shape == 3, gappy_minute * 60_000)
        .otherwise(bursty_minute * 60_000)
    )
    ts_ms = (
        F.lit(start_ms)
        + F.col("conv_num") * F.lit(86_400_000)  # stagger conversations by a day
        + offset_ms
    )
    roles = F.when(h % 3 == 0, "user").when(h % 3 == 1, "assistant").otherwise("tool")
    return df.select(
        F.concat(F.lit("conv-"), F.col("conv_num").cast("string")).alias("conv_id"),
        F.col("turn_idx"),
        roles.alias("role"),
        F.concat(F.lit("turn text "), F.col("id").cast("string")).alias("text"),
        F.when(h % 4 == 0, F.concat(F.lit("tool_"), (h % 7).cast("string"))).alias(
            "tool"
        ),
        F.timestamp_millis(ts_ms).alias("ts"),
    )
