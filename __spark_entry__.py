"""Driver contract for the spark-graft builder (PySpark target).

Each `queries()` entry runs the engine on a transcripts table derived
deterministically from the driver's `events` parquet (conv_id =
user_id, turn order by (ts, event_id)); the matching `oracle_sql()`
computes the same result in ANSI SQL on DuckDB. The headline checks are
the rollup tiers: the Spark side goes through the FULL engine —
derive series -> fit (PMC/Swing/Gorilla/raw cascade in applyInPandas)
-> segments -> closed-form rollup — while the oracle is a plain SQL
GROUP BY over the raw points; at error bound 0 the two must be
identical, which validates the whole compression/reconstruction path.

All timestamps are exposed as epoch-millis BIGINTs and floats widened
to DOUBLE so value hashes are engine-independent.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modelardb_spark.config import EngineConfig
from modelardb_spark.operators.fit import fit_segments
from modelardb_spark.operators.grid import grid
from modelardb_spark.operators.rollup import (
    DAY_MS,
    HOUR_MS,
    MINUTE_MS,
    rollup_cascade,
    rollup_from_segments,
    segment_aggregates,
)
from modelardb_spark.operators.series import derive_series, gap_fill
from modelardb_spark.operators.transcripts import transcripts_from_events

CFG = EngineConfig(error_bound=0.0)

# ---------------------------------------------------------------------------
# Shared SQL building blocks for the DuckDB oracle (must stay in sync with
# operators/transcripts.py::transcripts_from_events and
# operators/series.py::derive_series)
# ---------------------------------------------------------------------------

_SQL_TRANSCRIPTS = """
transcripts AS (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
              AS INTEGER) AS turn_idx,
         event_type AS role,
         props AS text,
         CASE WHEN event_type IN ('click', 'purchase') THEN event_type END AS tool,
         ts
  FROM events
)
"""

_SQL_SERIES = (
    _SQL_TRANSCRIPTS
    + """,
binned AS (
  SELECT conv_id,
         (epoch_ms(ts) // 60000) * 60000 AS bin_ms,
         COUNT(*) AS turn_rate,
         COUNT(tool) AS tool_usage
  FROM transcripts
  GROUP BY 1, 2
),
series AS (
  SELECT conv_id, 'turn_rate' AS metric, bin_ms, CAST(turn_rate AS FLOAT) AS value
  FROM binned
  UNION ALL
  SELECT conv_id, 'tool_usage' AS metric, bin_ms, CAST(tool_usage AS FLOAT) AS value
  FROM binned
)
"""
)


def _sql_raw_rollup(window_ms: int) -> str:
    return (
        "WITH "
        + _SQL_SERIES
        + f"""
SELECT conv_id,
       metric,
       (bin_ms // {window_ms}) * {window_ms} AS window_ms,
       COUNT(*) AS cnt,
       CAST(MIN(value) AS DOUBLE) AS vmin,
       CAST(MAX(value) AS DOUBLE) AS vmax,
       SUM(CAST(value AS DOUBLE)) AS vsum,
       SUM(CAST(value AS DOUBLE)) / COUNT(*) AS mean
FROM series
GROUP BY 1, 2, 3
"""
    )


# ---------------------------------------------------------------------------
# Spark-side helpers
# ---------------------------------------------------------------------------


def _series(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive_series(transcripts_from_events(spark, sf_dir), CFG)


def _segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fit_segments(_series(spark, sf_dir), CFG)


def _std_rollup(df: DataFrame) -> DataFrame:
    """Normalize a rollup result for hashing: floats -> double."""
    return df.select(
        "conv_id",
        "metric",
        F.col("window_ms").cast("long").alias("window_ms"),
        F.col("cnt").cast("long").alias("cnt"),
        F.col("vmin").cast("double").alias("vmin"),
        F.col("vmax").cast("double").alias("vmax"),
        F.col("vsum").cast("double").alias("vsum"),
        F.col("mean").cast("double").alias("mean"),
    )


def _q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_from_events(spark, sf_dir)
    return t.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    )


def _q_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _series(spark, sf_dir)


def _q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gap_fill(_series(spark, sf_dir), CFG, max_fill_bins=5)


def _q_rollup_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _std_rollup(rollup_from_segments(_segments(spark, sf_dir), MINUTE_MS))


def _q_rollup_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _std_rollup(rollup_from_segments(_segments(spark, sf_dir), HOUR_MS))


def _q_rollup_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exercises the cascading maintenance path (1h tier -> 1d tier)
    r1h = rollup_from_segments(_segments(spark, sf_dir), HOUR_MS)
    return _std_rollup(rollup_cascade(r1h, DAY_MS))


def _q_data_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    # full compression round trip: series -> segments -> grid
    return grid(_segments(spark, sf_dir)).select(
        "conv_id", "metric", "bin_ms", "value"
    )


def _q_segment_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = segment_aggregates(_segments(spark, sf_dir))
    return agg.select(
        "conv_id",
        "metric",
        F.col("cnt").cast("long").alias("cnt"),
        F.col("vmin").cast("double").alias("vmin"),
        F.col("vmax").cast("double").alias("vmax"),
        F.col("vsum").cast("double").alias("vsum"),
        F.col("mean").cast("double").alias("mean"),
    )


def _q_busiest_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain Spark SQL over the engine's rollup view — the reference
    delegates all joins/sorts/limits to the host engine (SURVEY.md
    §2.5); this query demonstrates the same delegation here."""
    rollup_from_segments(_segments(spark, sf_dir), HOUR_MS).createOrReplaceTempView(
        "rollup_1h_v"
    )
    return spark.sql(
        """
        SELECT window_ms, CAST(SUM(vsum) AS BIGINT) AS turns,
               COUNT(DISTINCT conv_id) AS convs
        FROM rollup_1h_v
        WHERE metric = 'turn_rate'
        GROUP BY window_ms
        ORDER BY turns DESC, window_ms
        LIMIT 20
        """
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full pipeline to the
    1h rollup tier."""
    return _q_rollup_1h(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts": _q_transcripts,
        "series_points": _q_series,
        "gap_fill": _q_gap_fill,
        "rollup_1m": _q_rollup_1m,
        "rollup_1h": _q_rollup_1h,
        "rollup_1d": _q_rollup_1d,
        "data_points_grid": _q_data_points,
        "segment_aggregates": _q_segment_aggregates,
        "busiest_hours": _q_busiest_hours,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "transcripts": (
            "WITH "
            + _SQL_TRANSCRIPTS
            + "SELECT conv_id, turn_idx, role, text, tool, epoch_ms(ts) AS ts_ms"
            " FROM transcripts"
        ),
        "series_points": (
            "WITH " + _SQL_SERIES + "SELECT conv_id, metric, bin_ms, value FROM series"
        ),
        "gap_fill": (
            "WITH "
            + _SQL_SERIES
            + """,
nxt AS (
  SELECT conv_id, metric, bin_ms, value,
         LEAD(bin_ms) OVER (PARTITION BY conv_id, metric ORDER BY bin_ms) AS next_ms
  FROM series
)
SELECT conv_id, metric, bin_ms, value FROM series
UNION ALL
SELECT n.conv_id, n.metric, g.bin_ms, CAST(0.0 AS FLOAT) AS value
FROM nxt n, LATERAL (
  SELECT UNNEST(generate_series(n.bin_ms + 60000, n.next_ms - 60000, 60000)) AS bin_ms
) g
WHERE n.next_ms IS NOT NULL
  AND n.next_ms - n.bin_ms > 60000
  AND n.next_ms - n.bin_ms <= 6 * 60000
"""
        ),
        "rollup_1m": _sql_raw_rollup(MINUTE_MS),
        "rollup_1h": _sql_raw_rollup(HOUR_MS),
        "rollup_1d": _sql_raw_rollup(DAY_MS),
        "data_points_grid": (
            "WITH " + _SQL_SERIES + "SELECT conv_id, metric, bin_ms, value FROM series"
        ),
        "segment_aggregates": (
            "WITH "
            + _SQL_SERIES
            + """
SELECT conv_id, metric,
       COUNT(*) AS cnt,
       CAST(MIN(value) AS DOUBLE) AS vmin,
       CAST(MAX(value) AS DOUBLE) AS vmax,
       SUM(CAST(value AS DOUBLE)) AS vsum,
       SUM(CAST(value AS DOUBLE)) / COUNT(*) AS mean
FROM series
GROUP BY 1, 2
"""
        ),
        "busiest_hours": (
            "WITH "
            + _SQL_SERIES
            + """
SELECT (bin_ms // 3600000) * 3600000 AS window_ms,
       CAST(SUM(CAST(value AS BIGINT)) AS BIGINT) AS turns,
       COUNT(DISTINCT conv_id) AS convs
FROM series
WHERE metric = 'turn_rate'
GROUP BY 1
ORDER BY turns DESC, window_ms
LIMIT 20
"""
        ),
    }
