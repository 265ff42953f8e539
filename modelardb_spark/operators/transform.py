"""Value transformations and derived series.

Reference analogues:
- per-series scaling factor applied at read time
  (core/utility/ValueFunction.java:19-23, applied in
  TimeSeriesCSV.java:194 / TimeSeriesParquet.java:71);
- user-defined derived series compiled from config strings at startup
  (CodeGenerator.scala:224-234, Main.scala:104-111), e.g.
  ``sin(toRadians(value))``.

Spark-first: both are plain column expressions (`F.expr`), evaluated
inside whole-stage codegen — the reference's runtime Scala-toolbox
compilation is replaced by Catalyst's own expression compiler. Derived
series are new (metric, value) rows unioned onto the series relation
before fitting, so they are compressed and rolled up exactly like base
metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scale_series(series: DataFrame, scaling_factor: float) -> DataFrame:
    """Uniform scaling factor (value * sf at read time, float32 like
    the reference)."""
    return series.withColumn(
        "value", (F.col("value") * F.lit(scaling_factor)).cast("float")
    )


def derive_value_series(
    series: DataFrame, derived: dict[str, tuple[str, str]]
) -> DataFrame:
    """Append derived series: ``derived[new_metric] = (base_metric,
    sql_expr_over_value)``. The expression sees the base value as
    `value` and must produce a float-compatible result.

    Example: ``{"turn_rate_log": ("turn_rate", "ln(value + 1)")}``
    """
    frames = [series]
    for new_metric, (base, expr) in sorted(derived.items()):
        frames.append(
            series.where(F.col("metric") == base).select(
                "conv_id",
                F.lit(new_metric).alias("metric"),
                "bin_ms",
                F.expr(expr).cast("float").alias("value"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
