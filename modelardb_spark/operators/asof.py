"""AS-OF join: each left row picks the most recent right row at or
before its timestamp, per key — the kdb `aj` / TimescaleDB / DuckDB
`ASOF JOIN` operator, a time-series primitive Spark lacks natively.

For this engine it answers "what was the latest state when this turn
happened" — e.g. join every turn to the conversation's most recent
finalized segment, config change, or purchase event.

Execution shape (scale-first): the classic union-tag formulation —
tag right rows 0 and left rows 1, union, ONE window sort per key
ordered by (timestamp, tag), and `last(value, ignorenulls=True)`
carries the right values forward onto the left rows. One shuffle, one
sort, no join explosion, no per-key loop; Catalyst plans a single
WindowExec after a single exchange. Ties at equal timestamps: tag
order makes the join INCLUSIVE (a right row at exactly t matches a
left row at t); `strict=True` flips the tag order for the exclusive
(<) variant.

Skew note: a key's full history sorts in one task. Per-conversation
histories are bounded in this data model (the fit path salts by day
for the same reason); for unbounded keys the production pattern is a
two-pass day-bucketed carry-forward (per-day last + cumulative
boundary), which this module intentionally leaves to the caller — the
single-window form is exact and is what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_ms: int | None = None,
    strict: bool = False,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join. Every left row and column survives; for each
    `value_cols` entry a `<col><suffix>` column carries the most
    recent prior right value (NULL when no right row qualifies), plus
    `<right_ts><suffix>` with the matched right timestamp.
    `tolerance_ms` voids matches older than the bound (kdb `aj` with a
    window); `strict=True` requires right_ts strictly before left_ts.
    """
    for c in value_cols + [right_ts]:
        if f"{c}{suffix}" in left.columns:
            raise ValueError(f"left already has column {c}{suffix}")
    carried = [right_ts] + [c for c in value_cols if c != right_ts]
    # right rows sort before equal-timestamp left rows for inclusive
    # semantics; after them for strict
    r_tag, l_tag = (0, 1) if not strict else (1, 0)
    r = right.select(
        *on,
        F.col(right_ts).cast("long").alias("_asof_t"),
        *[F.col(c).alias(f"{c}{suffix}") for c in carried],
    ).withColumn("_asof_tag", F.lit(r_tag))
    l = left.withColumn("_asof_t", F.col(left_ts).cast("long")).withColumn(
        "_asof_tag", F.lit(l_tag)
    )
    lcols = [c for c in l.columns if c not in ("_asof_t", "_asof_tag")]
    u = l.unionByName(
        r.select(
            *[
                F.lit(None).cast(l.schema[c].dataType).alias(c)
                if c not in on
                else F.col(c)
                for c in lcols
            ],
            "_asof_t",
            "_asof_tag",
            *[f"{c}{suffix}" for c in carried],
        ),
        allowMissingColumns=True,
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("_asof_t", "_asof_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in carried:
        u = u.withColumn(
            f"{c}{suffix}", F.last(f"{c}{suffix}", ignorenulls=True).over(w)
        )
    out = u.where(F.col("_asof_tag") == l_tag).drop("_asof_tag")
    if tolerance_ms is not None:
        stale = F.col("_asof_t") - F.col(f"{right_ts}{suffix}") > tolerance_ms
        for c in carried:
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(stale, F.lit(None)).otherwise(F.col(f"{c}{suffix}")),
            )
    return out.drop("_asof_t")
