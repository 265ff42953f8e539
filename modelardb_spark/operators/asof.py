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

Skew note: a key's full history sorts in one task in `asof_join`.
Per-conversation histories are bounded in this data model (the fit
path salts by day for the same reason); for UNBOUNDED keys use
`asof_join_bucketed` — the two-pass bucketed carry-forward: per-(key,
bucket) windows (task size bounded by the bucket width) plus a tiny
per-(key, bucket) boundary frame carrying the last right value across
buckets. Same results, proven equivalent by test.
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
    # the matched right row travels as ONE struct: carrying each column
    # independently would resurrect an OLDER row's value wherever the
    # matched row holds a NULL (row semantics, like DuckDB/kdb ASOF)
    r = right.select(
        *on,
        F.col(right_ts).cast("long").alias("_asof_t"),
        F.struct(
            *[F.col(c).alias(f"{c}{suffix}") for c in carried]
        ).alias("_asof_row"),
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
            "_asof_row",
        ),
        allowMissingColumns=True,
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("_asof_t", "_asof_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_asof_row", F.last("_asof_row", ignorenulls=True).over(w))
    out = u.where(F.col("_asof_tag") == l_tag).drop("_asof_tag")
    for c in carried:
        out = out.withColumn(f"{c}{suffix}", F.col(f"_asof_row.{c}{suffix}"))
    out = out.drop("_asof_row")
    if tolerance_ms is not None:
        stale = F.col("_asof_t") - F.col(f"{right_ts}{suffix}") > tolerance_ms
        for c in carried:
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(stale, F.lit(None)).otherwise(F.col(f"{c}{suffix}")),
            )
    return out.drop("_asof_t")


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    bucket_ms: int = 86_400_000,
    tolerance_ms: int | None = None,
    strict: bool = False,
    suffix: str = "_asof",
) -> DataFrame:
    """`asof_join` for UNBOUNDED per-key histories: identical results,
    but no task ever sorts a key's full history. Two passes:

    1. in-bucket: the union-tag window runs partitioned by
       (keys..., bucket) — task size bounded by the bucket width;
    2. carry-in: right rows reduce to ONE boundary row per
       (key, bucket) (the bucket's last value); a per-key window over
       this tiny frame carries the latest boundary into each later
       left bucket, and rows unmatched in-bucket coalesce to it.

    The carry-in join keys on (keys..., bucket) — the same partitioning
    as pass 1, so it co-locates. Right-side ties on (key, ts) resolve
    arbitrarily in both forms (kdb aj semantics: last row wins)."""
    carried = [right_ts] + [c for c in value_cols if c != right_ts]
    bkt = lambda c: (F.col(c).cast("long") / bucket_ms).cast("long")  # noqa: E731

    # pass 1: exact as-of WITHIN each (key, bucket)
    lb = left.withColumn("_ab", bkt(left_ts))
    rb = right.withColumn("_ab", bkt(right_ts))
    inbucket = asof_join(
        lb, rb, on + ["_ab"], left_ts, right_ts, value_cols,
        strict=strict, suffix=suffix,
    )

    # pass 2: per-(key, bucket) boundary rows -> carry-in per left
    # bucket. The boundary is ONE struct per bucket (max_by on a struct
    # of all carried columns), so tied right rows cannot mix values
    # across columns, and the carry-forward moves whole rows.
    boundary = rb.groupBy(*on, "_ab").agg(
        F.max_by(
            F.struct(*[F.col(c).alias(f"_cin_{c}") for c in carried]),
            F.col(right_ts),
        ).alias("_cin_row")
    )
    # a bucket's boundary becomes visible from the NEXT bucket on
    # (in-bucket rows of the same bucket are pass 1's job)
    b_vis = boundary.select(
        *on, (F.col("_ab") + 1).alias("_ob"), "_cin_row"
    ).withColumn("_btag", F.lit(0))
    l_keys = lb.select(*on, F.col("_ab").alias("_ob")).distinct().withColumn(
        "_btag", F.lit(1)
    )
    u = l_keys.unionByName(b_vis, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("_ob", "_btag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_cin_row", F.last("_cin_row", ignorenulls=True).over(w))
    carry = u.where(F.col("_btag") == 1).select(
        *on, F.col("_ob").alias("_ab"), "_cin_row"
    )

    out = inbucket.join(carry, on + ["_ab"], "left")
    # row-level fallback: the in-bucket match wins iff it EXISTS
    # (matched right_ts non-null); per-column coalesce would otherwise
    # splice carry-in values into a matched row's NULL columns
    matched_in = F.col(f"{right_ts}{suffix}").isNotNull()
    for c in carried:
        if c == right_ts:
            continue  # keyed column last: it drives matched_in
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(matched_in, F.col(f"{c}{suffix}")).otherwise(
                F.col(f"_cin_row._cin_{c}")
            ),
        )
    out = out.withColumn(
        f"{right_ts}{suffix}",
        F.coalesce(
            F.col(f"{right_ts}{suffix}"), F.col(f"_cin_row._cin_{right_ts}")
        ),
    ).drop("_cin_row")
    if tolerance_ms is not None:
        stale = (
            F.col(left_ts).cast("long") - F.col(f"{right_ts}{suffix}")
            > tolerance_ms
        )
        for c in carried:
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(stale, F.lit(None)).otherwise(F.col(f"{c}{suffix}")),
            )
    return out.drop("_ab")
