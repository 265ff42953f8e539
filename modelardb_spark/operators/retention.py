"""Retention / downsampling policy over the tiered tables.

North-rule capability: cold tiers are downsampled — the freshest data
keeps full segments (exact reconstruction), warm data keeps only the
1m/1h rollups, cold data keeps only the 1d rollup. The reference has
no retention machinery at all (storage only grows); this is the
TimescaleDB-style continuous-aggregate policy re-expressed over the
partition layout: age-based partition drops (Iceberg `DELETE WHERE
days(start_ts) < cutoff`; partition-directory drops in the sandbox
catalog).

`tiered_points` is the query-side view: for any window size, answer
from the finest tier still retained for that age — the engine's
equivalent of TimescaleDB real-time aggregates.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modelardb_spark.io.tables import DAY_MS, TableCatalog


@dataclass(frozen=True)
class RetentionPolicy:
    #: segments (exact reconstruction) kept for this many days
    hot_days: int = 7
    #: 1m and 1h rollups kept for this many days
    warm_days: int = 30
    #: 1d rollups kept forever (or until cold_days if set)
    cold_days: int | None = None


def retention_cutoffs(policy: RetentionPolicy, now_ms: int) -> dict[str, int]:
    """Partition-day cutoffs per table (days strictly below are dropped)."""
    today = now_ms // DAY_MS
    cut = {
        "segments": today - policy.hot_days,
        "rollup_1m": today - policy.warm_days,
        "rollup_1h": today - policy.warm_days,
    }
    if policy.cold_days is not None:
        cut["rollup_1d"] = today - policy.cold_days
    return cut


def apply_retention(
    catalog: TableCatalog, policy: RetentionPolicy, now_ms: int
) -> dict[str, int]:
    """Drop expired partition directories; returns table -> #dropped.
    Idempotent: re-running with the same `now_ms` drops nothing new."""
    dropped = {}
    for table, cutoff in retention_cutoffs(policy, now_ms).items():
        if not catalog.exists(table):
            continue
        expired = [
            d for d in catalog.list_partitions(table, "part_day") if int(d) < cutoff
        ]
        dropped[table] = catalog.drop_partitions(table, "part_day", expired)
    return dropped


def tiered_rollup_view(
    r1m: DataFrame,
    r1h: DataFrame,
    r1d: DataFrame,
    policy: RetentionPolicy,
    now_ms: int,
) -> DataFrame:
    """In-memory variant of `tiered_rollup` over rollup FRAMES instead
    of catalog tables: each tier keeps only the windows the policy
    retains at `now_ms` (window day >= cutoff), labeled with a `tier`
    column. Used by the driver-checked `tiered_rollup` query with a
    fixed `now_ms` so the cutoffs are deterministic; the catalog
    version applies the same predicate to the stored `part_day`
    partition column (identical by construction: rollup tables
    partition on window_ms // DAY_MS)."""
    cut = retention_cutoffs(policy, now_ms)
    frames = []
    for table, df in (("rollup_1m", r1m), ("rollup_1h", r1h), ("rollup_1d", r1d)):
        df = df.withColumn("tier", F.lit(table))
        lo = cut.get(table)
        if lo is not None:
            df = df.where((F.col("window_ms") / DAY_MS).cast("long") >= lo)
        frames.append(
            df.select(
                "tier", "conv_id", "metric", "window_ms", "cnt", "vmin", "vmax", "vsum", "mean"
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def tiered_rollup(
    spark,
    catalog: TableCatalog,
    policy: RetentionPolicy,
    now_ms: int,
) -> DataFrame:
    """Union view across retention tiers with a `tier` column: each
    window is answered by the finest tier retained at its age. Used by
    tests to assert the per-tier match rate required by the north rule."""
    cut = retention_cutoffs(policy, now_ms)
    frames = []
    for table in ("rollup_1m", "rollup_1h", "rollup_1d"):
        if not catalog.exists(table):
            continue
        df = catalog.read(spark, table).withColumn("tier", F.lit(table))
        lo = cut.get(table)
        if lo is not None:
            df = df.where(F.col("part_day") >= lo)
        frames.append(
            df.select(
                "tier", "conv_id", "metric", "window_ms", "cnt", "vmin", "vmax", "vsum", "mean"
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
