"""Resumable ingest pipeline: transcripts -> segments -> rollup tiers.

Run via spark-submit (north rule):

    spark-submit --py-files modelardb_spark.zip -m modelardb_spark.jobs.ingest \
        --events /root/testdata/sf0.1/events.parquet --out /tmp/mdb

Resume design: the unit of work is the UTC day (= the segment salt, so
segments and all rollup windows are self-contained per day). Days are
processed in chunks; each completed chunk dynamically overwrites
exactly its partition directories and records one checkpoint row per
day with lineage (input snapshot id) and metrics (rows in/out, wall
ms). A killed job re-runs only days without a `done` checkpoint for
the same snapshot, and because writes are per-partition overwrites the
final tables are identical to a single uninterrupted run (test:
tests/test_resume.py).
"""

from __future__ import annotations

import argparse
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modelardb_spark.config import EngineConfig
from modelardb_spark.io.checkpoints import CheckpointStore
from modelardb_spark.io.tables import DAY_MS, TableCatalog, with_part_key
from modelardb_spark.operators.fit import fit_segments_wide
from modelardb_spark.operators.rollup import (
    HOUR_MS,
    MINUTE_MS,
    rollup_cascade,
    rollup_from_segments,
)
from modelardb_spark.operators.series import derive_series_wide


def _day_of_ts(col):
    return (F.unix_millis(F.col(col).cast("timestamp")) / DAY_MS).cast("long")


def ingest(
    spark: SparkSession,
    transcripts: DataFrame,
    out_root: str,
    cfg: EngineConfig = EngineConfig(),
    snapshot_id: str = "snap-0",
    chunk_days: int = 64,
    fail_after_chunks: int | None = None,
    grouped: bool = False,
    dynamic_split_fraction: float | None = None,
    fmt: str = "parquet",
    catalog_kind: str = "dir",
) -> dict:
    """Run the pipeline; returns metrics. `fail_after_chunks` injects a
    crash after N chunks (resume tests only). `grouped=True` compresses
    each conversation's metrics as ONE group (groupfit.py; ~1.9x fewer
    stored bytes, identical rollups at bound 0);
    `dynamic_split_fraction` additionally enables the reference's
    ratio-feedback dynamic split/join inside the group fit."""
    # The resume unit (UTC day) is only self-contained because segments
    # and rollup windows never span a day when the fit salt is one day;
    # a different salt_days would make per-day overwrite-on-resume drop
    # boundary contributions, so refuse to run rather than corrupt.
    if cfg.salt_days != 1:
        raise ValueError(
            "ingest(): resume unit is the UTC day and requires "
            f"cfg.salt_days == 1 (got {cfg.salt_days})"
        )
    # fmt: "parquet" or "orc" — the reference's two columnar segment
    # backends (storage/ParquetStorage.scala, storage/ORCStorage.scala).
    # catalog_kind: "dir" = partition-directory layout, "snapshot" =
    # ACID manifest commits (io/snapshots.py — the FileStorage WAL story)
    from modelardb_spark.io.snapshots import make_catalog

    catalog = make_catalog(out_root, fmt, catalog_kind)
    ckpt = CheckpointStore(out_root)

    # Stage the input day-partitioned ONCE per snapshot so that each
    # chunk's read prunes to exactly its partition directories instead
    # of rescanning the full input per chunk (O(1) passes over the
    # input instead of O(#chunks)). Resumed runs reuse the staging.
    staged_name = "staged_transcripts"
    staged_manifest = catalog.read_manifest(staged_name)
    if staged_manifest is None or staged_manifest.get("snapshot_id") != snapshot_id:
        catalog.overwrite(
            transcripts.withColumn("part_day", _day_of_ts("ts")),
            staged_name,
            ["part_day"],
        )
        catalog.write_manifest(staged_name, {"snapshot_id": snapshot_id})
    staged = catalog.read(spark, staged_name)

    # day inventory from the partition directory listing — no data scan
    days = [int(v) for v in catalog.list_partitions(staged_name, "part_day")]
    done = ckpt.done_partitions("segments", snapshot_id)
    todo = sorted(d for d in days if str(d) not in done)
    metrics = {"days_total": len(days), "days_skipped": len(days) - len(todo)}

    chunks = [todo[i : i + chunk_days] for i in range(0, len(todo), chunk_days)]
    rows_out_total = 0
    for ci, chunk in enumerate(chunks):
        if fail_after_chunks is not None and ci >= fail_after_chunks:
            raise RuntimeError("injected failure for resume test")
        t0 = time.time()
        # partition-column filter -> directory pruning: only this
        # chunk's files are listed and read
        part = staged.where(
            F.col("part_day").isin([int(d) for d in chunk])
        ).drop("part_day")
        if grouped:
            from modelardb_spark.operators.groupfit import fit_segments_grouped

            segments = with_part_key(
                fit_segments_grouped(
                    derive_series_wide(part, cfg),
                    cfg,
                    dynamic_split_fraction=dynamic_split_fraction,
                ),
                cfg.conv_buckets,
            )
        else:
            # fused derive+fit: one shuffle of minimal turn rows per
            # chunk instead of a derive exchange plus a fit exchange
            from modelardb_spark.operators.fit import fit_segments_from_transcripts

            segments = with_part_key(
                fit_segments_from_transcripts(part, cfg), cfg.conv_buckets
            )
        segments = segments.persist()
        seg_rows = segments.count()
        # sort within files so parquet row-group min/max stats prune by
        # model type, conversation, and time (Iceberg analogue:
        # write-ordered-by)
        catalog.overwrite_partitions(
            segments.sortWithinPartitions("mtid", "conv_id", "start_ms"),
            "segments",
            ["part_day"],
        )

        # 1m tier is map-only (window == bin) and written straight out;
        # 1h comes from the compressed segments (small shuffle);
        # 1d cascades from 1h — point-sized data is never re-shuffled
        if grouped:
            from modelardb_spark.operators.groupfit import (
                rollup_from_group_segments,
            )

            def _tier(window_ms):
                return rollup_from_group_segments(segments, window_ms)
        else:
            def _tier(window_ms):
                return rollup_from_segments(segments, window_ms)
        r1m = _tier(MINUTE_MS).withColumn(
            "part_day", (F.col("window_ms") / DAY_MS).cast("long")
        )
        catalog.overwrite_partitions(r1m, "rollup_1m", ["part_day"])
        r1h = _tier(HOUR_MS).withColumn(
            "part_day", (F.col("window_ms") / DAY_MS).cast("long")
        ).persist()
        catalog.overwrite_partitions(r1h, "rollup_1h", ["part_day"])
        r1d = rollup_cascade(r1h, DAY_MS).withColumn(
            "part_day", (F.col("window_ms") / DAY_MS).cast("long")
        )
        catalog.overwrite_partitions(r1d, "rollup_1d", ["part_day"])

        wall_ms = int((time.time() - t0) * 1000)
        # "n" counts stored values on both the per-series and the
        # group segment schemas (group seg_cnt is a per-member array)
        per_day = segments.groupBy("part_day").agg(
            F.count("*").alias("segs"), F.sum("n").alias("points")
        )
        stats = {str(r["part_day"]): r for r in per_day.collect()}
        for d in chunk:
            r = stats.get(str(d))
            ckpt.record(
                "segments",
                partition_id=str(d),
                input_snapshot_id=snapshot_id,
                rows_in=int(r["points"]) if r else 0,
                rows_out=int(r["segs"]) if r else 0,
                wall_ms=wall_ms // max(1, len(chunk)),
            )
        rows_out_total += seg_rows
        segments.unpersist()
        r1h.unpersist()

    # metadata tables (reference storage schema: time_series with
    # per-series scaling + model_type, JDBCStorage.scala:47-52)
    from modelardb_spark.io.tables import model_type_table
    from modelardb_spark.operators.transform import time_series_metadata

    series_keys = (
        staged.select("conv_id")
        .distinct()
        .select(
            "conv_id",
            F.explode(F.array(*[F.lit(m) for m in cfg.metrics])).alias("metric"),
        )
    )
    # scaling={} -> factor 1.0 recorded for every series (the ingest
    # path applies no scaling; the table records what WAS applied)
    catalog.overwrite(time_series_metadata(series_keys, scaling={}), "time_series")
    catalog.overwrite(model_type_table(spark), "model_type")

    catalog.write_manifest(
        "segments",
        {
            "snapshot_id": snapshot_id,
            "error_bound": cfg.error_bound,
            "length_bound": cfg.length_bound,
            "interval_ms": cfg.interval_ms,
        },
    )
    metrics["segments_written"] = rows_out_total
    metrics["chunks"] = len(chunks)
    return metrics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", help="TOML config (modelardb_spark.config_file)"
                    " — [engine]+[ingest] drive the whole job; other flags"
                    " are ignored when set")
    ap.add_argument("--events", help="events parquet path")
    ap.add_argument("--out", help="output catalog root")
    ap.add_argument("--error-bound", type=float, default=0.0)
    ap.add_argument("--snapshot-id", default="snap-0")
    ap.add_argument("--grouped", action="store_true",
                    help="compress each conversation's metrics as one group")
    ap.add_argument("--dynamic-split-fraction", type=float, default=None,
                    help="with --grouped: ratio-feedback dynamic split/join "
                         "threshold (reference default 0.10)")
    ap.add_argument("--format", default="parquet", choices=["parquet", "orc"],
                    help="segment/rollup table format (ORCStorage parity)")
    ap.add_argument("--catalog", default="dir", choices=["dir", "snapshot", "jdbc", "cql"],
                    help="table layout: partition dirs or ACID snapshot "
                         "commits; jdbc/cql partition overwrites are "
                         "crash-healed by the checkpoint re-run — for "
                         "full commit atomicity use snapshot")
    args = ap.parse_args()

    from modelardb_spark.operators.transcripts import transcripts_from_events
    from modelardb_spark.session import get_spark

    spark = get_spark(app_name="modelardb-ingest")
    if args.config:
        from modelardb_spark.config_file import load_config, run_ingest

        print(run_ingest(spark, load_config(args.config)))
        spark.stop()
        return
    if not (args.events and args.out):
        ap.error("--events and --out are required without --config")
    sf_dir = args.events.rsplit("/", 1)[0]
    transcripts = transcripts_from_events(spark, sf_dir)
    cfg = EngineConfig(error_bound=args.error_bound)
    print(ingest(spark, transcripts, args.out, cfg,
                 snapshot_id=args.snapshot_id, grouped=args.grouped,
                 dynamic_split_fraction=args.dynamic_split_fraction,
                 fmt=args.format, catalog_kind=args.catalog))
    spark.stop()


if __name__ == "__main__":
    main()
