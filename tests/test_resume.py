"""Resume/retention tests — SURVEY.md §5 item 7: kill after partial
completion; re-run must produce identical tables and skip done
partitions."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from modelardb_spark.config import EngineConfig
from modelardb_spark.io.checkpoints import CheckpointStore
from modelardb_spark.io.tables import DAY_MS, TableCatalog
from modelardb_spark.jobs.ingest import ingest
from modelardb_spark.operators.retention import (
    RetentionPolicy,
    apply_retention,
    tiered_rollup,
)
from modelardb_spark.operators.transcripts import synthetic_transcripts


@pytest.fixture(scope="module")
def transcripts(spark):
    t = synthetic_transcripts(
        spark, n_convs=8, turns_per_conv=300, mega_convs=1, mega_factor=4
    ).cache()
    t.count()
    return t


def _table_fingerprint(spark, root, name, fmt="parquet"):
    df = spark.read.format(fmt).load(os.path.join(root, name))
    cols = sorted(c for c in df.columns if c != "part_bucket")
    return (
        df.select(*cols)
        .withColumn("h", F.hash(*cols))
        .agg(F.sum("h"), F.count("*"))
        .first()
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_resume_after_injected_failure(spark, transcripts, tmp_path, fmt):
    """Parameterized over the reference's two columnar backends
    (ParquetStorage / ORCStorage): the resume contract is
    format-independent."""
    clean_root = str(tmp_path / "clean")
    crash_root = str(tmp_path / "crash")
    cfg = EngineConfig()

    m = ingest(spark, transcripts, clean_root, cfg, snapshot_id="s1",
               chunk_days=2, fmt=fmt)
    assert m["days_skipped"] == 0

    with pytest.raises(RuntimeError, match="injected failure"):
        ingest(
            spark, transcripts, crash_root, cfg, snapshot_id="s1",
            chunk_days=2, fail_after_chunks=2, fmt=fmt,
        )
    # resume: done days are skipped, output identical to the clean run
    m2 = ingest(spark, transcripts, crash_root, cfg, snapshot_id="s1",
                chunk_days=2, fmt=fmt)
    assert m2["days_skipped"] == 4  # 2 chunks x 2 days completed pre-crash

    for name in ("segments", "rollup_1m", "rollup_1h", "rollup_1d"):
        assert _table_fingerprint(spark, clean_root, name, fmt) == \
            _table_fingerprint(spark, crash_root, name, fmt), name

    # idempotent third run: everything skipped
    m3 = ingest(spark, transcripts, crash_root, cfg, snapshot_id="s1",
                chunk_days=2, fmt=fmt)
    assert m3["days_skipped"] == m3["days_total"]

    # metrics/lineage rows exist per partition
    ck = CheckpointStore(crash_root)
    rows = ck.metrics("segments")
    assert len(rows) == m3["days_total"]
    assert all(r["status"] == "done" and r["input_snapshot_id"] == "s1" for r in rows)
    assert all(r["rows_out"] > 0 for r in rows)


def test_staged_input_prunes_partitions(spark, transcripts, tmp_path):
    """Chunk reads must hit only the chunk's staged partition dirs —
    O(1) passes over the input, not O(#chunks) full rescans."""
    root = str(tmp_path / "staged")
    ingest(spark, transcripts, root, EngineConfig(), snapshot_id="s1", chunk_days=2)
    catalog = TableCatalog(root)
    days = [int(d) for d in catalog.list_partitions("staged_transcripts", "part_day")]
    assert len(days) > 2
    staged = catalog.read(spark, "staged_transcripts")
    one = staged.where(F.col("part_day") == days[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition-column filter shows up as a PartitionFilter (directory
    # pruning), not a post-scan data filter; the pruned scan reads only
    # this day's files
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "part_day" in pf and f"= {days[0]}" in pf


def test_ingest_rejects_multi_day_salt(spark, transcripts, tmp_path):
    """salt_days != 1 breaks the per-day resume unit — must refuse."""
    with pytest.raises(ValueError, match="salt_days"):
        ingest(
            spark, transcripts, str(tmp_path / "bad"),
            EngineConfig(salt_days=2), snapshot_id="s1",
        )


def test_new_snapshot_recomputes(spark, transcripts, tmp_path):
    root = str(tmp_path / "snap")
    ingest(spark, transcripts, root, EngineConfig(), snapshot_id="a", chunk_days=64)
    m = ingest(spark, transcripts, root, EngineConfig(), snapshot_id="b", chunk_days=64)
    assert m["days_skipped"] == 0  # lineage changed -> full recompute


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_retention_drops_cold_tiers(spark, transcripts, tmp_path, fmt):
    root = str(tmp_path / "ret")
    ingest(spark, transcripts, root, EngineConfig(), snapshot_id="s",
           chunk_days=64, fmt=fmt)
    catalog = TableCatalog(root, fmt)
    days = sorted(int(d) for d in catalog.list_partitions("segments", "part_day"))
    assert days
    # "now" such that the oldest day is beyond hot retention but within warm
    now_ms = (days[0] + 10) * DAY_MS
    policy = RetentionPolicy(hot_days=3, warm_days=1000)
    dropped = apply_retention(catalog, policy, now_ms)
    assert dropped["segments"] >= 1
    assert dropped.get("rollup_1m", 0) == 0
    remaining = [int(d) for d in catalog.list_partitions("segments", "part_day")]
    assert all(d >= days[0] + 10 - 3 for d in remaining)
    # rollups still answer for the dropped range (downsampled tier)
    tiers = tiered_rollup(spark, catalog, policy, now_ms)
    old_windows = tiers.where(
        (F.col("window_ms") < (days[0] + 1) * DAY_MS) & (F.col("tier") == "rollup_1d")
    )
    assert old_windows.count() > 0
    # idempotent
    assert apply_retention(catalog, policy, now_ms)["segments"] == 0


def test_ingest_writes_metadata_tables(spark, transcripts, tmp_path):
    """The reference storage schema's time_series and model_type
    metadata tables (JDBCStorage.scala:47-52) exist after ingest."""
    root = str(tmp_path / "meta")
    ingest(spark, transcripts, root, EngineConfig(), snapshot_id="s1")
    catalog = TableCatalog(root)
    ts = catalog.read(spark, "time_series")
    assert set(ts.columns) == {"tid", "conv_id", "metric", "scaling_factor"}
    n_convs = transcripts.select("conv_id").distinct().count()
    assert ts.count() == n_convs * 2  # two metrics per conversation
    assert ts.where("scaling_factor != 1.0").count() == 0
    assert ts.select("tid").distinct().count() == ts.count()
    mt = {r["mtid"]: r["name"] for r in catalog.read(spark, "model_type").collect()}
    assert mt[1].endswith("uncompressed") and mt[4].endswith("gorilla")


def test_grouped_ingest_same_rollups(spark, transcripts, tmp_path):
    """grouped=True writes GROUP segments: identical rollup tables at
    bound 0 (the compression trade-off is workload-dependent and
    measured in tests/test_groupfit.py)."""
    import glob

    a = str(tmp_path / "flat")
    b = str(tmp_path / "grp")
    ingest(spark, transcripts, a, EngineConfig(), snapshot_id="s")
    ingest(spark, transcripts, b, EngineConfig(), snapshot_id="s", grouped=True)
    for name in ("rollup_1m", "rollup_1h", "rollup_1d"):
        assert _table_fingerprint(spark, a, name) == _table_fingerprint(
            spark, b, name
        ), name

    # group rows carry the whole conversation's metrics (schema check);
    # which path stores FEWER bytes is data-dependent — long constant
    # runs favor per-series PMC, short mixed runs favor group metadata
    # sharing (the 1.88x win on the events workload is asserted in
    # tests/test_groupfit.py; the router in groupfit.py is the knob)
    seg_b = TableCatalog(b).read(spark, "segments")
    assert "tids" in seg_b.columns and "gaps" in seg_b.columns
    assert seg_b.where(F.col("group_size") == 2).count() > 0
