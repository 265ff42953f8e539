"""JDBC segment catalog (io/jdbc.py) over embedded Derby — parity with
the reference's RDBMS backend (storage/JDBCStorage.scala:47-60): full
ingest crash/resume, cross-backend transfer, the secondary time index,
and partition-level delete/listing through SQL."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modelardb_spark.config import EngineConfig
from modelardb_spark.io.jdbc import JdbcCatalog
from modelardb_spark.io.tables import TableCatalog
from modelardb_spark.jobs.ingest import ingest
from modelardb_spark.operators.transcripts import transcripts_from_events


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def jdbc_root(spark, sf_small, tmp_path_factory):
    """One Derby database holding a full crash-resumed ingest."""
    root = str(tmp_path_factory.mktemp("derby") / "db")
    t = transcripts_from_events(spark, sf_small)
    with pytest.raises(RuntimeError, match="injected failure"):
        ingest(
            spark, t, root, EngineConfig(), chunk_days=8,
            fail_after_chunks=1, catalog_kind="jdbc",
        )
    m = ingest(spark, t, root, EngineConfig(), chunk_days=8, catalog_kind="jdbc")
    assert m["days_skipped"] >= 8
    return root


def test_jdbc_ingest_equals_dir_catalog(spark, sf_small, jdbc_root, tmp_path):
    ref_root = str(tmp_path / "ref")
    ingest(spark, transcripts_from_events(spark, sf_small), ref_root, EngineConfig())
    ref = TableCatalog(ref_root)
    cat = JdbcCatalog(jdbc_root)
    for table in ["segments", "rollup_1m", "rollup_1h", "rollup_1d"]:
        a = ref.read(spark, table)
        b = cat.read(spark, table).select(*a.columns)
        assert _rows(a) == _rows(b), table


def test_jdbc_segment_index_exists(spark, jdbc_root):
    """The reference's JDBCStorage DDL creates a secondary index over
    the segment time columns; ours must exist on the segments table."""
    cat = JdbcCatalog(jdbc_root)
    rows = cat._query(
        "SELECT CONGLOMERATENAME FROM SYS.SYSCONGLOMERATES WHERE ISINDEX"
    )
    assert any("SEGMENTS_TIME_IDX" in r[0].upper() for r in rows), rows


def test_jdbc_partition_ops(spark, jdbc_root, tmp_path):
    """list/drop/overwrite partitions through SQL, and predicate
    pushdown of the day filter into the JDBC scan."""
    cat = JdbcCatalog(str(tmp_path / "db2"))
    df = spark.createDataFrame(
        [("a", 1, 10), ("b", 2, 20), ("c", 2, 21)], "k string, part_day int, v long"
    )
    cat.overwrite_partitions(df, "t", ["part_day"])
    assert cat.list_partitions("t", "part_day") == ["1", "2"]
    # replace only day 2
    cat.overwrite_partitions(
        spark.createDataFrame([("z", 2, 99)], "k string, part_day int, v long"),
        "t",
        ["part_day"],
    )
    assert _rows(cat.read(spark, "t")) == [("a", 1, 10), ("z", 2, 99)]
    # pushdown: the day filter appears in the JDBC scan node
    plan = (
        cat.read(spark, "t")
        .where(F.col("part_day") == 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "part_day" in plan, plan
    assert cat.drop_partitions("t", "part_day", [1]) == 1
    assert cat.list_partitions("t", "part_day") == ["2"]


def test_jdbc_overwrite_partitions_atomic(spark, tmp_path, monkeypatch):
    """The partition swap is ONE transaction: a failure mid-swap (after
    the DELETE statement) rolls back and the old partition content
    survives; a crash before the swap (after staging) touches nothing;
    a clean re-run then completes the overwrite."""
    cat = JdbcCatalog(str(tmp_path / "db_atomic"))
    df0 = spark.createDataFrame(
        [("a", 1, 10), ("b", 2, 20)], "k string, part_day int, v long"
    )
    cat.overwrite_partitions(df0, "t", ["part_day"])
    new = spark.createDataFrame([("z", 2, 99)], "k string, part_day int, v long")

    # crash BEFORE the swap transaction: staging written, target untouched
    real_txn = JdbcCatalog._execute_txn
    monkeypatch.setattr(
        JdbcCatalog, "_execute_txn",
        lambda self, *s: (_ for _ in ()).throw(RuntimeError("killed pre-swap")),
    )
    with pytest.raises(RuntimeError, match="killed pre-swap"):
        cat.overwrite_partitions(new, "t", ["part_day"])
    assert _rows(cat.read(spark, "t")) == [("a", 1, 10), ("b", 2, 20)]

    # failure MID-transaction (DELETE executed, then a failing
    # statement): Derby must roll the DELETE back
    monkeypatch.setattr(
        JdbcCatalog, "_execute_txn",
        lambda self, *s: real_txn(
            self, *s[:-1], "INSERT INTO t SELECT * FROM no_such_table"
        ),
    )
    with pytest.raises(Exception):
        cat.overwrite_partitions(new, "t", ["part_day"])
    assert _rows(cat.read(spark, "t")) == [("a", 1, 10), ("b", 2, 20)]

    # clean re-run completes the overwrite
    monkeypatch.setattr(JdbcCatalog, "_execute_txn", real_txn)
    cat.overwrite_partitions(new, "t", ["part_day"])
    assert _rows(cat.read(spark, "t")) == [("a", 1, 10), ("z", 2, 99)]


def test_jdbc_index_ddl_errors_surface(spark, tmp_path):
    """_ensure_index is idempotent ONLY for Derby's X0Y32 (already
    exists); a genuinely bad DDL must raise, not pass silently."""
    cat = JdbcCatalog(str(tmp_path / "db_idx"))
    df = spark.createDataFrame(
        [("c1", 0, 1, 1.0)], "conv_id string, start_ms long, end_ms long, v double"
    )
    cat.overwrite(df, "seg_idx_t")          # creates the index
    cat._ensure_index("seg_idx_t", df)      # X0Y32 swallowed: idempotent
    with pytest.raises(Exception):          # table doesn't exist: surfaces
        cat._ensure_index("no_such_table_xyz", df)


def test_jdbc_manifest_round_trip(spark, tmp_path):
    cat = JdbcCatalog(str(tmp_path / "db3"))
    assert cat.read_manifest("segments") is None
    cat.write_manifest("segments", {"snapshot_id": "snap-9"})
    assert cat.read_manifest("segments")["snapshot_id"] == "snap-9"
    cat.write_manifest("segments", {"snapshot_id": "snap-10"})
    assert cat.read_manifest("segments")["snapshot_id"] == "snap-10"


def test_transfer_dir_edge_to_jdbc_cloud(spark, sf_small, tmp_path):
    """Edge parquet catalog -> cloud RDBMS, resumable and idempotent."""
    from modelardb_spark.jobs.transfer import SEGMENT_KEYS, transfer_segments

    edge = str(tmp_path / "edge")
    ingest(spark, transcripts_from_events(spark, sf_small), edge, EngineConfig())
    cloud = str(tmp_path / "cloud_db")
    with pytest.raises(RuntimeError, match="injected failure"):
        transfer_segments(
            spark, edge, cloud, chunk_days=8,
            fail_after_chunks=1, dst_kind="jdbc",
        )
    transfer_segments(spark, edge, cloud, chunk_days=8, dst_kind="jdbc")
    src = TableCatalog(edge).read(spark, "segments")
    dst = JdbcCatalog(cloud).read(spark, "segments")
    assert _rows(dst.select(*src.columns)) == _rows(src)
    dup = dst.groupBy(*SEGMENT_KEYS).count().where(F.col("count") > 1).count()
    assert dup == 0


def test_jdbc_dead_writer_stage_swept_live_stage_kept(spark, tmp_path):
    """A hard-crashed writer leaks its unique stage table; the next
    overwrite reclaims it (embedded pid no longer alive) while a stage
    owned by a LIVE pid is left alone."""
    import os
    import subprocess

    cat = JdbcCatalog(str(tmp_path / "db_sweep"))
    df0 = spark.createDataFrame(
        [("a", 1, 10)], "k string, part_day int, v long"
    )
    cat.overwrite_partitions(df0, "t", ["part_day"])
    # dead pid: a subprocess that has already exited
    p = subprocess.Popen(["true"])  # noqa: S603,S607
    p.wait()
    dead_stage = f"t_stage_{p.pid}_123"
    live_stage = f"t_stage_{os.getpid()}_456"
    cat._execute(
        f'CREATE TABLE {dead_stage} ("x" INT)',
        f'CREATE TABLE {live_stage} ("x" INT)',
    )
    cat.overwrite_partitions(df0, "t", ["part_day"])
    assert not cat.exists(dead_stage)
    assert cat.exists(live_stage)
    cat._execute(f"DROP TABLE {live_stage}")
