"""Source readers + Structured Streaming incremental ingest."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from modelardb_spark.config import EngineConfig
from modelardb_spark.io.tables import TableCatalog
from modelardb_spark.operators.grid import grid
from modelardb_spark.operators.series import derive_series
from modelardb_spark.operators.transcripts import synthetic_transcripts
from modelardb_spark.sources import (
    read_transcripts_csv,
    read_transcripts_orc,
    read_transcripts_parquet,
    register_external_table,
)
from modelardb_spark.streaming import stream_ingest


@pytest.fixture(scope="module")
def transcripts(spark):
    t = synthetic_transcripts(spark, n_convs=6, turns_per_conv=240, mega_convs=0).cache()
    t.count()
    return t


def test_round_trip_parquet_orc_csv(spark, transcripts, tmp_path):
    want = sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in transcripts.collect()
    )
    p = str(tmp_path / "t.parquet")
    transcripts.write.parquet(p)
    got = read_transcripts_parquet(spark, p)
    assert sorted((r["conv_id"], r["turn_idx"], r["text"]) for r in got.collect()) == want

    o = str(tmp_path / "t.orc")
    transcripts.write.orc(o)
    got = read_transcripts_orc(spark, o)
    assert sorted((r["conv_id"], r["turn_idx"], r["text"]) for r in got.collect()) == want

    c = str(tmp_path / "t.csv")
    transcripts.withColumn(
        "ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS")
    ).write.option("header", "true").csv(c)
    got = read_transcripts_csv(spark, c, ts_format="yyyy-MM-dd HH:mm:ss.SSS")
    assert sorted((r["conv_id"], r["turn_idx"], r["text"]) for r in got.collect()) == want
    # timestamps survive at millisecond precision
    a = transcripts.agg(F.sum(F.unix_millis(F.col("ts").cast("timestamp")))).first()[0]
    b = got.agg(F.sum(F.unix_millis(F.col("ts").cast("timestamp")))).first()[0]
    assert a == b


def test_register_external_table(spark, transcripts, tmp_path):
    p = str(tmp_path / "ext.parquet")
    transcripts.write.parquet(p)
    register_external_table(spark, "ext_transcripts", p)
    n = spark.sql("SELECT COUNT(*) FROM ext_transcripts").first()[0]
    assert n == transcripts.count()


def test_stream_ingest_incremental(spark, transcripts, tmp_path):
    """Two day-aligned drops ingested via availableNow streaming must
    reconstruct exactly the same points as one batch run."""
    in_dir = str(tmp_path / "drops")
    os.makedirs(in_dir)
    day_ms = 86_400_000
    t_with_day = transcripts.withColumn(
        "day", (F.unix_millis(F.col("ts").cast("timestamp")) / day_ms).cast("long")
    )
    days = sorted(r[0] for r in t_with_day.select("day").distinct().collect())
    half = days[: len(days) // 2]
    t_with_day.where(F.col("day").isin(half)).drop("day").write.parquet(
        f"{in_dir}/drop1.parquet"
    )
    t_with_day.where(~F.col("day").isin(half)).drop("day").write.parquet(
        f"{in_dir}/drop2.parquet"
    )

    out_root = str(tmp_path / "out")
    q = stream_ingest(spark, f"{in_dir}/*.parquet", out_root, EngineConfig())
    q.awaitTermination(120)

    segments = TableCatalog(out_root).read(spark, "segments")
    pts = grid(segments)
    series = derive_series(transcripts)
    bad = (
        series.alias("a")
        .join(pts.alias("b"), ["conv_id", "metric", "bin_ms"], "full_outer")
        .where("a.value IS DISTINCT FROM b.value")
    )
    assert bad.count() == 0

    # restart with no new files: stream checkpoint prevents re-ingest
    q2 = stream_ingest(spark, f"{in_dir}/*.parquet", out_root, EngineConfig())
    q2.awaitTermination(60)
    assert TableCatalog(out_root).read(spark, "segments").count() == segments.count()


def test_stream_ingest_socket(spark, tmp_path):
    """Socket-fed ingest (AsyncTimeSeriesSocket analogue): lines pushed
    over TCP arrive as segments through the same fit path."""
    import socket
    import threading
    import time as _time

    from modelardb_spark.streaming.ingest import stream_ingest_socket

    base_ms = 1_704_067_200_000
    lines = []
    for conv in ("sa", "sb"):
        for i in range(120):
            ts = base_ms + i * 30_000  # 2 turns per 1-minute bin
            tool = "click" if i % 3 == 0 else ""
            lines.append(f"{conv},{i},user,hello {i},{tool},{ts}")
    payload = ("\n".join(lines) + "\n").encode()

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        conn.sendall(payload)
        _time.sleep(30)  # keep the connection open while Spark drains
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    out_root = str(tmp_path / "sock_out")
    q = stream_ingest_socket(spark, "127.0.0.1", port, out_root)
    try:
        deadline = _time.time() + 60
        while _time.time() < deadline:
            q.processAllAvailable()
            import os

            if os.path.exists(os.path.join(out_root, "segments")):
                seg = TableCatalog(out_root).read(spark, "segments")
                if seg.count() > 0 and seg.agg(
                    {"seg_cnt": "sum"}
                ).first()[0] >= 120:  # 60 bins x 2 convs
                    break
            _time.sleep(1)
    finally:
        q.stop()
        srv.close()

    seg = TableCatalog(out_root).read(spark, "segments")
    pts = grid(seg)
    got = {
        (r["conv_id"], r["metric"]): r["total"]
        for r in pts.groupBy("conv_id", "metric")
        .agg(F.sum("value").alias("total"))
        .collect()
    }
    # 120 turns per conv -> 60 bins x turn_rate 2
    assert got[("sa", "turn_rate")] == 120.0
    assert got[("sb", "turn_rate")] == 120.0
    # every 3rd turn used a tool -> 40 tool events per conv
    assert got[("sa", "tool_usage")] == 40.0
    assert got[("sb", "tool_usage")] == 40.0


def test_socket_parser_regex_separator(spark):
    """The socket line parser must treat the separator literally (F.split
    takes a Java regex — '|' would otherwise split every character)."""
    from modelardb_spark.sources.readers import stream_transcripts_socket
    import re

    # unit-check the column expressions on a static frame via the same
    # parsing logic (the socket source itself is covered end-to-end by
    # test_stream_ingest_socket)
    df = spark.createDataFrame([("c1|0|user|hi there|click|1704067200000",)], "value string")
    parts = F.split(F.col("value"), re.escape("|"))
    row = df.select(
        parts.getItem(0).alias("conv_id"),
        parts.getItem(1).cast("int").alias("turn_idx"),
        parts.getItem(3).alias("text"),
        parts.getItem(5).cast("long").alias("ts_ms"),
    ).first()
    assert row["conv_id"] == "c1" and row["turn_idx"] == 0
    assert row["text"] == "hi there" and row["ts_ms"] == 1704067200000


def test_compact_stream_segments(spark, transcripts, tmp_path):
    """Compaction folds batch-keyed stream output into the canonical
    day-partitioned layout: identical reconstruction, no batch_id
    partitions left (FileStorage merge / rewrite_data_files analogue)."""
    from modelardb_spark.streaming.ingest import compact_stream_segments

    in_dir = str(tmp_path / "cdrops")
    os.makedirs(in_dir)
    day_ms = 86_400_000
    t_with_day = transcripts.withColumn(
        "day", (F.unix_millis(F.col("ts").cast("timestamp")) / day_ms).cast("long")
    )
    days = sorted(r[0] for r in t_with_day.select("day").distinct().collect())
    half = days[: len(days) // 2]
    t_with_day.where(F.col("day").isin(half)).drop("day").write.parquet(
        f"{in_dir}/drop1.parquet"
    )
    t_with_day.where(~F.col("day").isin(half)).drop("day").write.parquet(
        f"{in_dir}/drop2.parquet"
    )
    out_root = str(tmp_path / "cout")
    q = stream_ingest(spark, f"{in_dir}/*.parquet", out_root, EngineConfig())
    q.awaitTermination(120)

    catalog = TableCatalog(out_root)
    before = {
        tuple(r)
        for r in grid(catalog.read(spark, "segments")).collect()
    }
    assert catalog.list_partitions("segments", "batch_id")  # fragmented

    n = compact_stream_segments(spark, out_root)
    assert n >= 1
    seg = catalog.read(spark, "segments")
    assert "batch_id" not in seg.columns
    assert catalog.list_partitions("segments", "part_day")  # canonical
    after = {tuple(r) for r in grid(seg).collect()}
    assert after == before
    # idempotent: second call is a no-op
    assert compact_stream_segments(spark, out_root) == 0


def test_stream_rollup_watermark_late_data(spark, tmp_path):
    """Streaming 1m tier with a watermark: a turn arriving in a LATER
    micro-batch but within the watermark still lands in its (earlier)
    bin; bins seal and append exactly once when the watermark passes;
    bins at the stream head stay open (never emitted prematurely)."""
    from datetime import datetime, timezone

    from modelardb_spark.streaming.ingest import stream_rollup_1m

    base = 1_704_067_200_000
    m = 60_000

    def turns(items):
        return spark.createDataFrame(
            [
                (c, i, "user", "t", None,
                 datetime.fromtimestamp((base + b * m) / 1000, tz=timezone.utc))
                for i, (c, b) in enumerate(items)
            ],
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        )

    in_dir = str(tmp_path / "wdrops")
    os.makedirs(in_dir)
    # drop 1: bins 0..9, two turns each
    d1 = turns([("c1", b) for b in range(10) for _ in range(2)])
    d1.coalesce(1).write.parquet(f"{in_dir}/d1.parquet")
    # drop 2 (later batch): ONE LATE turn for bin 1 (within the 10-min
    # watermark) + far-future turns at bin 30 that advance the
    # watermark to bin 20, sealing bins 0..9
    d2 = turns([("c1", 1)] + [("c1", 30) for _ in range(2)])
    d2.coalesce(1).write.parquet(f"{in_dir}/d2.parquet")

    out_root = str(tmp_path / "wout")
    q = stream_rollup_1m(
        spark, f"{in_dir}/*.parquet", out_root, EngineConfig(),
        watermark="10 minutes", max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    rows = spark.read.parquet(f"{out_root}/rollup_1m_stream").collect()
    # exactly-once: no (conv, metric, window) key may appear twice
    keys = [(r["conv_id"], r["metric"], r["window_ms"]) for r in rows]
    assert len(keys) == len(set(keys))
    got = {(r["metric"], r["window_ms"]): r["vsum"] for r in rows}
    # all sealed bins present exactly once, late turn merged into bin 1
    assert got[("turn_rate", base + 1 * m)] == 3.0
    for b in [0] + list(range(2, 10)):
        assert got[("turn_rate", base + b * m)] == 2.0
    # the stream-head bin (30) is beyond the final watermark: not sealed
    assert ("turn_rate", base + 30 * m) not in got


def test_stream_rollup_feeds_batch_cascade(spark, tmp_path):
    """Sealed streaming 1m rows must be drop-in input for the batch
    cascade (schema + semantics): cascading them to 1h equals the
    batch 1h rollup over the same sealed bins."""
    from datetime import datetime, timezone

    from modelardb_spark.operators.rollup import HOUR_MS, rollup_cascade
    from modelardb_spark.streaming.ingest import stream_rollup_1m

    base = 1_704_067_200_000
    m = 60_000
    rows = [
        ("c1", i, "user", "t", "click" if b % 2 == 0 else None,
         datetime.fromtimestamp((base + b * m) / 1000, tz=timezone.utc))
        for i, b in enumerate(list(range(0, 150)) + [100_000])
    ]
    in_dir = str(tmp_path / "cascdrops")
    os.makedirs(in_dir)
    spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    ).coalesce(1).write.parquet(f"{in_dir}/d.parquet")
    out_root = str(tmp_path / "cascout")
    q = stream_rollup_1m(spark, f"{in_dir}/*.parquet", out_root, EngineConfig())
    q.awaitTermination(120)

    tier = spark.read.parquet(f"{out_root}/rollup_1m_stream")
    got = {
        (r["conv_id"], r["metric"], r["window_ms"]): (r["cnt"], r["vsum"])
        for r in rollup_cascade(tier, HOUR_MS).collect()
    }
    # batch expectation over the SEALED bins (0..149; the far-future
    # sentinel bin stays open): 60 bins/hour, turn_rate 1 per bin
    for h in range(2):
        k = ("c1", "turn_rate", base + h * HOUR_MS)
        assert got[k] == (60, 60.0), got[k]
    k = ("c1", "turn_rate", base + 2 * HOUR_MS)
    assert got[k] == (30, 30.0)
    k = ("c1", "tool_usage", base)
    assert got[k] == (60, 30.0)  # every other bin used a tool
