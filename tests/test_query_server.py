"""End-to-end tests for the query endpoint (the reference's
QueryInterface shape, remote/QueryInterface.scala:35-106): reference-
style SQL with the `#` sugar through the library API and through the
socket line protocol."""

from __future__ import annotations

import json
import socket
import threading

from modelardb_spark.jobs.query_server import (
    execute,
    make_http_server,
    make_socket_server,
    prepare_session,
)


def test_reference_sql_runs_verbatim(spark, sf_small):
    prepare_session(spark, events=f"{sf_small}/events.parquet")
    df = execute(
        spark,
        """
        SELECT conv_id, metric,
               COUNT_S(#) AS cnt, MIN_S(#) AS vmin, MAX_S(#) AS vmax
        FROM segments GROUP BY conv_id, metric
        """,
    )
    rows = df.collect()
    assert rows and all(r["cnt"] > 0 and r["vmin"] <= r["vmax"] for r in rows)
    # the point view answers too (delegation surface)
    n_pts = execute(spark, "SELECT COUNT(*) AS n FROM data_points").first()["n"]
    assert n_pts == sum(r["cnt"] for r in rows)


def test_socket_interface_round_trip(spark, sf_small):
    prepare_session(spark, events=f"{sf_small}/events.parquet")
    srv = make_socket_server(spark, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        host, port = srv.server_address
        with socket.create_connection((host, port), timeout=120) as s:
            f = s.makefile("rw", encoding="utf-8")
            f.write("SELECT COUNT_S(#) AS cnt FROM segments;\n")
            f.flush()
            lines = []
            while True:
                ln = f.readline().strip()
                lines.append(ln)
                if ln.startswith("--"):
                    break
            assert lines[-1] == "-- ok 1"
            assert json.loads(lines[0])["cnt"] > 0
            # errors surface without killing the connection
            f.write("SELECT FROM nowhere;\n")
            f.flush()
            assert f.readline().startswith("-- error")
            f.write("SELECT 1 AS one;\n")
            f.flush()
            assert json.loads(f.readline())["one"] == 1
            assert f.readline().strip() == "-- ok 1"
    finally:
        srv.shutdown()
        srv.server_close()


def test_file_mode_statements(spark, sf_small, capsys):
    """The file/one-shot mode splits on ';' and prints one JSON line
    per row (the reference's query-file interface)."""
    from modelardb_spark.jobs.query_server import run_statements

    prepare_session(spark, events=f"{sf_small}/events.parquet")
    run_statements(
        spark,
        "SELECT 1 AS a; SELECT COUNT_S(#) AS cnt FROM segments;",
        limit=10,
    )
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert json.loads(lines[0])["a"] == 1
    assert json.loads(lines[1])["cnt"] > 0


def test_http_interface_round_trip(spark, sf_small):
    import urllib.parse
    import urllib.request

    prepare_session(spark, events=f"{sf_small}/events.parquet")
    srv = make_http_server(spark, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        _, port = srv.server_address
        q = urllib.parse.quote("SELECT COUNT_S(#) AS cnt FROM segments")
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/?q={q}", timeout=120
        ) as r:
            assert json.loads(r.read().decode())["cnt"] > 0
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/",
            data=b"SELECT 2 AS two",
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert json.loads(r.read().decode())["two"] == 2
    finally:
        srv.shutdown()
        srv.server_close()


def test_flight_interface_round_trip(spark, sf_small, tmp_path):
    """The reference's DEFAULT interface (`modelardb.interface arrow`,
    QueryInterfaceFlightProducer.scala:35-104): a SQL ticket over
    Arrow Flight returns the query result as record batches, with the
    full registered surface (# sugar, *_S aggregates)."""
    import pytest

    pytest.importorskip("pyarrow.flight")
    from modelardb_spark.remote.flight import SegmentFlightServer, get_query

    prepare_session(spark, events=f"{sf_small}/events.parquet")
    server = SegmentFlightServer(str(tmp_path / "recv"), spark=spark)
    try:
        got = get_query(
            f"grpc://127.0.0.1:{server.port}",
            "SELECT conv_id, metric, COUNT_S(#) AS cnt "
            "FROM segments GROUP BY conv_id, metric",
        )
        local = execute(
            spark,
            "SELECT conv_id, metric, COUNT_S(#) AS cnt "
            "FROM segments GROUP BY conv_id, metric",
        ).collect()
        assert sorted(got.to_pylist(), key=lambda r: (r["conv_id"], r["metric"])) \
            == sorted((r.asDict() for r in local),
                      key=lambda r: (r["conv_id"], r["metric"]))
    finally:
        server.shutdown()


def test_query_server_reads_snapshot_catalog(spark, sf_small, tmp_path):
    """--catalog snapshot: the query surface registers over an ACID
    snapshot-catalog ingest output and answers the segment SQL."""
    from modelardb_spark.config import EngineConfig
    from modelardb_spark.jobs.ingest import ingest
    from modelardb_spark.jobs.query_server import execute, prepare_session
    from modelardb_spark.operators.transcripts import transcripts_from_events

    root = str(tmp_path / "snap_qs")
    ingest(
        spark, transcripts_from_events(spark, sf_small), root,
        EngineConfig(), catalog_kind="snapshot",
    )
    seg = prepare_session(spark, segments_dir=root, catalog_kind="snapshot")
    n = seg.count()
    assert n > 0
    got = execute(
        spark, "SELECT COUNT_S(#) AS cnt FROM segments"
    ).collect()[0]["cnt"]
    direct = seg.selectExpr(
        "SUM((end_ms - start_ms) DIV interval_ms + 1) AS cnt"
    ).collect()[0]["cnt"]
    assert got == direct
