"""Arrow Flight wire layer: segment-transfer receiver and query-result
streaming.

Reference parity:

- `do_put` with a descriptor naming a table receives segment record
  batches and stores them durably — the receiver side of the
  reference's edge->cloud shipment
  (remote/RemoteStorageFlightProducer.scala:40-70 accepts "segment" /
  "time_series" streams and hands them to storage). Batches append as
  parquet files via write-to-temp + atomic rename, so a crashed put
  never leaves a torn file; re-reads see only completed puts.
- `do_get` with a SQL ticket streams the query result back as Arrow
  record batches — the reference serves every query result as an
  Arrow stream (remote/QueryInterfaceFlightProducer.scala:35-104).
  The SQL runs through `segment_sql`, so the full reference surface
  (*_S aggregates, `#` sugar, DATA_POINTS) is available on the wire.
- `do_action("model_types")` returns the space-separated model-type
  implementation names, the exact encoding the reference uses for its
  pre-transfer compatibility check
  (RemoteStorageFlightProducer.scala:74-86).

Scale note: the Flight endpoint is the EDGE protocol — for nodes too
small to run Spark, shipping finalized segments upstream. Cluster-to-
cluster movement goes through `jobs/transfer.py` (Spark moves the
bytes in parallel, resumable and deduplicated); a fleet of receivers
behind a load-assigning master (RemoteStorageFlightProducer.scala:
96-118) maps onto ordinary L4 load-balancing of this server.
"""

from __future__ import annotations

import os
import threading
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pyarrow.flight is an optional extra in some distributions
    import pyarrow.flight as flight

    _FLIGHT_ERR = None
except ImportError as e:  # pragma: no cover
    flight = None
    _FLIGHT_ERR = e

#: the wire schema for one finalized segment — the reference's
#: (GID, START_TIME, END_TIME, MTID, MODEL, OFFSETS) with our
#: self-describing series identity instead of gid+offsets
#: (RemoteStorage.scala:263-278)
SEGMENT_WIRE_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string(), nullable=False),
        pa.field("metric", pa.string(), nullable=False),
        pa.field("start_ms", pa.int64(), nullable=False),
        pa.field("end_ms", pa.int64(), nullable=False),
        pa.field("interval_ms", pa.int64(), nullable=False),
        pa.field("mtid", pa.int32(), nullable=False),
        pa.field("model", pa.binary(), nullable=False),
    ],
    metadata={"name": "segment"},
)


def _require_flight() -> None:
    if flight is None:  # pragma: no cover
        raise ImportError(
            "pyarrow.flight is required for the remote surface"
        ) from _FLIGHT_ERR


class SegmentFlightServer(flight.FlightServerBase if flight else object):
    """Receives segment streams into a local store and serves query
    results as Arrow streams. Bind with port 0 for an ephemeral port
    (`server.port` reports the bound one); loopback by default — the
    endpoint is unauthenticated, expose it deliberately."""

    def __init__(
        self,
        store_root: str,
        host: str = "127.0.0.1",
        port: int = 0,
        spark=None,
        limit: int = 100_000,
    ):
        _require_flight()
        location = flight.Location.for_grpc_tcp(host, port)
        super().__init__(location)
        self.store_root = store_root
        self.spark = spark
        #: row cap per do_get result: the Arrow table materializes on
        #: the driver before streaming, so an uncapped `SELECT * FROM
        #: data_points` on a big table would OOM the server — same
        #: discipline as the socket/HTTP modes' --limit
        self.limit = limit
        self._lock = threading.Lock()
        self.rows_received = 0

    # -- segment shipment (RemoteStorageFlightProducer.acceptPut) ----
    def do_put(self, context, descriptor, reader, writer):
        table_name = descriptor.path[0].decode() if descriptor.path else "segments"
        batches = [chunk.data for chunk in reader]
        if not batches:
            return
        tbl = pa.Table.from_batches(batches)
        d = os.path.join(self.store_root, table_name)
        os.makedirs(d, exist_ok=True)
        # atomic publish: a reader never observes a torn file
        tmp = os.path.join(d, f".recv-{uuid.uuid4().hex}.tmp")
        pq.write_table(tbl, tmp)
        os.rename(tmp, os.path.join(d, f"recv-{uuid.uuid4().hex}.parquet"))
        with self._lock:
            self.rows_received += tbl.num_rows

    # -- query results as Arrow (QueryInterfaceFlightProducer) -------
    def do_get(self, context, ticket):
        if self.spark is None:
            raise NotImplementedError("no SparkSession attached for queries")
        from modelardb_spark.operators.sqlfunctions import segment_sql

        sql = ticket.ticket.decode("utf-8")
        tbl = segment_sql(self.spark, sql).limit(self.limit).toArrow()
        return flight.RecordBatchStream(tbl)

    # -- control actions ---------------------------------------------
    def do_action(self, context, action):
        if action.type == "model_types":
            from modelardb_spark.io.tables import MODEL_TYPES

            # the reference's encoding: space-separated implementation
            # names in mtid order, fallback type dropped
            # (RemoteStorageFlightProducer.scala:74-86)
            body = " ".join(name for mtid, name in MODEL_TYPES[1:])
            return [body.encode("utf-8")]
        if action.type == "ping":
            return [b"pong"]
        raise KeyError(f"unknown action type: {action.type}")

    def list_actions(self, context):
        return [("model_types", "model type names"), ("ping", "liveness")]


# -- client helpers (RemoteStorage's client half) --------------------


def put_table(location: str, table_name: str, tbl: pa.Table) -> None:
    """Ship an Arrow table to a receiver
    (RemoteStorage.storeSegmentGroups, RemoteStorage.scala:159-171)."""
    _require_flight()
    client = flight.connect(location)
    try:
        desc = flight.FlightDescriptor.for_path(table_name)
        writer, reader = client.do_put(desc, tbl.schema)
        writer.write_table(tbl)
        writer.close()
    finally:
        client.close()


def get_query(location: str, sql: str) -> pa.Table:
    """Run reference-style SQL on the server, stream the result back
    (QueryInterfaceFlightProducer.scala:35-104)."""
    _require_flight()
    client = flight.connect(location)
    try:
        return client.do_get(flight.Ticket(sql.encode("utf-8"))).read_all()
    finally:
        client.close()


def model_types(location: str) -> list[str]:
    """The remote's model-type names (the pre-transfer check's wire
    call, RemoteStorage.scala:223-250)."""
    _require_flight()
    client = flight.connect(location)
    try:
        (result,) = client.do_action(flight.Action("model_types", b""))
        return result.body.to_pybytes().decode("utf-8").split(" ")
    finally:
        client.close()
