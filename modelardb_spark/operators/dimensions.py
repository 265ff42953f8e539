"""Dimensions: star-schema member columns on the views + dimension-
predicate routing.

The reference attaches user-defined dimension members to every time
series (core/Dimensions.java:26-72), projects them onto the Segment /
DataPoint views (engines/spark/ViewProvider.scala:31-37), and rewrites
dimension predicates into gid/tid restrictions before the storage scan
(engines/spark/ViewSegment.scala:67-68). Spark-first re-expression:

- the dimension table is a small DataFrame keyed on the series key
  (conv_id here) — the analogue of the reference's denormalized
  dimensions schema;
- `with_dimensions` projects members onto any engine view with a
  BROADCAST join (no shuffle of the fact side);
- a dimension predicate is applied by broadcast-joining the FILTERED
  dimension rows against the *segments* table BEFORE any
  reconstruction — the same effect as the reference's dim -> gid
  rewrite: segments of non-matching conversations are pruned at scan
  level and never decoded.

The demo dimension values are derived deterministically from conv_id
via md5 (portable to the DuckDB oracle), standing in for an external
dimension source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANNELS = ("web", "mobile", "api", "sdk")
REGIONS = ("amer", "emea", "apac")


def _member(col: str, pos: int, values: tuple[str, ...]):
    digit = F.conv(F.substring(F.md5(F.col(col)), pos, 1), 16, 10).cast("long")
    return F.element_at(
        F.array(*[F.lit(v) for v in values]), (digit % len(values) + 1).cast("int")
    )


def conversation_dimensions(convs: DataFrame) -> DataFrame:
    """Dimension table (conv_id, channel, region) for every distinct
    conversation in `convs` (any frame with a conv_id column)."""
    return convs.select("conv_id").distinct().select(
        "conv_id",
        _member("conv_id", 1, CHANNELS).alias("channel"),
        _member("conv_id", 2, REGIONS).alias("region"),
    )


def with_dimensions(view: DataFrame, dims: DataFrame) -> DataFrame:
    """Project dimension members onto an engine view (segments, points,
    rollups): broadcast join on conv_id — the ViewProvider.scala:31-37
    analogue. The fact side never shuffles."""
    return view.join(F.broadcast(dims), "conv_id", "left")


def dim_restrict(segments: DataFrame, dims: DataFrame, **predicates) -> DataFrame:
    """Dimension predicate -> segment restriction BEFORE reconstruction
    (the ViewSegment.scala:67-68 dim -> gid rewrite): filter the (small)
    dimension table on the driver-side predicate, broadcast-join the
    surviving conv_ids against segments. Non-matching segments are
    pruned at scan level and never decoded."""
    keep = dims
    for col, val in predicates.items():
        keep = keep.where(F.col(col) == val)
    return segments.join(F.broadcast(keep.select("conv_id")), "conv_id")
