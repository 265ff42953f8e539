"""Segment decoding: grid (point reconstruction) and closed-form
aggregates.

Mirrors the reference's Segment hierarchy (core/models/Segment.java and
the per-model subclasses): a segment ``(start_ms, end_ms, interval_ms,
mtid, model)`` represents ``n = (end - start) / interval + 1`` points at
``start + i*interval`` (Segment.java:58-61, :97-108). Values:

- PMC (mtid 2): the stored constant (PMC_MeanModelType.java:122-140);
- Swing (mtid 3): ``float32(a*t + b)`` (SwingFilterModelType.java:237-239),
  min/max at the endpoints by slope sign, sum as the trapezoid of the
  unrounded doubles;
- Gorilla (mtid 4): the decompressed array;
- raw (mtid 1): the stored float32 array.
"""

from __future__ import annotations

import numpy as np

from modelardb_spark.models.cascade import (
    MTID_GORILLA,
    MTID_PMC,
    MTID_RAW,
    MTID_SWING,
)
from modelardb_spark.models.gorilla import gorilla_decompress
from modelardb_spark.models.pmc_mean import pmc_value
from modelardb_spark.models.swing import swing_decode, swing_minmax, swing_sum
from modelardb_spark.models.uncompressed import raw_decode


def segment_length(start_ms: int, end_ms: int, interval_ms: int) -> int:
    """n = (end - start) / interval + 1 (Segment.java:58-61)."""
    return int((end_ms - start_ms) // interval_ms) + 1


def decode_values(
    mtid: int, model: bytes, start_ms: int, end_ms: int, interval_ms: int
) -> np.ndarray:
    """Reconstruct all point values of a segment as float32."""
    n = segment_length(start_ms, end_ms, interval_ms)
    if mtid == MTID_PMC:
        return np.full(n, pmc_value(model), dtype=np.float32)
    if mtid == MTID_SWING:
        a, b = swing_decode(model)
        ts = start_ms + interval_ms * np.arange(n, dtype=np.float64)
        return (a * ts + b).astype(np.float32)
    if mtid == MTID_GORILLA:
        return gorilla_decompress(model, n)
    if mtid == MTID_RAW:
        return raw_decode(model)[:n]
    raise ValueError(f"unknown mtid {mtid}")


def decode_dense_matrix(
    mtids: np.ndarray, models: list[bytes], lengths: np.ndarray
) -> np.ndarray:
    """Batched decode of DENSE (Gorilla / raw) segments: returns an
    (n_segments, max(lengths)) float32 matrix, row i valid to
    lengths[i]. Gorilla rows decode in vectorized lockstep
    (gorilla_decompress_matrix); raw rows are plain frombuffer casts.
    This is the Arrow-batch fast path used by grid and the dense
    rollup partials — no per-value Python anywhere."""
    n = len(models)
    lengths = np.asarray(lengths, dtype=np.int64)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float32)
    mtids = np.asarray(mtids)
    bad = ~np.isin(mtids, (MTID_GORILLA, MTID_RAW))
    if bad.any():
        # fail loudly like the scalar decode_values — silent all-zero
        # rows must never flow into rollups
        raise ValueError(
            f"decode_dense_matrix: non-dense mtid(s) {sorted(set(mtids[bad].tolist()))}"
        )
    max_n = int(lengths.max())
    out = np.zeros((n, max_n), dtype=np.float32)
    gor = np.flatnonzero(mtids == MTID_GORILLA)
    if gor.size:
        from modelardb_spark.models.gorilla import gorilla_decompress_matrix

        sub = gorilla_decompress_matrix(
            [models[i] for i in gor], lengths[gor]
        )
        out[gor, : sub.shape[1]] = sub
    for i in np.flatnonzero(mtids == MTID_RAW):
        v = raw_decode(models[i])[: lengths[i]]
        out[i, : v.size] = v
    return out


def segment_grid(
    mtid: int, model: bytes, start_ms: int, end_ms: int, interval_ms: int
) -> tuple[np.ndarray, np.ndarray]:
    """(timestamps_ms, values) for every point of the segment."""
    n = segment_length(start_ms, end_ms, interval_ms)
    ts = start_ms + interval_ms * np.arange(n, dtype=np.int64)
    return ts, decode_values(mtid, model, start_ms, end_ms, interval_ms)


def segment_agg(
    mtid: int, model: bytes, start_ms: int, end_ms: int, interval_ms: int
) -> tuple[int, float, float, float]:
    """Closed-form (count, min, max, sum) without gridding where the
    model allows (the reference's aggregate-on-model capability,
    SparkUDAF.scala:34-184 backed by the per-model Segment methods)."""
    n = segment_length(start_ms, end_ms, interval_ms)
    if mtid == MTID_PMC:
        v = pmc_value(model)
        return n, v, v, float(v) * n
    if mtid == MTID_SWING:
        a, b = swing_decode(model)
        lo, hi = swing_minmax(a, b, start_ms, end_ms)
        return n, lo, hi, swing_sum(a, b, start_ms, end_ms, n)
    values = decode_values(mtid, model, start_ms, end_ms, interval_ms)
    return (
        n,
        float(values.min()),
        float(values.max()),
        float(values.sum(dtype=np.float64)),
    )
