"""Greedy model-selection cascade over one gap-free run.

Offline re-expression of the reference's online SegmentGenerator
(core/SegmentGenerator.java:116-207,228-287). Equivalence argument:
every model's `append` fails monotonically, so whenever the reference
emits a segment, each model type's length equals its maximal
representable prefix of the then-current buffer — which this module
computes directly (vectorized where the model allows). Selection is the
reference's exact left fold over [PMC, Swing, Gorilla] with
``best = (ratio(m) < ratio(best)) ? best : m`` — NaN comparisons are
false in both Java and Python, so an invalid Swing model shadows an
earlier PMC candidate exactly as in the reference
(SegmentGenerator.java:230-233) — falling back to the raw model when
the winner's ratio is NaN or its length is 0 (:238-243).

Compression ratio per (ModelType.java:49-54):
``16 * length / (24 + payload_bytes + 4 * gap_entries)``; with group
size 1 the stored gap list is always empty (a NaN value flushes the
buffer before the tid is added, and the end of the gap flushes again
before new points arrive), so the gaps term is 0 here.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from modelardb_spark.models.gorilla import gorilla_compress
from modelardb_spark.models.pmc_mean import pmc_model, pmc_prefix
from modelardb_spark.models.swing import (
    swing_fit,
    swing_model,
    swing_verify,
)
from modelardb_spark.models.uncompressed import raw_model

MTID_RAW = 1
MTID_PMC = 2
MTID_SWING = 3
MTID_GORILLA = 4

_METADATA_BYTES = 24.0
_RAW_BYTES_PER_POINT = 16.0

#: initial window of the vectorized prefix searches; doubled until the
#: model stops accepting, keeping total work O(run_length) for long
#: covers while a SHORT segment (the common case: segments average
#: 5-50 points) only ever scans one small window instead of a full
#: 4096-value pass per cascade iteration
_CHUNK = 128


class FittedSegment(NamedTuple):
    start_ms: int
    end_ms: int
    mtid: int
    model: bytes
    n: int


def _ratio(length: int, payload_bytes: float) -> float:
    if length == 0:
        return float("nan")
    return (_RAW_BYTES_PER_POINT * length) / (_METADATA_BYTES + payload_bytes)


def _pmc_candidate(values: np.ndarray, error_bound: float) -> tuple[int, float]:
    limit = _CHUNK
    n = values.size
    while True:
        window = values[: min(limit, n)]
        prefix = pmc_prefix(window, error_bound)
        if prefix < window.size or window.size == n:
            return prefix, _ratio(prefix, 4.0)
        limit *= 2


def _swing_candidate(
    ts: np.ndarray, values: np.ndarray, error_bound: float
) -> tuple[int, float, bytes | None]:
    limit = _CHUNK
    n = values.size
    while True:
        m = min(limit, n)
        prefix, a, b = swing_fit(ts[:m], values[:m], error_bound)
        if prefix < m or m == n:
            break
        limit *= 2
    if prefix < 2:
        return prefix, float("nan"), None
    # the reference invalidates (size -> NaN) any line that fails the
    # float32 re-verification over its covered prefix (:144-174)
    if not swing_verify(ts[:prefix], values[:prefix], a, b, error_bound):
        return prefix, float("nan"), None
    model = swing_model(a, b)
    return prefix, _ratio(prefix, float(len(model))), model


def fit_run(
    timestamps_ms: np.ndarray,
    values: np.ndarray,
    error_bound: float = 0.0,
    length_bound: int = 50,
) -> list[FittedSegment]:
    """Segment one gap-free, sorted, regularly-spaced run.

    `timestamps_ms` must be strictly increasing with a constant step
    (the bin width); `values` are float32, NaN-free (gaps are split off
    by the caller, mirroring SegmentGenerator.java:131-148).
    """
    ts = np.asarray(timestamps_ms, dtype=np.int64)
    v = np.ascontiguousarray(values, dtype=np.float32)
    out: list[FittedSegment] = []
    pos = 0
    n = v.size
    while pos < n:
        rest_v = v[pos:]
        rest_t = ts[pos:]

        pmc_len, pmc_ratio = _pmc_candidate(rest_v, error_bound)
        swing_len, swing_ratio, swing_bytes = _swing_candidate(
            rest_t, rest_v, error_bound
        )
        gor_len = min(rest_v.size, length_bound)
        gor_bytes = gorilla_compress(rest_v[:gor_len])
        gor_ratio = _ratio(gor_len, float(len(gor_bytes)))

        # reference fold (SegmentGenerator.java:230-233): NaN < x is false,
        # so a NaN candidate replaces the incumbent
        candidates = [
            (MTID_PMC, pmc_len, pmc_ratio),
            (MTID_SWING, swing_len, swing_ratio),
            (MTID_GORILLA, gor_len, gor_ratio),
        ]
        best = candidates[0]
        for cand in candidates:
            if not (cand[2] < best[2]):
                best = cand
        mtid, length, ratio = best

        if not (ratio == ratio) or length == 0:  # NaN ratio or empty
            length = min(rest_v.size, length_bound)
            mtid = MTID_RAW

        if mtid == MTID_PMC:
            model = pmc_model(rest_v, length)
        elif mtid == MTID_SWING:
            model = swing_bytes  # type: ignore[assignment]
        elif mtid == MTID_GORILLA:
            model = gor_bytes
        else:
            model = raw_model(rest_v, length)

        out.append(
            FittedSegment(
                start_ms=int(rest_t[0]),
                end_ms=int(rest_t[length - 1]),
                mtid=mtid,
                model=model,
                n=length,
            )
        )
        pos += length
    return out
