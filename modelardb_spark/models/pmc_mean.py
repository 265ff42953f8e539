"""PMC-Mean constant model.

Semantics cloned from the reference (core/models/PMC_MeanModelType.java):
a prefix of points is representable iff the running float32 mean stays
within the percentage error bound of both the running min and the
running max, checked after every appended point; failure is monotone.
The model payload is the final mean as one big-endian float32.
"""

from __future__ import annotations

import struct

import numpy as np

from modelardb_spark.models.errors import outside_bound_vec


def pmc_prefix(values: np.ndarray, error_bound: float) -> int:
    """Length of the maximal representable prefix of `values` (float32).

    Vectorized replay of the reference's append loop
    (PMC_MeanModelType.java:34-62): after point k (1-based), the check is
    `avg_k = float32(sum_k / k)` within bound of `min_k` and `max_k`.
    Failure is the first k where the check fails; points past it are
    never consulted (monotone-failure contract, ModelType.java:34).
    """
    v = np.asarray(values, dtype=np.float32)
    if v.size == 0:
        return 0
    run_min = np.minimum.accumulate(v)
    run_max = np.maximum.accumulate(v)
    # reference accumulates the sum in double, then casts the mean to float
    avg = (np.cumsum(v, dtype=np.float64) / np.arange(1, v.size + 1)).astype(
        np.float32
    )
    bad = outside_bound_vec(error_bound, avg, run_min) | outside_bound_vec(
        error_bound, avg, run_max
    )
    if not bad.any():
        return v.size
    return int(np.argmax(bad))


def pmc_model(values: np.ndarray, length: int) -> bytes:
    """Serialize the model for the accepted prefix: big-endian float32
    of float32(sum/len) with the sum accumulated in double
    (PMC_MeanModelType.java:80-82)."""
    s = float(np.sum(np.asarray(values[:length], dtype=np.float32), dtype=np.float64))
    return struct.pack(">f", np.float32(s / length))


def pmc_value(model: bytes) -> float:
    """Decode the constant (float32)."""
    return struct.unpack(">f", model)[0]

