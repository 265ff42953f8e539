"""Relative percentage error predicate.

Semantics cloned from the reference
(core/utility/Static.java:106-119): the error of approximating `real`
by `approximation` is ``|real - approximation| / |real| * 100``, with
the special case ``approximation == real -> 0`` so that 0/0 does not
produce NaN. Note the asymmetry: `real == 0, approximation != 0` gives
+inf, i.e. any nonzero approximation of zero is outside every bound.
"""

from __future__ import annotations

import numpy as np


def percentage_error(approximation: float, real: float) -> float:
    """Scalar percentage error (Static.java:110-119 semantics)."""
    if approximation == real:
        return 0.0
    if real == 0.0:
        return float("inf")  # Java double division yields Infinity here
    return abs((real - approximation) / real) * 100.0


def outside_percentage_error_bound(
    error_bound: float, approximation: float, real: float
) -> bool:
    """Scalar predicate (Static.java:106-108)."""
    return percentage_error(approximation, real) > error_bound


def percentage_error_vec(
    approximation: np.ndarray, real: np.ndarray
) -> np.ndarray:
    """Vectorized percentage error; inputs broadcast, float64 math.

    The operation ORDER is the reference's exactly —
    ``abs((real - approx) / real) * 100`` (Static.java:110-119) — not
    an algebraic rearrangement: divide-then-abs-then-scale can differ
    from other orders by 1 ulp, and the lossy bound check must agree
    bit-for-bit with the fit-time decision. The errstate context is
    acceptable here because the LOSSLESS hot path short-circuits in
    `outside_bound_vec` before ever reaching this function."""
    approximation = np.asarray(approximation, dtype=np.float64)
    real = np.asarray(real, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        err = np.abs((real - approximation) / real) * 100.0
    return np.where(approximation == real, 0.0, err)


def outside_bound_vec(
    error_bound: float, approximation: np.ndarray, real: np.ndarray
) -> np.ndarray:
    """Vectorized `outside_percentage_error_bound`; NaN errors (from
    0-valued `real`) compare as not-greater, matching Java where the
    `approximation == real` guard already removed the only NaN source
    the reference can produce — we additionally force NaN -> outside so
    an undefined error is never silently accepted.

    Lossless fast path: at bound 0, err > 0 holds exactly when
    approximation != real (err is 0 iff they are equal, by definition;
    any NaN input also compares != and is therefore outside) — so the
    whole division pipeline collapses to one comparison. This is the
    hot check of the fit cascade at the engine's default bound."""
    if error_bound == 0.0:
        return np.asarray(approximation) != np.asarray(real)
    err = percentage_error_vec(approximation, real)
    return ~(err <= error_bound)
