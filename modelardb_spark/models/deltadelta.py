"""Delta-of-delta timestamp compression (lossless, int64 ms).

The north rule names "Gorilla XOR / delta-of-delta" compression. The
reference never stores per-point timestamps — after gap-fill they are
implicit from ``(start, end, SI)`` (core/models/Segment.java:58-61) —
and this engine keeps that design for SEGMENTS. Delta-of-delta still
has a real job here: compressing EXPLICIT timestamp lists where they
must exist, i.e. the stateful streaming fit's open-run state
(streaming/stateful.py), whose ``bins`` array rides through every
state checkpoint and Arrow exchange. On a regular 1-minute grid the
stream costs ~1 bit per timestamp instead of 64.

Layout (the Facebook Gorilla paper's timestamp scheme, widened with a
32-bit bucket for millisecond-scale deltas): 64-bit first timestamp,
then per point the delta-of-delta ``D_i = (t_i - t_{i-1}) -
(t_{i-1} - t_{i-2})`` (the first point's previous delta is 0) encoded
as

    '0'                          D == 0
    '10'    + 7  bits            D in [-63, 64]
    '110'   + 9  bits            D in [-255, 256]
    '1110'  + 12 bits            D in [-2047, 2048]
    '11110' + 32 bits            D in [-2^31+1, 2^31]
    '11111' + 64 bits            anything else (two's complement)

with each k-bit payload stored as ``D + (2^(k-1) - 1)``.
"""

from __future__ import annotations

import numpy as np

_BUCKETS = ((7, 64), (9, 256), (12, 2048), (32, 1 << 31))
_TAGS = (0b10, 0b110, 0b1110, 0b11110)
_TAG_BITS = (2, 3, 4, 5)


def dod_compress(timestamps: np.ndarray) -> bytes:
    """Compress an int64 timestamp array; any sequence round-trips
    (monotonicity is not required). Deltas/dods are computed mod 2^64
    (np.diff wraps) and the decompressor accumulates mod 2^64 too, so
    even consecutive values 2^63 apart reconstruct exactly. Vectorized
    prep + one big-int accumulation, like `gorilla_compress`."""
    ts = np.ascontiguousarray(timestamps, dtype=np.int64)
    n = ts.size
    if n == 0:
        return b""
    acc = int(ts[0]) & ((1 << 64) - 1)  # two's complement
    nb = 64
    if n > 1:
        deltas = np.diff(ts)
        dods = np.concatenate(([deltas[0]], np.diff(deltas))).tolist()
        for d in dods:
            if d == 0:
                acc <<= 1
                nb += 1
                continue
            for (k, hi), tag, tb in zip(_BUCKETS, _TAGS, _TAG_BITS):
                if -(hi - 1) <= d <= hi:
                    acc = (acc << (tb + k)) | (tag << k) | (d + hi - 1)
                    nb += tb + k
                    break
            else:
                acc = (acc << 69) | (0b11111 << 64) | (d & ((1 << 64) - 1))
                nb += 69
    pad = (-nb) % 8
    return (acc << pad).to_bytes((nb + pad) // 8, "big")


def dod_decompress(model: bytes, length: int) -> np.ndarray:
    """Decompress `length` int64 timestamps from the bitstream."""
    out = np.empty(length, dtype=np.int64)
    if length == 0:
        return out
    pos = 0
    acc = 0
    nbits = 0
    data = model

    def take(k: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < k:
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= k
        v = acc >> nbits
        acc &= (1 << nbits) - 1
        return v

    # accumulate mod 2^64 (matching np.diff's wrapping on the compress
    # side) and reduce to signed 64-bit at write time: round-trips any
    # int64 sequence, even deltas/dods outside the int64 range
    mask = (1 << 64) - 1
    t = take(64)
    out[0] = t - (1 << 64) if t >= 1 << 63 else t
    delta = 0
    for i in range(1, length):
        if take(1) == 0:
            d = 0
        else:
            for (k, hi) in _BUCKETS:
                if take(1) == 0:
                    d = take(k) - (hi - 1)
                    break
            else:
                d = take(64)
        delta = (delta + d) & mask
        t = (t + delta) & mask
        out[i] = t - (1 << 64) if t >= 1 << 63 else t
    return out
