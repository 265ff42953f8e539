"""Raw float32 fallback model (mtid 1).

Reference: core/models/UncompressedModelType.java — stores the values
verbatim (big-endian float32 array, 4 bytes/point), capped at the
length bound; always succeeds, used when no other model fits
(ModelTypeFactory.java:23-26 reserves mtid 1 for this fallback).
"""

from __future__ import annotations

import numpy as np


def raw_model(values: np.ndarray, length: int) -> bytes:
    return (
        np.asarray(values[:length], dtype=np.float32)
        .astype(">f4")
        .tobytes()
    )


def raw_decode(model: bytes) -> np.ndarray:
    return np.frombuffer(model, dtype=">f4").astype(np.float32)
