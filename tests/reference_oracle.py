"""Slow, literal pure-Python reimplementation of the reference's online
compression loop, used only as a test oracle to validate the vectorized
production cascade in modelardb_spark.models.

Follows core/SegmentGenerator.java + the three model types append-by-
append (group size 1), so its emitted (start, end, mtid, length) stream
is what the reference would produce for the same run.
"""

from __future__ import annotations

import numpy as np

from modelardb_spark.models.errors import outside_percentage_error_bound
from modelardb_spark.models.gorilla import gorilla_compress
from modelardb_spark.models.pmc_mean import pmc_model
from modelardb_spark.models.swing import swing_model
from modelardb_spark.models.uncompressed import raw_model

F32 = np.float32


class _PMC:
    mtid = 2

    def __init__(self, bound):
        self.bound = bound
        self.reset()

    def reset(self):
        self.n = 0
        self.min = np.finfo(np.float32).max
        self.max = -np.finfo(np.float32).max
        self.sum = 0.0
        self.ok = True

    def append(self, ts, v):
        if not self.ok:
            return False
        nmin = min(self.min, v)
        nmax = max(self.max, v)
        nsum = self.sum + float(v)
        avg = float(F32(nsum / (self.n + 1)))
        if outside_percentage_error_bound(
            self.bound, avg, float(nmin)
        ) or outside_percentage_error_bound(self.bound, avg, float(nmax)):
            self.ok = False
            return False
        self.min, self.max, self.sum = nmin, nmax, nsum
        self.n += 1
        return True

    def initialize(self, buf):
        self.reset()
        for ts, v in buf:
            if not self.append(ts, v):
                return

    def size(self, buf):
        return float("nan") if self.n == 0 else 4.0

    def model(self, buf):
        return pmc_model(np.array([v for _, v in buf], dtype=np.float32), self.n)


class _Line:
    def __init__(self, ts, vs, te, ve):
        self.a = (ve - vs) / (te - ts)
        self.b = vs - self.a * ts

    def get(self, ts):
        return self.a * ts + self.b


class _Swing:
    mtid = 3

    def __init__(self, bound):
        self.bound = bound
        self.reset()

    def reset(self):
        self.n = 0
        self.ok = True
        self.up = None
        self.lo = None
        self.init_pt = None

    def append(self, ts, v):
        if not self.ok:
            return False
        if self.n == 0:
            self.init_pt = (ts, float(v))
            self.n = 1
            return True
        dev = abs(float(v) * (self.bound / 100.1))
        t0, v0 = self.init_pt
        if self.n == 1:
            self.up = _Line(t0, v0, ts, float(v) + dev)
            self.lo = _Line(t0, v0, ts, float(v) - dev)
        else:
            uba = self.up.get(ts)
            lba = self.lo.get(ts)
            if uba + dev < v or lba - dev > v:
                self.ok = False
                return False
            if uba - dev > v:
                self.up = _Line(t0, v0, ts, float(v) + dev)
            if lba + dev < v:
                self.lo = _Line(t0, v0, ts, float(v) - dev)
        self.n += 1
        return True

    def initialize(self, buf):
        self.reset()
        for ts, v in buf:
            if not self.append(ts, v):
                return

    def _ab(self):
        a = (self.lo.a + self.up.a) / 2.0
        b = (self.lo.b + self.up.b) / 2.0
        return a, b

    def size(self, buf):
        if self.n < 2:
            return float("nan")
        a, b = self._ab()
        for ts, v in buf[: self.n]:
            approx = float(F32(a * ts + b))
            if outside_percentage_error_bound(self.bound, approx, float(v)):
                return float("nan")
        if float(F32(a)) == a and float(F32(b)) == b:
            return 8.0
        if float(F32(a)) == a:
            return 12.0
        return 16.0

    def model(self, buf):
        return swing_model(*self._ab())


class _Gorilla:
    mtid = 4

    def __init__(self, bound, length_bound):
        self.length_bound = length_bound
        self.reset()

    def reset(self):
        self.vals = []

    @property
    def n(self):
        return len(self.vals)

    def append(self, ts, v):
        if self.n == self.length_bound:
            return False
        self.vals.append(v)
        return True

    def initialize(self, buf):
        self.reset()
        for ts, v in buf:
            self.append(ts, v)

    def size(self, buf):
        if self.n == 0:
            return float("nan")
        return float(len(gorilla_compress(np.array(self.vals, dtype=np.float32))))

    def model(self, buf):
        return gorilla_compress(np.array(self.vals, dtype=np.float32))


def oracle_fit_run(ts_ms, values, error_bound=0.0, length_bound=50):
    """Replays the reference's online loop; returns list of
    (start_ms, end_ms, mtid, model_bytes, n)."""
    buf: list[tuple[int, np.float32]] = []
    models = [_PMC(error_bound), _Swing(error_bound), _Gorilla(error_bound, length_bound)]
    idx = 0
    out = []
    values = np.asarray(values, dtype=np.float32)

    def ratio(m):
        if m.n == 0:
            return float("nan")
        return 16.0 * m.n / (24.0 + m.size(buf))

    def emit_final():
        nonlocal buf
        best = models[0]
        for m in models:
            if not (ratio(m) < ratio(best)):
                best = m
        if (ratio(best) != ratio(best)) or best.n == 0:
            n = min(len(buf), length_bound)
            model = raw_model(np.array([v for _, v in buf], dtype=np.float32), n)
            mtid = 1
        else:
            n = best.n
            model = best.model(buf)
            mtid = best.mtid
        out.append((buf[0][0], buf[n - 1][0], mtid, model, n))
        buf = buf[n:]

    def reset_cascade():
        nonlocal idx
        idx = 0
        models[0].initialize(buf)

    models[0].initialize(buf)
    for ts, v in zip(ts_ms, values):
        buf.append((int(ts), v))
        if not models[idx].append(int(ts), v):
            idx += 1
            if idx == len(models):
                for m in models:
                    m.initialize(buf)
                emit_final()
                reset_cascade()
            else:
                models[idx].initialize(buf)
    # flush (SegmentGenerator.flushBuffer)
    while buf:
        for m in models:
            m.initialize(buf)
        emit_final()
    return out
