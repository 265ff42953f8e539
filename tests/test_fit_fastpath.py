"""The vectorized fast paths in operators/fit.py (single-point runs ->
Gorilla, constant runs -> PMC) must be bit-identical to the plain
cascade output."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modelardb_spark.models import fit_run, segment_agg
from modelardb_spark.operators.fit import _COLS, _fit_group
from modelardb_spark.models.pmc_mean import pmc_value
from modelardb_spark.models.swing import swing_decode

INTERVAL = 60_000


def _naive(conv_id, metric, ts, vals, bound=0.0, length_bound=50):
    keep = ~np.isnan(vals)
    ts, vals = ts[keep], vals[keep]
    rows = []
    cuts = np.flatnonzero(np.diff(ts) > INTERVAL) + 1
    for rt, rv in zip(np.split(ts, cuts), np.split(vals, cuts)):
        for seg in fit_run(rt, rv, bound, length_bound):
            cnt, lo, hi, total = segment_agg(
                seg.mtid, seg.model, seg.start_ms, seg.end_ms, INTERVAL
            )
            rows.append(
                (seg.start_ms, seg.end_ms, seg.mtid, seg.model, seg.n, cnt,
                 np.float32(lo), np.float32(hi), total)
            )
    return sorted(rows)


@pytest.mark.parametrize("bound", [0.0, 5.0])
def test_fastpath_equals_cascade(bound):
    rng = np.random.default_rng(5)
    # mixture: isolated points, constant runs, linear runs, noise, gaps
    ts_parts, v_parts = [], []
    cur = 0
    for kind in ["single", "const", "linear", "noise", "single", "const"]:
        if kind == "single":
            n = 1
            v = rng.normal(10, 3, 1).astype(np.float32)
        elif kind == "const":
            n = int(rng.integers(2, 80))
            v = np.full(n, float(rng.integers(1, 9)), dtype=np.float32)
        elif kind == "linear":
            n = int(rng.integers(5, 60))
            v = (np.arange(n) * 0.5 + 3).astype(np.float32)
        else:
            n = int(rng.integers(5, 120))
            v = rng.normal(0, 50, n).astype(np.float32)
        ts_parts.append(cur + INTERVAL * np.arange(n, dtype=np.int64))
        v_parts.append(v)
        cur = int(ts_parts[-1][-1]) + INTERVAL * int(rng.integers(5, 50))  # gap
    ts = np.concatenate(ts_parts)
    vals = np.concatenate(v_parts)

    fit = _fit_group(bound, 50, INTERVAL)
    pdf = fit(("c", "m"), pd.DataFrame({"bin_ms": ts, "value": vals}))
    got = sorted(
        (
            int(r.start_ms), int(r.end_ms), int(r.mtid), bytes(r.model), int(r.n),
            int(r.seg_cnt), np.float32(r.seg_min), np.float32(r.seg_max),
            float(r.seg_sum),
        )
        for r in pdf.itertuples(index=False)
    )
    want = [
        (int(a), int(b), int(m), bytes(mo), int(n), int(c), lo, hi, float(s))
        for a, b, m, mo, n, c, lo, hi, s in _naive("c", "m", ts, vals, bound)
    ]
    assert got == want


def test_fastpath_params_match_model():
    fit = _fit_group(0.0, 50, INTERVAL)
    ts = INTERVAL * np.arange(10, dtype=np.int64)
    vals = np.full(10, 7.0, dtype=np.float32)
    pdf = fit(("c", "m"), pd.DataFrame({"bin_ms": ts, "value": vals}))
    assert len(pdf) == 1
    row = pdf.iloc[0]
    assert row.mtid == 2
    assert pmc_value(bytes(row.model)) == 7.0
    assert row.p0 == 7.0 and pd.isna(row.p1)
