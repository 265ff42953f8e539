"""Model-fitting operator: series points -> compressed segments.

The one genuinely custom operator of the engine (reference:
core/SegmentGenerator.java). Expressed as
``groupBy(conv_id, metric, salt).applyInPandas(fit)`` — one shuffle on
the series key, NumPy-vectorized cascade inside, Arrow batch transfer.

Scale design:
- **Salting**: the group key includes ``salt = bin_ms div (salt_days
  * 86400000)``, so a mega-conversation with 10^6+ turns is fit as many
  independent day-sized tasks instead of one straggler (north-rule
  explicit skew handling; the reference balances load with CGA
  partitioning + dynamic group splitting instead,
  Partitioner.java:219-252, SegmentGenerator.java:296-351). Segments
  never span a salt boundary; at error bound 0 the reconstruction is
  identical either way, and at higher bounds every point still
  satisfies the bound — only the compression ratio pays a little.
- **Aggregate-on-model columns**: seg_cnt/min/max/sum and the decoded
  model parameters (p0, p1) are materialized at fit time, so rollups
  and min/max/sum/avg queries are plain Catalyst aggregations on the
  segments table and never re-enter Python for PMC/Swing segments
  (the reference's SparkUDAF.scala layer becomes schema design).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    FloatType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from modelardb_spark.config import DEFAULT_CONFIG, EngineConfig
from modelardb_spark.models import MTID_PMC, MTID_SWING, fit_run, segment_agg
from modelardb_spark.models.pmc_mean import pmc_value
from modelardb_spark.models.swing import swing_decode

SEGMENT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("metric", StringType(), False),
        StructField("start_ms", LongType(), False),
        StructField("end_ms", LongType(), False),
        StructField("interval_ms", LongType(), False),
        StructField("mtid", IntegerType(), False),
        StructField("model", BinaryType(), False),
        StructField("n", LongType(), False),
        StructField("seg_cnt", LongType(), False),
        StructField("seg_min", FloatType(), False),
        StructField("seg_max", FloatType(), False),
        StructField("seg_sum", DoubleType(), False),
        # decoded model parameters for JVM-side grid/rollup:
        # PMC: p0 = constant; Swing: p0 = slope a, p1 = intercept b
        StructField("p0", DoubleType(), True),
        StructField("p1", DoubleType(), True),
    ]
)


_COLS = [f.name for f in SEGMENT_SCHEMA.fields]


def _fit_group(
    error_bound: float, length_bound: int, interval_ms: int
):
    from modelardb_spark.models.cascade import MTID_GORILLA

    def fit(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        conv_id, metric = key[0], key[1]
        order = np.argsort(pdf["bin_ms"].to_numpy(), kind="stable")
        ts = pdf["bin_ms"].to_numpy()[order].astype(np.int64)
        vals = pdf["value"].to_numpy()[order].astype(np.float32)
        # drop NaN bins (explicit gap markers)
        keep = ~np.isnan(vals)
        ts, vals = ts[keep], vals[keep]
        out: dict[str, list] = {c: [] for c in _COLS}

        def emit(start, end, mtid, model, n, cnt, lo, hi, total, p0, p1):
            out["conv_id"].append(conv_id)
            out["metric"].append(metric)
            out["start_ms"].append(start)
            out["end_ms"].append(end)
            out["interval_ms"].append(interval_ms)
            out["mtid"].append(mtid)
            out["model"].append(model)
            out["n"].append(n)
            out["seg_cnt"].append(cnt)
            out["seg_min"].append(np.float32(lo))
            out["seg_max"].append(np.float32(hi))
            out["seg_sum"].append(total)
            out["p0"].append(p0)
            out["p1"].append(p1)

        if ts.size:
            # split into gap-free runs: jump > interval starts a new run
            # (SegmentGenerator.java:131-148 gap semantics)
            cuts = np.flatnonzero(np.diff(ts) > interval_ms) + 1
            run_bounds = np.concatenate(([0], cuts, [ts.size]))

            # fast path 1: single-point runs. The reference fold on a
            # 1-point buffer always selects Gorilla (Swing's NaN ratio
            # shadows PMC, then Gorilla wins the tie) and the Gorilla
            # stream of one value is its raw 4 bytes big-endian — emit
            # vectorized without entering the cascade.
            lens = np.diff(run_bounds)
            single = run_bounds[:-1][lens == 1]
            if single.size:
                sv = vals[single]
                sb = sv.astype(">f4").tobytes()
                st = ts[single]
                for i in range(single.size):
                    v = float(sv[i])
                    emit(
                        int(st[i]), int(st[i]), MTID_GORILLA,
                        sb[4 * i : 4 * i + 4], 1, 1, v, v, v, None, None,
                    )

            for start, n in zip(run_bounds[:-1], lens):
                if n == 1:
                    continue
                run_t = ts[start : start + n]
                run_v = vals[start : start + n]
                # fast path 2: exactly constant run -> single PMC segment
                # (PMC always wins the fold on a constant run of n >= 2;
                # float32(sum/n) == the value, bit-identical model)
                if (run_v == run_v[0]).all():
                    v = float(run_v[0])
                    emit(
                        int(run_t[0]), int(run_t[-1]), MTID_PMC,
                        struct.pack(">f", run_v[0]), int(n), int(n),
                        v, v, v * n, v, None,
                    )
                    continue
                pos = 0
                for seg in fit_run(run_t, run_v, error_bound, length_bound):
                    if seg.mtid == MTID_PMC:
                        p0, p1 = float(pmc_value(seg.model)), None
                        cnt, lo, hi, total = segment_agg(
                            seg.mtid, seg.model, seg.start_ms, seg.end_ms, interval_ms
                        )
                    elif seg.mtid == MTID_SWING:
                        a, b = swing_decode(seg.model)
                        p0, p1 = float(a), float(b)
                        cnt, lo, hi, total = segment_agg(
                            seg.mtid, seg.model, seg.start_ms, seg.end_ms, interval_ms
                        )
                    else:
                        # Gorilla and raw are lossless: aggregates from the
                        # source slice equal aggregates from the decoded
                        # model — skip the round trip
                        p0, p1 = None, None
                        sl = run_v[pos : pos + seg.n]
                        cnt = seg.n
                        lo, hi = float(sl.min()), float(sl.max())
                        total = float(sl.sum(dtype=np.float64))
                    emit(
                        seg.start_ms, seg.end_ms, seg.mtid, seg.model,
                        seg.n, cnt, lo, hi, total, p0, p1,
                    )
                    pos += seg.n
        return pd.DataFrame(out, columns=_COLS)

    return fit


def fit_segments(
    series: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """series_points -> segments (SEGMENT_SCHEMA)."""
    salt_ms = cfg.salt_days * 86_400_000
    keyed = series.withColumn(
        "salt", (F.col("bin_ms") / F.lit(salt_ms)).cast("long")
    )
    return keyed.groupBy("conv_id", "metric", "salt").applyInPandas(
        _fit_group(cfg.error_bound, cfg.length_bound, cfg.interval_ms),
        SEGMENT_SCHEMA,
    )
