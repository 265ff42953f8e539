"""Model-fitting operator: series points -> compressed segments.

The one genuinely custom operator of the engine (reference:
core/SegmentGenerator.java). Physical shape:

    series.repartition(conv_id, metric, salt)
          .sortWithinPartitions(conv_id, metric, salt, bin_ms)
          .mapInPandas(fit_batches)

rather than groupBy().applyInPandas(): a transcripts workload has a
huge number of *small* series groups (conversations), and per-group
Arrow round trips dominate. mapInPandas processes a whole 64k-row
Arrow batch of many groups in one Python call; group boundaries are
found vectorized, and a group split across two batches is stitched by
carrying the tail rows forward (batches arrive in partition-sort
order).

Scale design:
- **Salting**: the shuffle key includes ``salt = bin_ms div (salt_days
  * 86400000)``, so a mega-conversation with 10^6+ turns becomes many
  independent day-sized units instead of one straggler task
  (north-rule explicit skew handling; the reference balances load with
  CGA partitioning + dynamic group split/join instead,
  Partitioner.java:219-252, SegmentGenerator.java:296-351). Segments
  never span a salt boundary; at error bound 0 reconstruction is
  identical either way, and at higher bounds every point still
  satisfies the bound — only the compression ratio pays slightly.
- **Vectorized common cases**: single-point runs (the reference fold
  always picks Gorilla, whose 1-value stream is the raw 4 bytes) and
  exactly-constant runs (PMC always wins the fold for n >= 2) are
  emitted with pure NumPy across ALL groups in the batch; only
  genuinely mixed runs enter the per-run cascade.
- **Aggregate-on-model columns**: seg_cnt/min/max/sum and decoded
  model parameters (p0, p1) are materialized at fit time, so rollups
  and min/max/sum/avg queries are plain Catalyst aggregations and
  never re-enter Python for PMC/Swing segments (the reference's
  SparkUDAF.scala layer becomes schema design).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from modelardb_spark.config import DEFAULT_CONFIG, EngineConfig
from modelardb_spark.models import MTID_PMC, MTID_SWING, fit_run, segment_agg
from modelardb_spark.models.cascade import MTID_GORILLA
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


def _fit_sorted_block(
    conv: np.ndarray,
    metric: np.ndarray,
    salt: np.ndarray,
    ts: np.ndarray,
    vals: np.ndarray,
    error_bound: float,
    length_bound: int,
    interval_ms: int,
    out: dict[str, list],
) -> None:
    """Fit one NaN-free block sorted by (conv, metric, salt, bin_ms);
    groups and gap runs are delimited vectorized. A salt change breaks
    the run even without a time gap — that bound on fit-unit size is
    the whole point of salting (skewed long conversations)."""
    n = ts.size
    if n == 0:
        return
    grp_change = np.zeros(n, dtype=bool)
    grp_change[1:] = (
        (conv[1:] != conv[:-1])
        | (metric[1:] != metric[:-1])
        | (salt[1:] != salt[:-1])
    )
    run_break = grp_change.copy()
    run_break[1:] |= (ts[1:] - ts[:-1]) > interval_ms
    starts = np.flatnonzero(run_break)
    bounds = np.concatenate(([0], starts, [n])) if starts.size else np.array([0, n])
    bounds = np.unique(bounds)
    lens = np.diff(bounds)
    run_start = bounds[:-1]
    run_end_incl = bounds[1:] - 1

    # vectorized per-run min/max to classify constant runs
    rmin = np.minimum.reduceat(vals, run_start)
    rmax = np.maximum.reduceat(vals, run_start)

    singles = lens == 1
    constants = (~singles) & (rmin == rmax)
    general = ~(singles | constants)

    # --- case A: single-point runs -> Gorilla (reference fold result) ---
    if singles.any():
        idx = run_start[singles]
        sv = vals[idx]
        sb = sv.astype(">f4").tobytes()
        st = ts[idx]
        m = idx.size
        out["conv_id"].append(conv[idx])
        out["metric"].append(metric[idx])
        out["start_ms"].append(st)
        out["end_ms"].append(st)
        out["mtid"].append(np.full(m, MTID_GORILLA, dtype=np.int32))
        out["model"].append([sb[4 * i : 4 * i + 4] for i in range(m)])
        out["n"].append(np.ones(m, dtype=np.int64))
        out["seg_cnt"].append(np.ones(m, dtype=np.int64))
        out["seg_min"].append(sv)
        out["seg_max"].append(sv)
        out["seg_sum"].append(sv.astype(np.float64))
        out["p0"].append(np.full(m, np.nan))
        out["p1"].append(np.full(m, np.nan))

    # --- case B: constant runs (n >= 2) -> one PMC segment each ---
    if constants.any():
        idx = np.flatnonzero(constants)
        cs = run_start[idx]
        ce = run_end_incl[idx]
        cv = vals[cs]
        cb = cv.astype(">f4").tobytes()
        cl = lens[idx]
        m = idx.size
        out["conv_id"].append(conv[cs])
        out["metric"].append(metric[cs])
        out["start_ms"].append(ts[cs])
        out["end_ms"].append(ts[ce])
        out["mtid"].append(np.full(m, MTID_PMC, dtype=np.int32))
        out["model"].append([cb[4 * i : 4 * i + 4] for i in range(m)])
        out["n"].append(cl.astype(np.int64))
        out["seg_cnt"].append(cl.astype(np.int64))
        out["seg_min"].append(cv)
        out["seg_max"].append(cv)
        out["seg_sum"].append(cv.astype(np.float64) * cl)
        out["p0"].append(cv.astype(np.float64))
        out["p1"].append(np.full(m, np.nan))

    # --- case C: the full cascade per remaining run ---
    if general.any():
        g_conv, g_metric = [], []
        g_start, g_end, g_mtid, g_model = [], [], [], []
        g_n, g_min, g_max, g_sum, g_p0, g_p1 = [], [], [], [], [], []
        for ridx in np.flatnonzero(general):
            s, e = run_start[ridx], run_end_incl[ridx] + 1
            run_t = ts[s:e]
            run_v = vals[s:e]
            cid = conv[s]
            met = metric[s]
            pos = 0
            for seg in fit_run(run_t, run_v, error_bound, length_bound):
                if seg.mtid == MTID_PMC:
                    p0, p1 = float(pmc_value(seg.model)), np.nan
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
                    # source slice equal aggregates from the decode
                    p0, p1 = np.nan, np.nan
                    sl = run_v[pos : pos + seg.n]
                    cnt = seg.n
                    lo, hi = float(sl.min()), float(sl.max())
                    total = float(sl.sum(dtype=np.float64))
                g_conv.append(cid)
                g_metric.append(met)
                g_start.append(seg.start_ms)
                g_end.append(seg.end_ms)
                g_mtid.append(seg.mtid)
                g_model.append(seg.model)
                g_n.append(seg.n)
                g_min.append(np.float32(lo))
                g_max.append(np.float32(hi))
                g_sum.append(total)
                g_p0.append(p0)
                g_p1.append(p1)
                pos += seg.n
        if g_n:
            out["conv_id"].append(np.asarray(g_conv, dtype=object))
            out["metric"].append(np.asarray(g_metric, dtype=object))
            out["start_ms"].append(np.asarray(g_start, dtype=np.int64))
            out["end_ms"].append(np.asarray(g_end, dtype=np.int64))
            out["mtid"].append(np.asarray(g_mtid, dtype=np.int32))
            out["model"].append(g_model)
            out["n"].append(np.asarray(g_n, dtype=np.int64))
            out["seg_cnt"].append(np.asarray(g_n, dtype=np.int64))
            out["seg_min"].append(np.asarray(g_min, dtype=np.float32))
            out["seg_max"].append(np.asarray(g_max, dtype=np.float32))
            out["seg_sum"].append(np.asarray(g_sum, dtype=np.float64))
            out["p0"].append(np.asarray(g_p0, dtype=np.float64))
            out["p1"].append(np.asarray(g_p1, dtype=np.float64))


def _flush(out: dict[str, list], interval_ms: int) -> pd.DataFrame | None:
    if not out["n"]:
        return None
    model_col: list[bytes] = []
    for chunk in out["model"]:
        model_col.extend(chunk)
    total = len(model_col)
    df = pd.DataFrame(
        {
            "conv_id": np.concatenate(out["conv_id"]),
            "metric": np.concatenate(out["metric"]),
            "start_ms": np.concatenate(out["start_ms"]).astype(np.int64),
            "end_ms": np.concatenate(out["end_ms"]).astype(np.int64),
            "interval_ms": np.full(total, interval_ms, dtype=np.int64),
            "mtid": np.concatenate(out["mtid"]).astype(np.int32),
            "model": model_col,
            "n": np.concatenate(out["n"]).astype(np.int64),
            "seg_cnt": np.concatenate(out["seg_cnt"]).astype(np.int64),
            "seg_min": np.concatenate(out["seg_min"]).astype(np.float32),
            "seg_max": np.concatenate(out["seg_max"]).astype(np.float32),
            "seg_sum": np.concatenate(out["seg_sum"]).astype(np.float64),
            "p0": np.concatenate(out["p0"]).astype(np.float64),
            "p1": np.concatenate(out["p1"]).astype(np.float64),
        },
        columns=_COLS,
    )
    for k in out:
        out[k] = []
    return df


def _fit_batches(error_bound: float, length_bound: int, interval_ms: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out: dict[str, list] = {c: [] for c in _COLS}
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            conv = pdf["conv_id"].to_numpy()
            metric = pdf["metric"].to_numpy()
            salt = pdf["salt"].to_numpy()
            # hold back the trailing (possibly incomplete) group; it is
            # stitched to the next batch of this partition
            key_change = np.zeros(len(pdf), dtype=bool)
            if len(pdf) > 1:
                key_change[1:] = (
                    (conv[1:] != conv[:-1])
                    | (metric[1:] != metric[:-1])
                    | (salt[1:] != salt[:-1])
                )
            boundaries = np.flatnonzero(key_change)
            if boundaries.size == 0:
                carry = pdf
                continue
            cut = boundaries[-1]
            carry = pdf.iloc[cut:]
            head = pdf.iloc[:cut]
            ts = head["bin_ms"].to_numpy().astype(np.int64)
            vals = head["value"].to_numpy().astype(np.float32)
            keep = ~np.isnan(vals)
            _fit_sorted_block(
                conv[:cut][keep],
                metric[:cut][keep],
                salt[:cut][keep],
                ts[keep],
                vals[keep],
                error_bound,
                length_bound,
                interval_ms,
                out,
            )
            df = _flush(out, interval_ms)
            if df is not None:
                yield df
        if carry is not None and len(carry):
            ts = carry["bin_ms"].to_numpy().astype(np.int64)
            vals = carry["value"].to_numpy().astype(np.float32)
            keep = ~np.isnan(vals)
            _fit_sorted_block(
                carry["conv_id"].to_numpy()[keep],
                carry["metric"].to_numpy()[keep],
                carry["salt"].to_numpy()[keep],
                ts[keep],
                vals[keep],
                error_bound,
                length_bound,
                interval_ms,
                out,
            )
            df = _flush(out, interval_ms)
            if df is not None:
                yield df

    return run


def _fit_batches_wide(
    metrics: tuple[str, ...], error_bound: float, length_bound: int, interval_ms: int
):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out: dict[str, list] = {c: [] for c in _COLS}
        carry: pd.DataFrame | None = None

        def process(pdf: pd.DataFrame) -> None:
            conv = pdf["conv_id"].to_numpy()
            salt = pdf["salt"].to_numpy()
            ts = pdf["bin_ms"].to_numpy().astype(np.int64)
            for m in metrics:
                vals = pdf[m].to_numpy().astype(np.float32)
                keep = ~np.isnan(vals)
                _fit_sorted_block(
                    conv[keep],
                    np.full(int(keep.sum()), m, dtype=object),
                    salt[keep],
                    ts[keep],
                    vals[keep],
                    error_bound,
                    length_bound,
                    interval_ms,
                    out,
                )

        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            conv = pdf["conv_id"].to_numpy()
            salt = pdf["salt"].to_numpy()
            key_change = np.zeros(len(pdf), dtype=bool)
            if len(pdf) > 1:
                key_change[1:] = (conv[1:] != conv[:-1]) | (salt[1:] != salt[:-1])
            boundaries = np.flatnonzero(key_change)
            if boundaries.size == 0:
                carry = pdf
                continue
            cut = boundaries[-1]
            carry = pdf.iloc[cut:]
            process(pdf.iloc[:cut])
            df = _flush(out, interval_ms)
            if df is not None:
                yield df
        if carry is not None and len(carry):
            process(carry)
            df = _flush(out, interval_ms)
            if df is not None:
                yield df

    return run


def _fit_batches_turns(error_bound: float, length_bound: int, interval_ms: int):
    """Kernel for the FUSED derive+fit path: input rows are raw turns
    (conv_id, salt, bin_ms, tool_flag) sorted by (conv, salt, bin); the
    per-bin aggregation (turn_rate = count, tool_usage = sum of flags)
    happens vectorized here (one reduceat family), then the same
    `_fit_sorted_block` fits both metric columns. Output rows are
    identical to `_fit_batches_wide` over `derive_series_wide`."""

    def process(pdf: pd.DataFrame, out: dict[str, list]) -> None:
        n = len(pdf)
        if n == 0:
            return
        conv = pdf["conv_id"].to_numpy()
        salt = pdf["salt"].to_numpy()
        ts = pdf["bin_ms"].to_numpy().astype(np.int64)
        tool = pdf["tool_flag"].to_numpy().astype(np.int64)
        newbin = np.ones(n, dtype=bool)
        newbin[1:] = (
            (conv[1:] != conv[:-1])
            | (salt[1:] != salt[:-1])
            | (ts[1:] != ts[:-1])
        )
        bs = np.flatnonzero(newbin)
        counts = np.diff(np.concatenate((bs, [n])))
        tools = np.add.reduceat(tool, bs)
        bconv, bsalt, bts = conv[bs], salt[bs], ts[bs]
        for name, vals in (("turn_rate", counts), ("tool_usage", tools)):
            _fit_sorted_block(
                bconv,
                np.full(bs.size, name, dtype=object),
                bsalt,
                bts,
                vals.astype(np.float32),
                error_bound,
                length_bound,
                interval_ms,
                out,
            )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out: dict[str, list] = {c: [] for c in _COLS}
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            conv = pdf["conv_id"].to_numpy()
            salt = pdf["salt"].to_numpy()
            key_change = np.zeros(len(pdf), dtype=bool)
            if len(pdf) > 1:
                key_change[1:] = (conv[1:] != conv[:-1]) | (salt[1:] != salt[:-1])
            boundaries = np.flatnonzero(key_change)
            if boundaries.size == 0:
                carry = pdf
                continue
            cut = boundaries[-1]
            carry = pdf.iloc[cut:]
            process(pdf.iloc[:cut], out)
            df = _flush(out, interval_ms)
            if df is not None:
                yield df
        if carry is not None and len(carry):
            process(carry, out)
            df = _flush(out, interval_ms)
            if df is not None:
                yield df

    return run


def fit_segments_from_transcripts(
    transcripts: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """FUSED derive+fit: transcripts -> segments with ONE shuffle
    total.

    The two-step path (`derive_series_wide` then `fit_segments_wide`)
    pays two full exchanges of point-sized data: the derive hash
    aggregate shuffles on (conv_id, bin) and the fit repartition
    shuffles the bins again on (conv_id, salt). Because the fit kernel
    already walks rows sorted by (conv, salt, bin), the per-bin
    aggregation folds into it for free (one reduceat), so this path
    shuffles raw MINIMAL turn rows (conv_id, bin_ms, 1-byte tool flag)
    exactly once and never materializes the bins frame. Segment rows
    are identical to the two-step path (tests/test_fit_wide.py).

    Trade-off: with heavily bursty data (many turns per bin) the
    two-step path's map-side partial aggregation shrinks the shuffle
    more than the saved exchange; at the transcripts workload's ~1-2
    turns/bin the single exchange wins."""
    iv = cfg.interval_ms
    salt_ms = cfg.salt_days * 86_400_000
    rows = transcripts.select(
        "conv_id",
        (
            F.floor(F.unix_millis(F.col("ts").cast("timestamp")) / iv) * iv
        ).alias("bin_ms"),
        F.when(F.col("tool").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("tinyint")
        .alias("tool_flag"),
    ).withColumn("salt", (F.col("bin_ms") / F.lit(salt_ms)).cast("long"))
    num = cfg.shuffle_partitions or int(
        transcripts.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    arranged = rows.repartition(num, "conv_id", "salt").sortWithinPartitions(
        "conv_id", "salt", "bin_ms"
    )
    return arranged.mapInPandas(
        _fit_batches_turns(cfg.error_bound, cfg.length_bound, cfg.interval_ms),
        SEGMENT_SCHEMA,
    )


def fit_segments_wide(
    wide_series: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    metrics: tuple[str, ...] = ("turn_rate", "tool_usage"),
) -> DataFrame:
    """Wide-input fit (see derive_series_wide): one shuffled row per
    active bin carries every metric's value; Python fits each metric
    column over the shared timestamp grid. Output rows are identical to
    `fit_segments` on the unpivoted series."""
    salt_ms = cfg.salt_days * 86_400_000
    keyed = wide_series.withColumn(
        "salt", (F.col("bin_ms") / F.lit(salt_ms)).cast("long")
    )
    num = cfg.shuffle_partitions or int(
        wide_series.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    arranged = keyed.repartition(num, "conv_id", "salt").sortWithinPartitions(
        "conv_id", "salt", "bin_ms"
    )
    return arranged.mapInPandas(
        _fit_batches_wide(metrics, cfg.error_bound, cfg.length_bound, cfg.interval_ms),
        SEGMENT_SCHEMA,
    )


def fit_segments(
    series: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """series_points -> segments (SEGMENT_SCHEMA). One shuffle on the
    salted series key; fitting runs in sorted Arrow batches."""
    salt_ms = cfg.salt_days * 86_400_000
    keyed = series.withColumn(
        "salt", (F.col("bin_ms") / F.lit(salt_ms)).cast("long")
    )
    num = cfg.shuffle_partitions or int(
        series.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    arranged = keyed.repartition(num, "conv_id", "metric", "salt").sortWithinPartitions(
        "conv_id", "metric", "salt", "bin_ms"
    )
    return arranged.mapInPandas(
        _fit_batches(cfg.error_bound, cfg.length_bound, cfg.interval_ms),
        SEGMENT_SCHEMA,
    )
