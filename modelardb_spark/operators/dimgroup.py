"""Dimension-driven cross-entity grouping: the reference's Correlation
clause surface (core/Correlation.java:40-45 — group time series by
source name, by DIMENSION MEMBERS, by LCA level, or by distance;
applied at partition time in core/Partitioner.java:95-124), where a
group may span DIFFERENT sources.

Here the dimension table (operators/dimensions.py) supplies the clause:
every (conv_id, metric) series whose conversation carries the same
dimension member (e.g. channel='web') joins one group sharing the
1-minute bin grid. Groups are capped at `max_group_size` members via
stable sub-buckets (the reference leaves group size to the user's
clause; the cap bounds the interleave width — and therefore every
fit/decode matrix — regardless of how many conversations a member
value matches, which is what survives 100 TB).

Physical shape mirrors `fit_segments_grouped`: one shuffle keyed on
(group, salt-day), rows sorted by (bin, member), and — because members
within a bin arrive sorted by member index — a run of bins with a
stable active set is ALREADY the row-major interleaved payload, so the
fit consumes it with a plain reshape (no per-value Python). Active-set
change detection is a per-BIN comparison, not per-row.

Trade-off (documented, the reference shares it): grouping only pays
when members are actually aligned on the grid — sparse, weakly-
overlapping series fragment runs and pay the 4-bytes-per-absent-member
gap entries (ModelType.java:49-54), exactly as a bad user clause does
in the reference. tests/test_dimgroup.py shows the dense-aligned win
and the oracle pins exactness at bound 0 either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from modelardb_spark.config import DEFAULT_CONFIG, EngineConfig
from modelardb_spark.operators.groupfit import (
    GROUP_SEGMENT_SCHEMA,
    _GCOLS,
    _fit_group_run,
    _rollup_from_exploded,
)


def dim_group_members(
    series: DataFrame,
    dims: DataFrame,
    by: str = "channel",
    max_group_size: int = 8,
) -> DataFrame:
    """Member registry: (gkey, conv_id, metric, midx, gsize) — every
    series of a dimension-member group, with a stable member index.
    Groups larger than `max_group_size` split into deterministic
    sub-buckets (gkey = '<member>#<bucket>') so the interleave width is
    bounded. This is the engine's analogue of the reference's startup
    group formation (Partitioner.java:95-124) and is pure metadata —
    O(#series) rows."""
    m = (
        series.select("conv_id", "metric")
        .distinct()
        .join(F.broadcast(dims.select("conv_id", by)), "conv_id")
    )
    w = Window.partitionBy(by).orderBy("conv_id", "metric")
    m = (
        m.withColumn("rank0", F.row_number().over(w) - 1)
        .withColumn("bucket", (F.col("rank0") / max_group_size).cast("int"))
        .withColumn("gkey", F.concat_ws("#", F.col(by), F.col("bucket")))
        .withColumn("midx", (F.col("rank0") % max_group_size).cast("int"))
    )
    gsz = m.groupBy("gkey").agg(F.count("*").alias("gsize"))
    return m.join(gsz, "gkey").select("gkey", "conv_id", "metric", "midx", "gsize")


def materialize_members(members: DataFrame) -> DataFrame:
    """Collapse the member-registry lineage to a local relation.

    The registry is O(#series) metadata (five narrow columns), but its
    LINEAGE is a full series scan + distinct + a window + a group-size
    join — and every consumer re-evaluates it: the fit's equi-join AND
    the explode-side broadcast each replay the whole scan. Collecting
    the registry once and re-creating it as a local relation removes
    the duplicate series scans from every dimension-group plan. Same
    small-data posture as the broadcast `explode_dim_group_segments`
    already applies (fine to ~tens of millions of series); beyond
    that, skip this and pass broadcast_registry=False so the registry
    stays distributed end to end. The round trip is Arrow both ways
    (toPandas + createDataFrame-from-pandas) — a collect() of Row
    objects re-pickles per row and cannot sustain that scale."""
    spark = members.sparkSession
    return spark.createDataFrame(members.toPandas(), schema=members.schema)


def _expand_ranges(starts, lens):
    """Vectorized concatenation of integer ranges (see dedup)."""
    lens = np.asarray(lens, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    nz = lens > 0
    if not nz.all():
        starts, lens = starts[nz], lens[nz]
    n = int(lens.sum())
    if n == 0:
        return np.empty(0, dtype=np.int64)
    out = np.ones(n, dtype=np.int64)
    firsts = np.cumsum(lens) - lens
    out[firsts[0]] = starts[0]
    if starts.size > 1:
        out[firsts[1:]] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
    return np.cumsum(out)


def _fit_dim_group_batches(
    error_bound: float, length_bound: int, interval_ms: int
):
    """mapInPandas kernel over rows sorted by (gkey, salt, bin_ms,
    midx): split into runs of a stable active-member set, reshape each
    run's rows into the (T, K) interleaved matrix, and hand it to the
    shared group cascade.

    Round 7: run detection is fully vectorized (a uint64 member
    bitmask per bin replaces the per-bin Python comparison loop), and
    single-timestamp runs — the dominant shape on sparse-activity
    series — emit in bulk per member-count class with the lockstep
    Gorilla row encoder (`gorilla_compress_rows`), exactly like the
    conversation-group fast path; the reference fold always selects
    Gorilla for a 1-ts run (Swing's NaN ratio hands the fold on), so
    the bulk rows are byte-identical to the per-run cascade."""
    from modelardb_spark.models.cascade import MTID_GORILLA as _MTID_G
    from modelardb_spark.models.gorilla import gorilla_compress_rows

    def process(pdf: pd.DataFrame, out: dict[str, list]) -> list[pd.DataFrame]:
        n = len(pdf)
        if n == 0:
            return []
        gkey = pdf["gkey"].to_numpy()
        salt = pdf["salt"].to_numpy()
        ts = pdf["bin_ms"].to_numpy().astype(np.int64)
        midx = pdf["midx"].to_numpy().astype(np.int64)
        val = pdf["value"].to_numpy().astype(np.float32)
        gsize = pdf["gsize"].to_numpy().astype(np.int64)
        # bin boundaries: (gkey, salt, bin) change
        newbin = np.ones(n, dtype=bool)
        newbin[1:] = (
            (gkey[1:] != gkey[:-1])
            | (salt[1:] != salt[:-1])
            | (ts[1:] != ts[:-1])
        )
        bstart = np.flatnonzero(newbin)
        bend = np.concatenate((bstart[1:], [n]))
        n_bins = bstart.size
        bin_k = bend - bstart
        b_gkey = gkey[bstart]
        b_salt = salt[bstart]
        b_ts = ts[bstart]
        vector_ok = int(midx.max(initial=0)) < 64
        if vector_ok:
            # distinct member indexes per bin -> the power sum IS the
            # set bitmask, so mask equality == same active-member set
            b_mask = np.bitwise_or.reduceat(
                np.uint64(1) << midx.astype(np.uint64), bstart
            )
        else:  # arbitrarily large member indexes: no compact mask
            b_mask = np.zeros(n_bins, dtype=np.uint64)
        brk = np.ones(n_bins, dtype=bool)
        if n_bins > 1:
            brk[1:] = (
                (b_gkey[1:] != b_gkey[:-1])
                | (b_salt[1:] != b_salt[:-1])
                | ((b_ts[1:] - b_ts[:-1]) > interval_ms)
                | (bin_k[1:] != bin_k[:-1])
                | (b_mask[1:] != b_mask[:-1])
            )
            if not vector_ok:
                for i in range(1, n_bins):
                    if not brk[i] and not np.array_equal(
                        midx[bstart[i] : bend[i]],
                        midx[bstart[i - 1] : bend[i - 1]],
                    ):
                        brk[i] = True
        rb = np.flatnonzero(brk)
        run_lens = np.diff(np.append(rb, n_bins))
        singles = run_lens == 1
        bulk_frames: list[pd.DataFrame] = []
        if vector_ok and singles.any():
            sbin = rb[singles]  # bin index of each single-bin run
            gap_cache: dict[tuple[int, int], list[int]] = {}
            for k in np.unique(bin_k[sbin]):
                sel = sbin[bin_k[sbin] == k]
                k = int(k)
                m = sel.size
                ridx = _expand_ranges(bstart[sel], np.full(m, k))
                vm = val[ridx].reshape(m, k)
                tids_m = midx[ridx].reshape(m, k).tolist()
                gs = gsize[bstart[sel]]
                gaps_col = []
                for row_t, g in zip(tids_m, gs.tolist()):
                    key = (g, tuple(row_t))
                    gp = gap_cache.get(key)
                    if gp is None:
                        present = set(row_t)
                        gp = [t for t in range(g) if t not in present]
                        gap_cache[key] = gp
                    gaps_col.append(gp)
                vlist = vm.tolist()
                bulk_frames.append(
                    pd.DataFrame(
                        {
                            "conv_id": b_gkey[sel],
                            "start_ms": b_ts[sel],
                            "end_ms": b_ts[sel],
                            "interval_ms": np.full(m, interval_ms, dtype=np.int64),
                            "mtid": np.full(m, _MTID_G, dtype=np.int32),
                            "model": gorilla_compress_rows(vm),
                            "n": np.full(m, k, dtype=np.int64),
                            "group_size": np.full(m, k, dtype=np.int32),
                            "tids": tids_m,
                            "gaps": gaps_col,
                            "seg_cnt": [[1] * k] * m,
                            "seg_min": vlist,
                            "seg_max": vlist,
                            "seg_sum": vm.astype(np.float64).tolist(),
                            "p0": np.full(m, np.nan),
                            "p1": np.full(m, np.nan),
                        },
                        columns=_GCOLS,
                    )
                )
            loop_runs = np.flatnonzero(~singles)
        else:
            loop_runs = np.arange(run_lens.size)
        run_ends = np.append(rb, n_bins)[1:]
        for r in loop_runs:
            first_bin, last_bin = rb[r], run_ends[r] - 1
            r0, r1 = bstart[first_bin], bend[last_bin]
            k = int(bin_k[first_bin])
            t_run = b_ts[first_bin : last_bin + 1]
            vals2d = val[r0:r1].reshape(-1, k)
            tids = [int(x) for x in midx[bstart[first_bin] : bend[first_bin]]]
            _fit_group_run(
                gkey[r0],
                t_run,
                vals2d,
                tids,
                list(range(int(gsize[r0]))),
                error_bound,
                length_bound,
                interval_ms,
                out,
            )
        return bulk_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out: dict[str, list] = {c: [] for c in _GCOLS}
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            gk = pdf["gkey"].to_numpy()
            salt = pdf["salt"].to_numpy()
            key_change = np.zeros(len(pdf), dtype=bool)
            if len(pdf) > 1:
                key_change[1:] = (gk[1:] != gk[:-1]) | (salt[1:] != salt[:-1])
            boundaries = np.flatnonzero(key_change)
            if boundaries.size == 0:
                carry = pdf
                continue
            cut = boundaries[-1]
            carry = pdf.iloc[cut:]
            bulk = process(pdf.iloc[:cut], out)
            if out["n"]:
                yield pd.DataFrame({c: out[c] for c in _GCOLS}, columns=_GCOLS)
                out = {c: [] for c in _GCOLS}
            yield from bulk
        if carry is not None and len(carry):
            bulk = process(carry, out)
            if out["n"]:
                yield pd.DataFrame({c: out[c] for c in _GCOLS}, columns=_GCOLS)
            yield from bulk

    return run


def fit_segments_dim_grouped(
    series: DataFrame,
    members: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Narrow series (conv_id, metric, bin_ms, value) + member registry
    -> GROUP segments whose `conv_id` column holds the group key. One
    shuffle, keyed on (gkey, salt-day) with the usual day salting, so a
    hot dimension member never exceeds one day x `max_group_size`
    members per task."""
    salt_ms = cfg.salt_days * 86_400_000
    rows = (
        series.join(members, ["conv_id", "metric"])
        .withColumn("salt", (F.col("bin_ms") / F.lit(salt_ms)).cast("long"))
        .select("gkey", "salt", "bin_ms", "midx", "value", "gsize")
    )
    num = cfg.shuffle_partitions or int(
        series.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    arranged = rows.repartition(num, "gkey", "salt").sortWithinPartitions(
        "gkey", "salt", "bin_ms", "midx"
    )
    return arranged.mapInPandas(
        _fit_dim_group_batches(cfg.error_bound, cfg.length_bound, cfg.interval_ms),
        GROUP_SEGMENT_SCHEMA,
    )


def explode_dim_group_segments(
    gseg: DataFrame, members: DataFrame, broadcast_registry: bool = True
) -> DataFrame:
    """Group segment -> one logical segment per present member, mapped
    back to its real (conv_id, metric) through the registry
    (SegmentGroup.explode:51-111 with the reference's gid -> tid
    mapping). `ukey` keeps the group key so the decoder still collapses
    one payload per group row.

    The registry is O(#series) metadata; broadcast it (default) while
    it fits executor memory (~tens of millions of series). Beyond
    that, pass False — the join then shuffles on (gkey, tid), a key
    the exploded side is already clustered by."""
    e = gseg.select(
        F.col("conv_id").alias("gkey"),
        "start_ms",
        "end_ms",
        "interval_ms",
        "mtid",
        "model",
        "group_size",
        "p0",
        "p1",
        F.posexplode("tids").alias("goff", "tid"),
        "seg_cnt",
        "seg_min",
        "seg_max",
        "seg_sum",
    )
    reg = members.select(
        "gkey", F.col("midx").alias("tid"), "conv_id", "metric"
    )
    if broadcast_registry:
        reg = F.broadcast(reg)
    return (
        e.join(reg, ["gkey", "tid"])
        .select(
            "conv_id",
            "metric",
            "start_ms",
            "end_ms",
            "interval_ms",
            "mtid",
            "model",
            F.element_at("seg_cnt", F.col("goff") + 1).alias("seg_cnt"),
            F.element_at("seg_min", F.col("goff") + 1).alias("seg_min"),
            F.element_at("seg_max", F.col("goff") + 1).alias("seg_max"),
            F.element_at("seg_sum", F.col("goff") + 1).alias("seg_sum"),
            "p0",
            "p1",
            "goff",
            F.col("group_size").alias("gsize"),
            F.col("gkey").alias("ukey"),
        )
    )


def rollup_from_dim_group_segments(
    gseg: DataFrame,
    members: DataFrame,
    window_ms: int,
    broadcast_registry: bool = True,
) -> DataFrame:
    """Windowed rollup straight from dimension-group segments — the
    shared analytic/dense tail over the registry-mapped explode."""
    return _rollup_from_exploded(
        explode_dim_group_segments(gseg, members, broadcast_registry), window_ms
    )
