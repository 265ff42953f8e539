"""Physical-plan assertions: the scale-design claims hold in the
actual Catalyst plans, not just in docstrings.

- column pruning reaches the parquet scan (a 2-column projection must
  not read the text payload);
- dimension predicates route through a broadcast join (never a
  shuffle of the fact side);
- segment-bound restriction pushes min/max filters into the parquet
  scan of a stored segments table;
- the rollup aggregation is a partial/final hash aggregate pair (one
  exchange), not a sort-based or multi-exchange plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modelardb_spark.config import EngineConfig
from modelardb_spark.operators.fit import fit_segments_wide
from modelardb_spark.operators.grid import restrict
from modelardb_spark.operators.rollup import HOUR_MS, rollup_from_segments
from modelardb_spark.operators.series import derive_series_wide
from modelardb_spark.operators.transcripts import transcripts_from_events


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_series_scan_prunes_text_columns(spark, sf_small):
    """Deriving series needs (user_id, ts, event_type); the scan's
    ReadSchema must not include the text payload column."""
    series = derive_series_wide(
        transcripts_from_events(spark, sf_small), EngineConfig()
    )
    plan = _plan(series)
    scan = plan[plan.index("ReadSchema"):][:400]
    assert "props" not in scan, scan
    assert "ts" in scan


def test_dim_restrict_is_broadcast(spark, sf_small, tmp_path):
    from modelardb_spark.operators.dimensions import (
        conversation_dimensions,
        dim_restrict,
    )

    # store the segments first so the ONLY possible exchange in the
    # restricted plan would be a join-induced one
    seg = fit_segments_wide(
        derive_series_wide(transcripts_from_events(spark, sf_small)),
    )
    p = str(tmp_path / "dimseg")
    seg.write.parquet(p)
    stored = spark.read.parquet(p)
    # literal dims frame: the dim side then contributes no exchange of
    # its own, so ANY hash-partition exchange in the plan would be a
    # fact-side shuffle — exactly what must not happen
    convs = [r[0] for r in conversation_dimensions(stored).collect()]
    dims = spark.createDataFrame(
        [(c, "web" if i % 2 == 0 else "api") for i, c in enumerate(sorted(convs))],
        "conv_id string, channel string",
    )
    plan = _plan(dim_restrict(stored, dims, channel="web"))
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan


def test_restrict_pushes_bounds_to_parquet(spark, sf_small, tmp_path):
    seg = fit_segments_wide(
        derive_series_wide(transcripts_from_events(spark, sf_small)),
    )
    p = str(tmp_path / "segtable")
    seg.write.parquet(p)
    stored = spark.read.parquet(p)
    plan = _plan(restrict(stored, 1_704_672_000_000, 1_705_276_799_999))
    pushed = plan[plan.index("PushedFilters"):][:300]
    assert "end_ms" in pushed and "start_ms" in pushed, pushed


def test_fused_fit_is_single_exchange(spark, sf_small):
    """The FUSED derive+fit must shuffle exactly once (the fit
    repartition) with no hash-aggregate stage at all — the two-step
    path pays a derive aggregation exchange on top."""
    from modelardb_spark.operators.fit import fit_segments_from_transcripts

    # cached frames from other modules would splice InMemoryRelations
    # into these plans and change the exchange counts
    spark.catalog.clearCache()
    fused = _plan(
        fit_segments_from_transcripts(
            transcripts_from_events(spark, sf_small), EngineConfig()
        )
    )
    assert fused.count("Exchange hashpartitioning") == 1, fused
    assert "HashAggregate" not in fused
    two_step = _plan(
        fit_segments_wide(
            derive_series_wide(transcripts_from_events(spark, sf_small)),
        )
    )
    assert two_step.count("Exchange hashpartitioning") == 2
    # and the fused scan still prunes the text payload
    scan = fused[fused.index("ReadSchema"):][:400]
    assert "props" not in scan, scan


def test_data_points_tvf_pushes_window_to_scan(spark, sf_small, tmp_path):
    """The DATA_POINTS(lo, hi) table function (ViewDataPoint rewrite)
    must push the segment-overlap bounds into the parquet scan — the
    window never decodes out-of-range segments — and must agree with
    the DataFrame-API restrict+grid path."""
    from modelardb_spark.operators.grid import grid, restrict
    from modelardb_spark.operators.sqlfunctions import register_sql_functions

    lo, hi = 1_704_672_000_000, 1_705_276_799_999
    seg = fit_segments_wide(
        derive_series_wide(transcripts_from_events(spark, sf_small)),
    )
    p = str(tmp_path / "segtvf")
    seg.write.parquet(p)
    spark.read.parquet(p).createOrReplaceTempView("segments")
    register_sql_functions(spark)
    df = spark.sql(f"SELECT * FROM DATA_POINTS({lo}, {hi})")
    plan = _plan(df)
    pushed = plan[plan.index("PushedFilters"):][:300]
    assert "end_ms" in pushed and "start_ms" in pushed, pushed
    api = grid(restrict(spark.read.parquet(p), lo, hi)).where(
        (F.col("bin_ms") >= lo) & (F.col("bin_ms") <= hi)
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, api.collect()))


def test_rollup_is_single_hash_agg_pair(spark, sf_small, tmp_path):
    """From a STORED segments table, the 1h rollup plan is scan ->
    map-side partials -> ONE exchange -> final hash aggregate; no
    sort-aggregate, no extra exchange."""
    seg = fit_segments_wide(
        derive_series_wide(transcripts_from_events(spark, sf_small)),
    )
    p = str(tmp_path / "segtable2")
    seg.write.parquet(p)
    stored = spark.read.parquet(p)
    plan = _plan(rollup_from_segments(stored, HOUR_MS))
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan
    # one exchange for the final aggregation (the union's two branches
    # feed the same hash partitioning); AQE may render it as one node
    assert plan.count("Exchange hashpartitioning") <= 2, plan.count(
        "Exchange hashpartitioning"
    )


def test_segment_sql_aggregates_decompose_partial_final(spark, sf_small, tmp_path):
    """segment_sql rewrites the *_S aggregates into built-in aggregates
    over per-segment SEG_AGG partials: the plan must be a partial/final
    HashAggregate pair (map-side partials below the exchange, like the
    reference's Aggregators, SparkUDAF.scala:37-51), with ONE deduped
    ArrowEvalPython evaluation and no complete-mode AggregateInPandas
    shipping a group's segment rows to one task."""
    from modelardb_spark.operators.sqlfunctions import (
        register_sql_functions,
        segment_sql,
    )

    seg = fit_segments_wide(
        derive_series_wide(transcripts_from_events(spark, sf_small)),
    )
    p = str(tmp_path / "segsqlagg")
    seg.write.parquet(p)
    spark.read.parquet(p).createOrReplaceTempView("segments")
    register_sql_functions(spark)
    df = segment_sql(
        spark,
        """
        SELECT conv_id, COUNT_S(#) AS cnt, MIN_S(#) AS vmin,
               MAX_S(#) AS vmax, SUM_S(#) AS vsum, AVG_S(#) AS mean
        FROM segments GROUP BY conv_id
        """,
    )
    plan = _plan(df)
    assert "AggregateInPandas" not in plan, plan
    assert plan.count("HashAggregate") == 2, plan
    assert plan.count("ArrowEvalPython") == 1, plan
    # the five aggregates share ONE SEG_AGG evaluation (deduped):
    # each segment decodes once, map-side
    assert plan.count("SEG_AGG") == 1, plan
    # and the UDF runs below the exchange (partial side)
    ex = plan.index("Exchange hashpartitioning")
    assert plan.index("ArrowEvalPython") > ex, "UDF must be below the exchange"


def test_segment_sql_count_restrict_is_pure_jvm(spark, sf_small, tmp_path):
    """COUNT_S decomposes to pure-SQL SUM arithmetic: a restriction +
    count query contains no Python evaluation node at all."""
    from modelardb_spark.operators.sqlfunctions import (
        register_sql_functions,
        segment_sql,
    )

    seg = fit_segments_wide(
        derive_series_wide(transcripts_from_events(spark, sf_small)),
    )
    p = str(tmp_path / "segsqlcnt")
    seg.write.parquet(p)
    spark.read.parquet(p).createOrReplaceTempView("segments")
    register_sql_functions(spark)
    lo, hi = 1_704_672_000_000, 1_705_276_799_999
    df = segment_sql(
        spark,
        f"""
        SELECT conv_id, COUNT_S(se.s, se.e, interval_ms) AS cnt
        FROM (
          SELECT conv_id, interval_ms,
                 START_END(start_ms, end_ms, interval_ms, {lo}, {hi}) AS se
          FROM segments WHERE end_ms >= {lo} AND start_ms <= {hi}
        ) GROUP BY conv_id
        """,
    )
    plan = _plan(df)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
    # (AQE prints isFinalPlan=false pre-execution, so codegen spans
    # aren't visible here; no-Python + hash aggregation is the claim)
    assert "HashAggregate" in plan


def test_avg_s_alone_dedupes_its_two_seg_agg_occurrences(spark, sf_small, tmp_path):
    """AVG_S rewrites to SUM(SEG_AGG(...).vsum) / SUM(SEG_AGG(...).cnt)
    — textually TWO SEG_AGG calls; Catalyst must collapse them to one
    ArrowEvalPython evaluation (each segment decodes once)."""
    from modelardb_spark.operators.sqlfunctions import (
        register_sql_functions,
        segment_sql,
    )

    seg = fit_segments_wide(
        derive_series_wide(transcripts_from_events(spark, sf_small)),
    )
    p = str(tmp_path / "avgsolo")
    seg.write.parquet(p)
    spark.read.parquet(p).createOrReplaceTempView("segments")
    register_sql_functions(spark)
    df = segment_sql(
        spark,
        "SELECT conv_id, AVG_S(#) AS mean FROM segments GROUP BY conv_id",
    )
    plan = _plan(df)
    assert plan.count("SEG_AGG") == 1, plan
    assert plan.count("ArrowEvalPython") == 1, plan


def test_duplicate_clusters_severs_lsh_lineage(spark, sf_small):
    """The connected-components step must NOT replay the LSH pair
    pipeline per consumer: the edge frame is localCheckpointed up
    front, so the final plan sees either a LocalTableScan (the
    size-gated driver fast path: labels arrive as a local relation)
    or an ExistingRDD scan (the distributed loop) — no shingle
    explode, minhash aggregation, or band self-join may appear in
    it — and it must contain no cartesian product."""
    from modelardb_spark.operators.dedup import (
        duplicate_clusters,
        minhash_lsh_pairs,
    )
    from modelardb_spark.operators.textstats import load_documents

    docs = load_documents(spark, sf_small)
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.35)
    plan = _plan(duplicate_clusters(pairs, docs))
    assert "CartesianProduct" not in plan
    assert "LocalTableScan" in plan
    for marker in ("posexplode", "band_hash", "shingle"):
        assert marker not in plan, f"LSH lineage leaked into plan: {marker}"
    # the distributed loop (past the size gate) must sever the lineage
    # the same way via the checkpointed edge RDD
    plan_d = _plan(duplicate_clusters(pairs, docs, max_local_edges=0))
    assert "CartesianProduct" not in plan_d
    assert "ExistingRDD" in plan_d or "Scan ExistingRDD" in plan_d
    for marker in ("posexplode", "band_hash", "shingle"):
        assert marker not in plan_d, f"LSH lineage leaked into plan: {marker}"


def test_fused_partials_match_branch_partials(spark):
    """The round-7 fused rollup kernel (dense decode + NumPy closed
    forms in one pass) must produce bit-identical partials to the
    two-branch plan (Catalyst closed forms ∪ dense decode) — including
    the SWING closed forms, which the driver fixtures never produce
    (they contain only PMC/Gorilla segments)."""
    import numpy as np

    from modelardb_spark.models.gorilla import gorilla_compress
    from modelardb_spark.operators.rollup import (
        HOUR_MS,
        _analytic_partials,
        _dense_partials,
        _fused_partials,
    )

    iv = 60_000
    base = 1_704_672_000_000
    rows = []
    rng = np.random.default_rng(5)
    for i in range(40):
        s = base + i * 37 * iv
        n = int(rng.integers(1, 200))
        e = s + (n - 1) * iv
        kind = i % 3
        if kind == 0:  # PMC
            rows.append(("c%d" % (i % 5), "m", s, e, iv, 2, b"\x00" * 4,
                         float(rng.normal()), float("nan")))
        elif kind == 1:  # SWING — slopes incl. 0, +, -
            slope = [0.0, 1.7e-7, -2.3e-7][i % 3 if i % 9 else 0]
            slope = float(rng.choice([0.0, 2.5e-7, -1.5e-7]))
            rows.append(("c%d" % (i % 5), "m", s, e, iv, 3, b"\x00" * 4,
                         slope, float(rng.normal() * 10)))
        else:  # GORILLA
            vals = rng.normal(size=n).astype(np.float32)
            rows.append(("c%d" % (i % 5), "m", s, e, iv, 4,
                         gorilla_compress(vals), float("nan"), float("nan")))
    seg = spark.createDataFrame(
        rows,
        "conv_id string, metric string, start_ms long, end_ms long, "
        "interval_ms long, mtid int, model binary, p0 double, p1 double",
    )

    def snap(df):
        return sorted(
            tuple(repr(x) if isinstance(x, float) else x for x in r)
            for r in df.collect()
        )

    fused = snap(_fused_partials(seg, HOUR_MS))
    branched = snap(
        _analytic_partials(seg, HOUR_MS).unionByName(
            _dense_partials(seg, HOUR_MS)
        )
    )
    assert len(fused) > 0
    assert fused == branched
