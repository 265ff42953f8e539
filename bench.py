"""Benchmark harness.

Default mode (what the driver runs): full pipeline + headline queries
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "turns_per_sec": ..., "synthetic_turns": ...}

The headline number is ingested-to-rolled-up throughput (turns/sec) on
a deterministic synthetic transcripts table (BASELINE.json metric),
measured over derive -> gap-split -> fit -> segments -> 1m/1h/1d
rollups, all materialized.

--scaling: runs the same headline pipeline at local[8] and local[32]
(the sandbox stand-in for N vs 4N executors) and reports both
throughputs + efficiency = (T_N8 / T_N32) / 4.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SYN_CONVS = int(os.environ.get("BENCH_CONVS", "2000"))
SYN_TURNS = int(os.environ.get("BENCH_TURNS_PER_CONV", "1000"))


def _spark(cores: str):
    from modelardb_spark.session import get_spark

    s = get_spark(
        master=f"local[{cores}]",
        shuffle_partitions=int(cores) * 2,
        app_name=f"bench-{cores}",
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def headline_pipeline(spark) -> tuple[int, float]:
    """Synthetic transcripts -> rollup tiers; returns (turns, seconds)."""
    from pyspark.sql import functions as F

    from modelardb_spark.operators.fit import fit_segments
    from modelardb_spark.operators.rollup import (
        DAY_MS,
        HOUR_MS,
        MINUTE_MS,
        rollup_cascade,
        rollup_from_segments,
    )
    from modelardb_spark.operators.series import derive_series
    from modelardb_spark.operators.transcripts import synthetic_transcripts

    t = synthetic_transcripts(
        spark, n_convs=SYN_CONVS, turns_per_conv=SYN_TURNS, mega_convs=4, mega_factor=25
    )
    t = t.persist()
    n_turns = t.count()  # materialize input outside the timed window
    t0 = time.time()
    segments = fit_segments(derive_series(t)).persist()
    segments.count()
    r1m = rollup_from_segments(segments, MINUTE_MS).persist()
    r1m.count()
    r1h = rollup_cascade(r1m, HOUR_MS).persist()
    r1h.count()
    rollup_cascade(r1h, DAY_MS).count()
    dt = time.time() - t0
    for df in (segments, r1m, r1h, t):
        df.unpersist()
    return n_turns, dt


def sf_queries(spark) -> dict[str, float]:
    """Per-operator timings on the driver's sf directory."""
    import __spark_entry__ as em

    out: dict[str, float] = {}
    for name, fn in sorted(em.queries().items()):
        t0 = time.time()
        fn(spark, SF_DIR).count()
        out[name] = round(time.time() - t0, 2)
    return out


def main() -> None:
    if "--scaling" in sys.argv:
        results = {}
        for cores in ("8", "32"):
            spark = _spark(cores)
            turns, dt = headline_pipeline(spark)
            spark.stop()
            results[cores] = {"turns": turns, "sec": round(dt, 2),
                              "turns_per_sec": round(turns / dt)}
        eff = (results["32"]["turns_per_sec"] / results["8"]["turns_per_sec"]) / 4.0
        print(json.dumps({
            "metric": "scaling efficiency local[8] -> local[32] (N -> 4N stand-in)",
            "value": round(eff, 3),
            "unit": "efficiency",
            "runs": results,
        }))
        return

    spark = _spark(CPUS)
    turns, dt = headline_pipeline(spark)
    queries = sf_queries(spark)
    spark.stop()
    print(json.dumps({
        "metric": "turns/sec ingested-to-rolled-up (synthetic transcripts, full pipeline)",
        "value": round(dt + sum(queries.values()), 2),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "synthetic_turns": turns,
        "pipeline_sec": round(dt, 2),
        "turns_per_sec": round(turns / dt),
    }))


if __name__ == "__main__":
    main()
