"""Extra benchmarks for the optimization round (bench.py is FROZEN).

Times individual declared queries with the same methodology as
bench.py's sf_queries (fn(spark, SF_DIR).count(), medians over rounds)
but for a selectable subset, and can dump .explain("formatted") plans
to plans/r07/. Usage:

  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
      --queries ann_recall,dedup_minhash_lsh --rounds 3
  python bench_extra.py --explain ann_recall --out plans/r07/ann_recall_before.txt
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _spark():
    from modelardb_spark.session import get_spark

    s = get_spark(
        master=f"local[{CPUS}]",
        shuffle_partitions=int(os.environ.get("BENCH_SHUFFLE", CPUS)),
        app_name="bench-extra",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="", help="comma list; empty = all")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--explain", default="", help="dump plan for this query")
    ap.add_argument("--out", default="", help="plan output file")
    args = ap.parse_args()

    import __spark_entry__ as em

    qs = em.queries()
    spark = _spark()

    if args.explain:
        df = qs[args.explain](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if args.out:
            os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
            with open(args.out, "w") as f:
                f.write(plan)
            print(f"wrote {args.out}", file=sys.stderr)
        else:
            print(plan)
        spark.stop()
        return

    names = [n for n in args.queries.split(",") if n] or sorted(qs)
    runs: dict[str, list[float]] = {}
    loads = []
    for _ in range(args.rounds):
        loads.append(round(os.getloadavg()[0], 2))
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qs[name](spark, SF_DIR).count()
            runs.setdefault(name, []).append(round(time.time() - t0, 2))
    spark.stop()
    print(json.dumps({
        "sf": SF_DIR,
        "rounds": args.rounds,
        "loads": loads,
        "median": {n: round(statistics.median(ts), 2) for n, ts in runs.items()},
        "best": {n: min(ts) for n, ts in runs.items()},
        "samples": runs,
    }))


if __name__ == "__main__":
    main()
