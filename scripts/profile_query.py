#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1).

For each named query: capture .explain('formatted') to a file, run the
noop-sink action N times (same methodology as bench.py), and record
wall seconds + the number of Spark JOBS the run launched (job-count is
the scheduling-overhead proxy: at sf0.1 the fixture tables are tiny,
so a query's wall-clock is dominated by job/stage scheduling — exactly
the overhead that multiplies at 100 TB when a loop schedules a round
per iteration).

Usage:
    python scripts/profile_query.py [--plans-dir DIR] [--repeats N] q1 q2 ...
Prints one JSON line per query:
    {"name":..., "best":..., "first":..., "jobs":..., "runs":[...]}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--plan-suffix", default="")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from mongo2pq_spark.queries.registry import load_all
    from mongo2pq_spark.session import get_spark

    spark = get_spark(app_name="mongo2pq_spark_profile")
    sc = spark.sparkContext
    specs = load_all()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warmup

    for name in args.names:
        spec = specs[name]
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            out = f"{name}{args.plan_suffix}.txt"
            with open(os.path.join(args.plans_dir, out), "w") as fh:
                fh.write(plan)
        runs = []
        jobs_per_run = []
        first = best = None
        for i in range(max(1, args.repeats)):
            group = f"prof:{name}:{i}"
            sc.setJobGroup(group, name)
            start = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - start
            sc.setJobGroup(None, None)
            runs.append(round(elapsed, 3))
            jobs_per_run.append(
                len(sc.statusTracker().getJobIdsForGroup(group))
            )
            if first is None:
                first = elapsed
            best = elapsed if best is None else min(best, elapsed)
        print(
            json.dumps(
                {
                    "name": name,
                    "best": round(best, 3),
                    "first": round(first, 3),
                    "jobs": jobs_per_run,
                    "runs": runs,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
