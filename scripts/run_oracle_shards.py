#!/usr/bin/env python
"""Run the full DuckDB-oracle suite (tests/test_queries_oracle.py,
all 240 registered queries) as N parallel shard processes — identical
coverage to the single-process run at a fraction of the wall-clock.

The single-process pass crossed 600 s as the registry grew (each
query pays Spark job latency serially; 32 cores sit mostly idle).
Sharding splits the sorted query list round-robin across N pytest
processes and divides the cores between them via SPARK_GRAFT_CPUS,
so N Spark sessions run concurrently without 32-core contention.

Usage:
    python scripts/run_oracle_shards.py [N]        # default 4 shards

Coverage identity is machine-checked twice: here (the shards'
planned name lists must union to the full registry) and by
tests/test_config.py::test_oracle_shards_cover_every_query.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    total_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    per_shard = max(2, total_cpus // n)

    from mongo2pq_spark.queries.registry import load_all
    from tests.test_queries_oracle import shard_names

    names = sorted(load_all())
    planned = [shard_names(names, f"{k}/{n}") for k in range(n)]
    union = sorted(nm for shard in planned for nm in shard)
    assert union == names, "shards do not cover the registry exactly"

    t0 = time.time()
    procs = []
    for k in range(n):
        env = dict(
            os.environ,
            SPARK_GRAFT_QUERY_SHARD=f"{k}/{n}",
            SPARK_GRAFT_CPUS=str(per_shard),
        )
        procs.append(
            (
                k,
                subprocess.Popen(
                    [
                        sys.executable, "-m", "pytest",
                        "tests/test_queries_oracle.py", "-q",
                        "--no-header", "-p", "no:cacheprovider",
                    ],
                    cwd=REPO,
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                ),
            )
        )
    rc = 0
    for k, p in procs:
        out, _ = p.communicate()
        tail = "\n".join(out.strip().splitlines()[-3:])
        print(f"--- shard {k}/{n} ({len(planned[k])} queries) "
              f"rc={p.returncode}\n{tail}")
        rc = rc or p.returncode
    print(f"total wall-clock: {time.time() - t0:.1f}s "
          f"({n} shards x {per_shard} cores)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
