#!/usr/bin/env python
"""Rounding-boundary stability audit — the r12 PageRank-flake class,
hunted proactively across the whole registry.

A query that publishes rounded floats computed by order-dependent
accumulation (partial-agg sums, AQE-coalesced partitioning) can sit
within float noise of a rounding boundary: the engine and the oracle
then round OPPOSITE ways, and the driver's hash gate flips red on a
value that is correct to 9 significant digits. The r12 full-suite
stamp caught graph_pagerank_interactions doing exactly this once in
~50 runs; the fix class is a coarser published grid.

This audit runs EVERY registered query's Spark side twice — shuffle
partitions 8 vs 37 (different partial-agg combine orders; AQE still
on) — canonicalizes both results with the driver's float rendering
(%.10g), and reports any query whose two runs differ. A hit is a
query whose published values depend on partition count: either a
genuine nondeterminism bug or a too-fine rounding grid. Both are
pre-driver-row defects.

Usage: python scripts/float_stability_audit.py [sf_dir] [shard k/n]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from decimal import Decimal


def canon(df):
    import numpy as np

    df = df[sorted(df.columns)].copy()

    def c(v):
        import pandas as pd

        if isinstance(v, np.generic):
            v = v.item()
        if v is None or (not isinstance(v, (list, tuple)) and pd.isna(v)):
            return "NULL"  # None, float NaN, AND pandas NaT
        if isinstance(v, Decimal):
            v = float(v)
        if isinstance(v, float):
            return "%.10g" % v
        if hasattr(v, "strftime"):
            return v.strftime("%Y-%m-%d %H:%M:%S.%f")
        return str(v)

    return sorted(map(tuple, df.map(c).values.tolist()))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    shard = sys.argv[2] if len(sys.argv) > 2 else None
    from mongo2pq_spark.queries.registry import load_all
    from mongo2pq_spark.session import get_spark
    from tests.test_queries_oracle import shard_names

    spark = get_spark(app_name="float_stability_audit")
    specs = load_all()
    names = shard_names(sorted(specs), shard)

    unstable = []
    for i, name in enumerate(names):
        fn = specs[name].fn
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            a = canon(fn(spark, sf).toPandas())
            spark.conf.set("spark.sql.shuffle.partitions", "37")
            b = canon(fn(spark, sf).toPandas())
        except Exception as exc:
            print(f"{i + 1}/{len(names)} {name}: ERROR {exc}", flush=True)
            unstable.append((name, "error"))
            continue
        if a != b:
            diff = sum(1 for x, y in zip(a, b) if x != y) + abs(
                len(a) - len(b)
            )
            print(
                f"{i + 1}/{len(names)} {name}: UNSTABLE "
                f"({diff} differing rows of {len(a)})",
                flush=True,
            )
            unstable.append((name, diff))
        else:
            print(f"{i + 1}/{len(names)} {name}: stable", flush=True)
    print(f"\nunstable: {unstable or 'NONE'}")
    return 1 if unstable else 0


if __name__ == "__main__":
    raise SystemExit(main())
