#!/usr/bin/env python
"""Synthesize a larger scale factor for SCALING MEASUREMENTS ONLY
(VERDICT r18 #2: per-query 8-vs-32-core ratios are floor-bound at
sf0.1; a larger input is needed to see parallelism). The driver's
testdata generator is not in the repo and /root/testdata is read-only,
so this replicates sf0.1 K times with deterministic, join-preserving
transforms:

- every integer column named like an id/key (``*_id``, ``*key``)
  is offset by ``replica * OFFSET`` — both sides of every join get
  the same offset, so join/groupBy cardinalities scale linearly;
- ``text`` columns get a per-replica suffix token, so document
  CONTENT cardinality scales too (otherwise every doc has K exact
  duplicates and dedup workloads turn degenerate);
- ``embedding`` arrays get a tiny deterministic per-replica
  perturbation on dim 0, so LSH buckets grow linearly instead of
  every replica colliding into identical candidate pairs.

NOT for correctness work: oracle parity is meaningless here (the
data is synthetic-on-synthetic). Output goes under a separate root,
never into /root/testdata.

Usage: python scripts/make_scale_sf.py [K] [OUT_ROOT]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFFSET = 100_000_000


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out_root = sys.argv[2] if len(sys.argv) > 2 else "/root/scale_data"
    src = "/root/testdata/sf0.1"
    sf = 0.1 * k
    out_dir = os.path.join(out_root, f"sf{sf:g}")
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, IntegerType, LongType

    from mongo2pq_spark.session import get_spark

    spark = get_spark(app_name="make_scale_sf")

    tables = sorted(
        f[: -len(".parquet")]
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )
    for name in tables:
        df = spark.read.parquet(f"{src}/{name}.parquet")
        reps = []
        for r in range(k):
            rep = df
            for field in df.schema.fields:
                col = field.name
                low = col.lower()
                if isinstance(field.dataType, (LongType, IntegerType)) and (
                    low.endswith("_id") or low.endswith("key")
                    or low == "id"
                ):
                    rep = rep.withColumn(
                        col,
                        (F.col(col) + F.lit(r * OFFSET)).cast(
                            field.dataType
                        ),
                    )
                elif low == "text":
                    rep = rep.withColumn(
                        col,
                        F.concat(F.col(col), F.lit(f" r{r}"))
                        if r
                        else F.col(col),
                    )
                elif low == "embedding" and isinstance(
                    field.dataType, ArrayType
                ):
                    if r:
                        rep = rep.withColumn(
                            col,
                            F.concat(
                                F.array(
                                    F.col(col)[0] + F.lit(r * 1e-3)
                                ),
                                F.slice(
                                    F.col(col), 2, F.size(F.col(col))
                                ),
                            ),
                        )
            reps.append(rep)
        out = reps[0]
        for rep in reps[1:]:
            out = out.unionByName(rep)
        out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        print(f"{name}: x{k} -> {out_dir}/{name}.parquet", flush=True)
    print(f"done: {out_dir}")


if __name__ == "__main__":
    main()
