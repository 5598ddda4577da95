"""Round-11 embedding-path scale drive: push synthetic increments
through embedding_incremental_near_dups against a GROWING persisted
vector index (assignments + vectors parquet, appended per increment,
assignments passed precomputed), and measure per-increment cost as
history grows — the O(increment) evidence for the embedding modality,
matching the r10 text-store and r11 image drives.

Fixture: 3 increments x 20,000 64-dim vectors; increment 3 contains
5,000 positive-scaled copies of increment-1 vectors under fresh ids
(cosine exactly 1.0, and sign-LSH buckets are scale-invariant, so
every copy MUST be caught). Threshold 0.8: at 64 dims a random-pair
cosine is sigma=1/8, so 0.4 (3.2 sigma) fires on noise once the
corpus reaches ~20k vectors (P(any corpus match) ~ 1 per new vector
- measured 6,193/20,000 accidental flags on the first attempt);
0.8 = 6.4 sigma is noise-free while planted copies stay exact.
"""
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mongo2pq_spark.operators.similarity import (
    embedding_incremental_near_dups,
    lsh_multi_assignments,
)
from mongo2pq_spark.session import get_spark

ROOT = "/tmp/emb_drive"
N = 20_000
DIM = 64
RNG = np.random.default_rng(1111)

shutil.rmtree(ROOT, ignore_errors=True)
spark = get_spark("embedding_scale_drive")

inc1 = RNG.standard_normal((N, DIM))


def make_df(inc):
    if inc == 3:
        fresh = RNG.standard_normal((N - 5000, DIM))
        copies = inc1[:5000] * 2.5  # positive scale: cosine 1.0
        arr = np.concatenate([copies, fresh])
    elif inc == 1:
        arr = inc1
    else:
        arr = RNG.standard_normal((N, DIM))
    base = inc * 1_000_000
    rows = [(base + i, [float(x) for x in arr[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


results = []
for inc in (1, 2, 3):
    df = make_df(inc)
    t0 = time.time()
    asg = lsh_multi_assignments(df, 8, 12, DIM, 7)
    if inc == 1:
        asg.write.mode("overwrite").parquet(f"{ROOT}/asg.parquet")
        df.write.mode("overwrite").parquet(f"{ROOT}/vec.parquet")
        n_new, n_dup = N, 0
    else:
        index_asg = spark.read.parquet(f"{ROOT}/asg.parquet")
        index_vec = spark.read.parquet(f"{ROOT}/vec.parquet")
        flagged = embedding_incremental_near_dups(
            df, index_vec, threshold=0.8, n_tables=8, n_hyperplanes=12,
            dim=DIM, index_asg=index_asg,
        )
        agg = flagged.groupBy("is_new").count().collect()
        n_new = sum(r["count"] for r in agg if r["is_new"])
        n_dup = sum(r["count"] for r in agg if not r["is_new"])
        new_ids = flagged.filter("is_new").select("vec_id")
        df.join(new_ids, "vec_id").select("vec_id", "embedding").write.mode(
            "append"
        ).parquet(f"{ROOT}/vec.parquet")
        asg.join(new_ids, "vec_id").write.mode("append").parquet(
            f"{ROOT}/asg.parquet"
        )
    dt = time.time() - t0
    idx = spark.read.parquet(f"{ROOT}/vec.parquet").count()
    results.append((inc, round(dt, 2), n_new, n_dup, idx))
    print(f"inc{inc}: {dt:.2f}s new={n_new} dup={n_dup} index={idx}",
          flush=True)

print("RESULTS", results)
spark.stop()
shutil.rmtree(ROOT, ignore_errors=True)
