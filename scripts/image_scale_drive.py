"""Round-11 image-path scale drive: push an sf0.1-scale image corpus
through image_dhash -> hamming_incremental_new in increments against a
growing persisted fingerprint index, and measure per-increment cost as
history grows (the O(increment) claim for the image modality,
previously unit-test-only).

Fixture: 3 increments x 2,000 PNGs (64x64 RGB, random content), with
increment 3 containing 1,000 brightness-shifted near-copies (+2 on all
channels, clip-safe range) of increment-1 images under fresh ids — a
re-encode/brightness drift dHash must survive.
"""
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from mongo2pq_spark.operators.dedup import hamming_incremental_new
from mongo2pq_spark.operators.multimodal import (
    encode_png,
    image_dhash,
    ingest_binary_dir,
)
from mongo2pq_spark.session import get_spark

ROOT = "/tmp/img_drive"
INDEX = f"{ROOT}/index.parquet"
N = 2000
RNG = np.random.default_rng(1107)

shutil.rmtree(ROOT, ignore_errors=True)
os.makedirs(ROOT)

# -- generate fixture files ---------------------------------------------------
t0 = time.time()
inc1_arrays = []
for inc in (1, 2, 3):
    d = f"{ROOT}/inc{inc}"
    os.makedirs(d)
    for i in range(N):
        if inc == 3 and i < 1000:
            # near-copy of an increment-1 image: +2 brightness, values
            # kept in [10, 240] at generation so no clipping — every
            # cell-mean comparison (hence the dHash) is preserved
            arr = np.clip(inc1_arrays[i].astype(np.int16) + 2, 0, 255).astype(
                np.uint8
            )
        else:
            arr = RNG.integers(10, 241, size=(64, 64, 3), dtype=np.uint8)
            if inc == 1:
                inc1_arrays.append(arr)
        with open(f"{d}/img_{inc}_{i:05d}.png", "wb") as f:
            f.write(encode_png(arr))
print(f"fixture: {3*N} PNGs in {time.time()-t0:.1f}s", flush=True)

spark = get_spark("image_scale_drive")

results = []
for inc in (1, 2, 3):
    t0 = time.time()
    imgs = ingest_binary_dir(spark, f"{ROOT}/inc{inc}", glob="*.png")
    fp = image_dhash(imgs)
    if inc == 1:
        fp.write.mode("overwrite").parquet(INDEX)
        n_new, n_dup = spark.read.parquet(INDEX).count(), 0
    else:
        index_fp = spark.read.parquet(INDEX)
        flagged = hamming_incremental_new(
            fp, index_fp, hash_col="dhash", id_col="doc_id", max_hamming=3
        )
        agg = flagged.groupBy("is_new").count().collect()
        n_new = sum(r["count"] for r in agg if r["is_new"])
        n_dup = sum(r["count"] for r in agg if not r["is_new"])
        # append ONLY genuinely-new fingerprints to the index
        flagged.filter("is_new").select("doc_id", "dhash").write.mode(
            "append"
        ).parquet(INDEX)
    dt = time.time() - t0
    idx_size = spark.read.parquet(INDEX).count()
    results.append((inc, dt, n_new, n_dup, idx_size))
    print(
        f"inc{inc}: {dt:.2f}s  new={n_new} dup={n_dup} index={idx_size}",
        flush=True,
    )

print("RESULTS", results)
spark.stop()
shutil.rmtree(ROOT, ignore_errors=True)
