"""Round-11-continuation audio-store scale drive: push an
sf0.1-scale WAV corpus through the FULL CLI path (--source-format
media + --media-afp-store) in increments against one growing
persisted envelope-fingerprint store, and measure per-run cost as
history grows — the O(increment) evidence for the audio modality
(the image modality got the operator-level drive in round 11; this
one also exercises the store's probe/commit/consolidate lifecycle
end-to-end, mirroring the round-10 text-store CLI drive).

Fixture: 3 ingest runs x 2,000 PCM WAVs (1,000 frames mono int16),
with run 3 containing 1,000 re-MASTERS (gain x2, clip-safe) of run-1
audio under fresh file names — different bytes and payload_md5, so
only the envelope fingerprint can catch them. Run 3 also passes
--media-store-consolidate, so the drive covers consolidation cost at
volume and the post-consolidation store stays probe-correct.
"""
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from mongo2pq_spark.cli import main as cli_main
from mongo2pq_spark.operators.audio import encode_wav
from mongo2pq_spark.session import get_spark

ROOT = "/tmp/afp_drive"
STORE = f"{ROOT}/afpstore"
N = 2000
RNG = np.random.default_rng(1108)

shutil.rmtree(ROOT, ignore_errors=True)
os.makedirs(ROOT)

t0 = time.time()
run1_samples = []
for run in (1, 2, 3):
    d = f"{ROOT}/run{run}/sounds"
    os.makedirs(d)
    for i in range(N):
        if run == 3 and i < 1000:
            # re-master of a run-1 clip: exact gain x2 (generation
            # range keeps |sample| <= 12000, so no clipping — every
            # envelope-window comparison is preserved)
            s = (run1_samples[i] * 2).astype(np.int16)
        else:
            s = RNG.integers(-12000, 12000, size=(1000,)).astype(np.int16)
            if run == 1:
                run1_samples.append(s)
        with open(f"{d}/clip_{run}_{i:05d}.wav", "wb") as f:
            f.write(encode_wav(s, 16_000))
print(f"fixture: {3*N} WAVs in {time.time()-t0:.1f}s", flush=True)

spark = get_spark("audio_store_scale_drive")
results = []
for run in (1, 2, 3):
    out = f"{ROOT}/out{run}"
    os.makedirs(out)
    t0 = time.time()
    rc = cli_main(
        f"file:{ROOT}/run{run}",
        source_format="media",
        outdir=out,
        media_afp_store=STORE,
        media_store_consolidate=(run == 3),
        spark=spark,
    )
    dt = time.time() - t0
    assert rc == 0, f"run {run} failed"
    n_written = spark.read.parquet(f"{out}/sounds.parquet").count()
    results.append((run, dt, n_written))
    print(f"run{run}: {dt:.2f}s  written={n_written}", flush=True)

parts = sorted(
    p for p in os.listdir(f"{STORE}/sounds/fps") if p.startswith("batch=")
)
print("store partitions after consolidate:", parts)
assert results[2][2] == N - 1000, "re-masters not dropped"
print("RESULTS", results)
spark.stop()
shutil.rmtree(ROOT, ignore_errors=True)
