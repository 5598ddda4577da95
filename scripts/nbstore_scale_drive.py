"""Round-14 scale drive: the NB count store's O(increment) claim
(operators/classifier.py::ingest_nb_counts / load_nb_model).

The contract: folding arrival wave k into the store must cost the
same whether the store already holds 1 wave or 8 — ingest tokenizes
ONLY the increment (history is never re-read), and the model rebuild
aggregates the bounded count tables, not corpus text. A per-wave
ingest cost that grows with history would mean the design silently
re-reads the past (the failure mode that turns "daily classifier
refresh" into "daily full retrain" at 100 TB).

Drive: the sf0.1 documents table (5k docs) split into 8 equal waves
by salted md5; each wave is ingested in turn and BOTH the ingest
wall-clock and a post-ingest model rebuild wall-clock are recorded.
Pass criterion: ingest cost flat (within noise) from wave 1 to wave
8 while history grows 8x; rebuild cost flat-ish too (count tables
grow with vocab x labels x waves — bounded, tiny). Results recorded
in SCALING.md "Round 14".
"""
import shutil
import sys
import tempfile
import time
import os

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mongo2pq_spark.functions.hashing import token_hash32
from mongo2pq_spark.operators.classifier import (
    ingest_nb_counts,
    load_nb_model,
)
from mongo2pq_spark.session import get_spark
from mongo2pq_spark.sources.registry import read_sf_table


def main() -> int:
    spark = get_spark(app_name="nbstore_scale_drive")
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    docs = read_sf_table(spark, sf, "documents").select(
        "doc_id", "text", "lang"
    )
    wave = token_hash32(
        F.concat(F.lit("nbdrive:"), F.col("doc_id").cast("string"))
    ) % 8
    docs = docs.withColumn("wave", wave)
    docs.count()  # warm the scan outside the timed region

    store = os.path.join(tempfile.gettempdir(), "nbstore_scale_drive")
    shutil.rmtree(store, ignore_errors=True)
    for k in range(8):
        batch = docs.filter(F.col("wave") == k)
        t0 = time.perf_counter()
        ingest_nb_counts(batch, store, f"wave{k}", "lang")
        t_ingest = time.perf_counter() - t0
        t0 = time.perf_counter()
        model, priors = load_nb_model(spark, store, "lang")
        n_model = model.count()
        t_rebuild = time.perf_counter() - t0
        print(
            f"wave {k}: history={k}x  ingest={t_ingest:.3f}s  "
            f"rebuild={t_rebuild:.3f}s  model_rows={n_model}",
            flush=True,
        )
    shutil.rmtree(store, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
