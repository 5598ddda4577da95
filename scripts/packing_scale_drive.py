"""Round-15 scale drive: pack_token_payloads' parallelism knob
(operators/packing.py — VERDICT r14 What's-wrong #2 / task #3).

The contract under test: "parallelism is chosen, not inherited" —
each hash shard's token stream is laid out by ONE running-sum window
over corpus/n_shards rows, so the per-task working set shrinks
linearly as n_shards grows, and choosing more shards is how a 100 TB
corpus keeps the window partitions executor-sized. The registered
query pins the n_shards=8 default; this drive exercises the knob the
default hides.

Drive: BPE-encode the sf0.1 documents table once (outside the timed
region — encoding cost is the same for every shard count), then pack
at n_shards ∈ {8, 64, 512}, timing the pack plan (sequences + spans
materialized via count()) and recording the largest per-shard row
count (the window partition a single task must hold). Pass criterion:
wall-clock flat-to-falling as n_shards rises while max rows/shard
falls ~linearly — proving the knob moves the scale-limiting quantity
without a throughput cliff. Results recorded in SCALING.md
"Round 15".
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mongo2pq_spark.operators.bpe import bpe_encode_payloads, learn_bpe
from mongo2pq_spark.operators.packing import pack_token_payloads
from mongo2pq_spark.session import get_spark
from mongo2pq_spark.sources.registry import read_sf_table


def main() -> int:
    spark = get_spark(app_name="packing_scale_drive")
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    docs = read_sf_table(spark, sf, "documents").select("doc_id", "text")
    merges = learn_bpe(docs, n_merges=200)
    payloads = bpe_encode_payloads(docs, merges)
    # materialize the encode ONCE outside the timed region: the drive
    # times the PACK plan, not the (shard-count-independent) tokenize
    payloads = payloads.persist()
    n_docs = payloads.count()
    print(f"corpus: {n_docs} docs at {sf}", flush=True)

    for n_shards in (8, 64, 512):
        t0 = time.perf_counter()
        sequences, spans = pack_token_payloads(payloads, n_shards=n_shards)
        n_seqs = sequences.count()
        n_spans = spans.count()
        t_pack = time.perf_counter() - t0
        shard_rows = (
            spans.groupBy("shard")
            .count()
            .agg(F.max("count").alias("mx"))
            .first()["mx"]
        )
        print(
            f"n_shards={n_shards:4d}: pack={t_pack:.3f}s  "
            f"sequences={n_seqs}  spans={n_spans}  "
            f"max_rows_per_shard={shard_rows}",
            flush=True,
        )
    payloads.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
