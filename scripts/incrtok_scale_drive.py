"""Round-15 scale drive: incremental tokenization's O(increment)
claim (operators/bpe.py::incremental_encode_payloads).

The contract: re-tokenizing a corpus after an arrival wave must cost
O(wave), not O(corpus) — the diff is one digest equi-join, unchanged
payloads are reused verbatim from the prior generation's shards, and
ONLY the increment re-enters the Arrow encode path. If the merge cost
tracked corpus size instead of increment size, "per-crawl-wave
tokenization" would silently be "per-crawl-wave full retokenize" at
100 TB.

Drive: the sf0.1 documents table is fully encoded once as generation
A (outside the timed region); then generations with increments of
2% / 10% / 50% / 100% of the corpus (docs changed by appending a
version tag) are built, and the reuse-or-encode merge + gen-B shard
write + read-back is timed per increment size. Pass criterion: wall
clock grows with the INCREMENT, with the 2%-increment run far below
the 100% (full-retokenize) run; the 100% run is the honest upper
bound the reuse path saves. Results recorded in SCALING.md
"Round 15".

r16 update (VERDICT r15 #6): the ship now goes through
write_shards_incremental — the r15 drive proved the ENCODE stage
linear in the increment but showed the full-rewrite ship was
O(generation) and dominated end-to-end at small increments; with
dirty-bucket-only writes + manifest inheritance the end-to-end
should now track the increment too. Results in SCALING.md
"Round 16".
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mongo2pq_spark.operators.bpe import (
    bpe_encode_payloads,
    incremental_encode_payloads,
    learn_bpe,
)
from mongo2pq_spark.session import get_spark
from mongo2pq_spark.sources.registry import read_sf_table
from mongo2pq_spark.sources.staging import generation_tmp_dir
from mongo2pq_spark.sources.tarshards import (
    register_tarshards,
    shard_members,
    write_shards_incremental,
)


def main() -> int:
    spark = get_spark(app_name="incrtok_scale_drive")
    register_tarshards(spark)
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    docs = read_sf_table(spark, sf, "documents").select("doc_id", "text")
    n_docs = docs.count()
    merges = learn_bpe(docs, n_merges=200)

    gen_a = generation_tmp_dir(sf, "incrtok_drive_gen_a")
    (
        shard_members(
            bpe_encode_payloads(docs, merges), target_shard_bytes=64 << 10
        )
        .sortWithinPartitions("name")
        .write.format("tarshards")
        .mode("overwrite")
        .save(gen_a)
    )
    digests = docs.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("md5_a")
    )
    print(f"corpus: {n_docs} docs at {sf}; generation A shipped", flush=True)

    # wave sizes in DOCS (n_docs=5000 at sf0.1): the sub-shard-count
    # waves (10, 50) are the regime shard reuse exists for — an
    # increment hashed over n buckets dirties ~min(increment, n) of
    # them, so reuse only wins when increment << shard count (at
    # 100 TB: a 1k-doc wave over 100k shards inherits ~99%; here 33
    # shards make the >=100-doc waves an honest all-dirty bound)
    for wave in (0, 10, 50, 100, 500, 2500, 5000):
        gen_b = docs.select(
            "doc_id",
            F.when(
                F.col("doc_id") < wave,
                F.concat(F.col("text"), F.lit(f" [w{wave}]")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        out = generation_tmp_dir(sf, f"incrtok_drive_gen_w{wave}")
        t0 = time.perf_counter()
        back_a = spark.read.format("tarshards").load(gen_a)
        merged, flagged = incremental_encode_payloads(
            gen_b, digests, back_a, merges
        )
        # r16: the ship itself is shard-incremental — only buckets
        # the diff touched are rewritten; clean buckets inherit gen
        # A's shards by manifest reference (VERDICT r15 #6: the r15
        # drive showed the full-rewrite ship was O(generation) and
        # dominated at small increments)
        dirty_names = flagged.filter(F.col("fresh")).select(
            F.concat(
                F.lit("doc"), F.col("doc_id").cast("string"),
                F.lit(".tokens"),
            ).alias("name")
        )
        stats = write_shards_incremental(merged, out, gen_a, dirty_names)
        t_ship = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_members = spark.read.format("tarshards").load(out).count()
        t_read = time.perf_counter() - t0
        n_fresh = flagged.filter(F.col("fresh")).count()
        # the component reuse eliminates: Arrow-encode of exactly the
        # docs the diff marked fresh (materialized via a byte-sum so
        # every payload is actually produced)
        to_encode = gen_b.join(
            flagged.filter(F.col("fresh")).select("doc_id"), "doc_id"
        ).select("doc_id", "text")
        t0 = time.perf_counter()
        bpe_encode_payloads(to_encode, merges).agg(
            F.sum(F.octet_length("payload"))
        ).collect()
        t_enc = time.perf_counter() - t0
        tag = " (discarded warm-up)" if wave == 0 else ""
        wb = stats["owned_bytes"]
        ib = stats["inherited_bytes"]
        print(
            f"wave {wave:4d} docs: ship={t_ship:.3f}s  "
            f"read={t_read:.3f}s  encode_stage_alone={t_enc:.3f}s  "
            f"fresh={n_fresh}  members={n_members}  "
            f"shards owned={stats['owned']} "
            f"inherited={stats['inherited']}  "
            f"written_bytes={wb}  borrowed_bytes={ib}  "
            f"write_frac={wb / max(1, wb + ib):.3f}{tag}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
