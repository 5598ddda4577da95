"""Round-17 scale drive (VERDICT r16 #7): write_frac saturation of
the shard-incremental ship as the arrival wave grows.

write_shards_incremental makes a generation ship O(wave) in write
BYTES by rewriting only dirty buckets. But bucket dirtiness
saturates: a wave of w changed members scattered uniformly over
n_shards buckets dirties ~n·(1 − (1 − 1/n)^w) of them, so once
w approaches n_shards nearly every bucket is dirty and the
"incremental" ship converges to a full rewrite (plus the diff job —
pure overhead at that point). The r16 drive only measured
sub-shard-count waves (write_frac 0.0–0.28); this drive measures the
full curve at sf0.1 and derives the n_shards sizing rule, recorded
in SCALING.md "Round 17".

Drive: documents (sf0.1) becomes generation A at n_shards=32; waves
of 1..1024 changed docs ship incrementally into fresh dirs; per wave
we record dirty-bucket count, owned/inherited byte split, write_frac,
and wall clock, plus a FULL-rewrite reference ship. Pass criterion:
measured dirty-bucket counts track the occupancy formula, write_frac
→ 1 as wave → a small multiple of n_shards, and sub-saturation waves
stay far under the full-ship write bytes.
"""
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mongo2pq_spark.session import get_spark
from mongo2pq_spark.sources.registry import read_sf_table
from mongo2pq_spark.sources.tarshards import (
    register_tarshards,
    write_shards_incremental,
)


def main() -> int:
    spark = get_spark(app_name="shipfrac_scale_drive")
    register_tarshards(spark)
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    docs = read_sf_table(spark, sf, "documents").select("doc_id", "text")
    n_docs = docs.count()
    members = docs.select(
        F.concat(F.lit("doc"), F.col("doc_id"), F.lit(".txt")).alias(
            "name"
        ),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias(
            "payload"
        ),
    )

    root = tempfile.mkdtemp(prefix="shipfrac_drive_")
    results = []
    try:
        gen_a = f"{root}/gen_a"
        t0 = time.monotonic()
        (
            members.repartition(n_shards, F.col("name"))
            .sortWithinPartitions("name")
            .write.format("tarshards")
            .mode("overwrite")
            .save(gen_a)
        )
        full_ship_s = time.monotonic() - t0
        print(
            f"corpus {n_docs} docs, n_shards {n_shards}, "
            f"full ship {full_ship_s:.2f}s",
            flush=True,
        )

        wave = 1
        while wave <= max(4 * n_shards * 8, 1024):
            w = min(wave, n_docs)
            changed = members.filter(
                F.pmod(F.hash("name"), F.lit(997)) < F.lit(
                    max(1, (997 * w) // n_docs)
                )
            )
            # deterministic approximate wave; measure the ACTUAL size
            actual_w = changed.count()
            gen_b = (
                members.join(
                    changed.select("name").withColumn(
                        "chg", F.lit(True)
                    ),
                    "name",
                    "left",
                )
                .select(
                    "name",
                    F.when(
                        F.col("chg").isNotNull(),
                        F.concat(
                            F.col("payload").cast("string"),
                            F.lit("|v2"),
                        ).cast("binary"),
                    )
                    .otherwise(F.col("payload"))
                    .alias("payload"),
                )
            )
            out = f"{root}/gen_w{wave}"
            t0 = time.monotonic()
            stats = write_shards_incremental(
                gen_b, out, gen_a, changed.select("name")
            )
            elapsed = time.monotonic() - t0
            ob, ib = stats["owned_bytes"], stats["inherited_bytes"]
            frac = ob / max(1, ob + ib)
            expect_dirty = n_shards * (
                1.0 - (1.0 - 1.0 / n_shards) ** actual_w
            )
            row = {
                "wave": actual_w,
                "dirty_buckets": stats["owned"],
                "expect_dirty": round(expect_dirty, 1),
                "inherited": stats["inherited"],
                "write_frac": round(frac, 3),
                "ship_s": round(elapsed, 2),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
            shutil.rmtree(out, ignore_errors=True)
            if w >= n_docs:
                break
            wave *= 2
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"full_ship_s": round(full_ship_s, 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
