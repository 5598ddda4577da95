"""Round-12 scale drive: ExactSubstr removal
(operators/dedup.py::duplicated_span_removal) must scale ~linearly in
corpus tokens — the claim behind replacing Lee et al.'s single-machine
suffix array with the distributed span-grid formulation.

Two series over the sf0.1 documents table (5k docs) replicated 1x/2x/4x
under fresh doc ids:

- UNIQUE: every replica's tokens are suffixed with its replica id, so
  no cross-doc duplication exists — measures the detection path alone
  (span hashing + the duplicated-hash aggregate finding nothing).
- WORST CASE: replicas are verbatim copies, so EVERY span is
  duplicated and EVERY token is covered — the covered-position
  explode, the anti-join and the (empty-doc) rebuild all run at full
  volume. Output must be n_kept == 0 for every doc at >= 2x.

Linear-in-corpus wall-clock across both series (per-token cost flat
as size doubles) is the pass criterion; results recorded in
SCALING.md "Round 12".
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mongo2pq_spark.operators.dedup import duplicated_span_removal
from mongo2pq_spark.session import get_spark
from mongo2pq_spark.sources.registry import read_sf_table

SF = "/root/testdata/sf0.1"

spark = get_spark("substring_scale_drive")
base = read_sf_table(spark, SF, "documents").select("doc_id", "text")
n_base = base.count()
offset = 1_000_000


def replicated(k: int, unique: bool):
    parts = []
    for r in range(k):
        p = base.select(
            (F.col("doc_id") + r * offset).alias("doc_id"),
            (
                F.regexp_replace(F.col("text"), r"(\S+)", f"$1_{r}")
                if unique and r > 0
                else F.col("text")
            ).alias("text"),
        )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


for series, unique in (("unique", True), ("worst-case", False)):
    print(f"-- series: {series}", flush=True)
    prev = None
    for k in (1, 2, 4):
        corpus = replicated(k, unique)
        t0 = time.time()
        res = duplicated_span_removal(corpus)
        res.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        note = ""
        if series == "worst-case" and k >= 2:
            kept = res.agg(F.sum("n_kept")).first()[0]
            note = f" (total n_kept={kept}, must be 0)"
            assert kept == 0, kept
        ratio = f" x{dt / prev:.2f} vs prev size" if prev else ""
        print(
            f"{series} {k}x ({k * n_base} docs): {dt:.1f}s{ratio}{note}",
            flush=True,
        )
        prev = dt


# -- store series: per-increment cost vs growing history ---------------------
# The O(increment) claim for the PERSISTED path (SpanHashStore):
# ingest increments of constant size while the store's history
# doubles; per-increment wall-clock must stay flat-to-slowly-growing
# (the probe is one equi-join against the hash set; history enters
# only as the join's build side).
import shutil

from pyspark.sql import functions as SF

from mongo2pq_spark.plans.spanstore import SpanHashStore

ROOT = "/tmp/span_drive_store"
shutil.rmtree(ROOT, ignore_errors=True)
store = SpanHashStore(ROOT, "docs")
print("-- series: store (constant 5k-doc increments, growing history)",
      flush=True)
# runs to history 4x the first non-empty point (r13: the probe must
# stay flat now that it equi-joins the index instead of re-
# distincting it — VERDICT r12 #3)
for inc in range(1, 6):
    batch = base.select(
        (F.col("doc_id") + inc * offset).alias("doc_id"),
        # from inc2 on, the even half carries the UNSUFFIXED corpus
        # text — identical across increments, so from inc3 on it is a
        # re-crawl of inc2's history and must be cut; the odd half is
        # unique to this increment (inc-suffixed tokens)
        F.when(
            (F.col("doc_id") % 2 == 0) & F.lit(inc > 1),
            F.col("text"),
        )
        .otherwise(
            SF.regexp_replace(F.col("text"), r"(\S+)", f"$1_i{inc}")
        )
        .alias("text"),
    )
    t0 = time.time()
    res = store.process_increment(spark, batch)
    res.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    cut = res.filter(F.col("n_kept") < F.col("n_tokens")).count()
    print(
        f"store inc{inc} ({n_base} docs, history {inc - 1} batches): "
        f"{dt:.1f}s ({cut} docs had spans cut)",
        flush=True,
    )
