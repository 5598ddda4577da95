"""Round-11 second-continuation inverted-index scale drive: index an
sf0.1-scale document corpus in increments against one growing
posting-store and measure per-increment cost as indexed history grows
— the O(increment) evidence for the RETRIEVAL-index artifact (text /
image / audio / embedding near-dedup stores each got the same drive
in earlier rounds; this closes the loop for the new index store).

Fixture: the real sf0.1 documents table split into a
3k-doc corpus batch + two 1k-doc increments (sf0.1 holds 5k docs). Each increment writes
only its own batch= partition; a full-term probe after every step
verifies the merged answer equals a from-scratch index over the same
prefix (value equality, not just counts). The final step consolidates
to batch=c0 through the crash-safe swap and re-verifies the probe.
"""
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mongo2pq_spark.operators.text import (
    consolidate_inverted_index,
    query_postings,
    write_inverted_index,
)
from mongo2pq_spark.session import get_spark
from mongo2pq_spark.sources.registry import read_sf_table

ROOT = "/tmp/invindex_drive"
TERMS = ["hash", "join", "window", "sort", "merge", "spark", "stream",
         "vector", "scan", "column"]

shutil.rmtree(ROOT, ignore_errors=True)
spark = get_spark(app_name="invindex_scale_drive")
docs = read_sf_table(spark, "/root/testdata/sf0.1", "documents")
print("corpus docs:", docs.count())

inc_store = f"{ROOT}/inc"
steps = [
    ("corpus", F.col("doc_id") < 3_000),
    ("i1", (F.col("doc_id") >= 3_000) & (F.col("doc_id") < 4_000)),
    ("i2", (F.col("doc_id") >= 4_000) & (F.col("doc_id") < 5_000)),
]
cum = None
for token, pred in steps:
    t = time.time()
    write_inverted_index(docs.filter(pred), inc_store, batch_token=token)
    dt = time.time() - t
    cum = pred if cum is None else (cum | pred)
    full_store = f"{ROOT}/full_{token}"
    write_inverted_index(docs.filter(cum), full_store)
    got = sorted(
        tuple(r) for r in query_postings(spark, inc_store, TERMS).collect()
    )
    want = sorted(
        tuple(r) for r in query_postings(spark, full_store, TERMS).collect()
    )
    assert got == want, f"probe mismatch after {token}"
    print(f"increment {token}: {dt:.2f}s write, probe == from-scratch "
          f"({len(got)} postings)")

t = time.time()
consolidate_inverted_index(spark, inc_store)
print(f"consolidate: {time.time() - t:.2f}s")
got = sorted(
    tuple(r) for r in query_postings(spark, inc_store, TERMS).collect()
)
assert got == want, "probe changed after consolidation"
print("post-consolidation probe unchanged — drive PASSED")
