"""Bounded cache registry for multi-consumer streams.

Catalyst has no cross-branch common-subexpression elimination, and
(verified empirically) exchange reuse does not fire across the
alias-renamed sides of a self-join — so a computed stream feeding k
consumers executes k times unless persisted. The contract that keeps
persists from ACCUMULATING across a long-running session: each
`cache_stream` call evicts the OLDEST registered cache beyond a
capacity of ``_MAX_LIVE``, UNLESS a live cache is semantically the
same plan (`df.sameSemantics`), in which case it is returned as-is —
repeated invocations of the same operator (a pairs query followed by
a clusters query built on the same pairs, a bench repeat, a retried
shard) hit the warm cache instead of recomputing. Capacity must cover
cache NESTING (a query may cache an operator RESULT whose plan
contains the operator's own internally cached sub-stream —
semdedup_prune's assignment under semdedup_prune_consistency's
result, the r11 case that forced a floor of 2: with capacity 1 the
outer registration evicted the inner cache before the outer ever
materialized, and the assignment subtree recomputed per branch of the
outer plan, measurably SLOWER than no outer cache at all) and the
widest real consumer graph (see ``_MAX_LIVE``). At most ``_MAX_LIVE``
streams are resident between calls — O(1), not O(#queries);
`release_caches()` empties even those.

The memo is keyed by the logical plan, so like Spark's own
CacheManager it assumes the underlying source files do not change
between calls. Not safe for two interleaved lazy queries (the second
build would release the first's cache mid-flight); the driver/bench
run queries strictly one at a time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE_CACHES: list[DataFrame] = []

#: max resident cached streams — still O(1), sized to the widest REAL
#: consumer graph instead of the minimum nesting depth: the
#: generation-management composition (pipeline_generation_resplit)
#: legitimately holds four streams to the terminal action (status
#: diff, gen-A bands, increment bands, gen-A pairs); with capacity 2
#: the first two were evicted before anything materialized and the
#: 5-consumer snapshot-diff subtree re-executed per consumer
#: (measured r18: the query spent ~40% of its wall re-deriving
#: evicted streams). Eviction remains FIFO with sameSemantics reuse.
_MAX_LIVE = 4


def release_caches() -> None:
    """Unpersist every stream cached by a prior operator call."""
    while _LIVE_CACHES:
        _LIVE_CACHES.pop().unpersist(False)


def cache_stream(df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK) under the bounded contract
    documented in the module docstring."""
    from pyspark.storagelevel import StorageLevel

    for live in _LIVE_CACHES:
        if live.sameSemantics(df):
            # refresh recency: a just-reused stream must not be the
            # next eviction victim
            _LIVE_CACHES.remove(live)
            _LIVE_CACHES.append(live)
            return live
    while len(_LIVE_CACHES) >= _MAX_LIVE:
        # FIFO: the oldest stream is the one least likely to be a
        # live sub-plan of the stream being registered now
        _LIVE_CACHES.pop(0).unpersist(False)
    cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    _LIVE_CACHES.append(cached)
    return cached
