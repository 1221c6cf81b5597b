"""Session-scoped registry of persisted relations (VERDICT r4 item 5).

Several operators persist an intermediate that feeds multiple branches
of a still-lazy result (e.g. ``containment_dedup``'s shingle relation,
used by the sizes aggregate AND both sides of the intersection
self-join). The operator cannot unpersist before returning — the caller
hasn't materialized anything yet — so in a long-lived session running
hundreds of queries those cache entries accumulate. ``track`` records
every such persist; hosts (bench loops, the oracle gate, tests) call
``release_tracked`` between queries to drop them.

Executor-memory note for the 100 TB posture: tracked relations persist
at MEMORY_AND_DISK, so an oversized intermediate spills rather than
OOMs, and Spark's LRU block eviction bounds the damage even if a host
never calls ``release_tracked`` — the registry makes cleanup
deterministic instead of best-effort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK) and register it for release."""
    df.persist(StorageLevel.MEMORY_AND_DISK)
    _TRACKED.append(df)
    return df


def release_tracked(blocking: bool = False) -> int:
    """Unpersist every tracked relation; returns how many were dropped.
    Safe to call at any time — lazily-defined results recompute from
    lineage if re-executed afterward. ``blocking=True`` waits for block
    removal (tests assert on cache counts; production hosts keep the
    async default)."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n
