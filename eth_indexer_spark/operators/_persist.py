"""Bounded persist pool shared by operators that cache an intermediate frame.

Several operators persist a CPU-heavy intermediate consumed more than once in
the same plan (hashed shingles in the dedup family, the upstream frame in
``prefix_sum(reuse_upstream=True)``). A bare ``df.persist()`` with no
unpersist accumulates one cache entry per CALL for the session lifetime —
benchmark loops and long-lived ingest sessions leak executor storage memory.

This pool keeps AT MOST ONE persisted frame per named call site: each new
call through :func:`persist_bounded` releases the site's previous entry
first. Releasing early is always safe for every participating site — the
lineages are deterministic (pure hash/shingle expressions, literal
boundaries), so a consumer that recomputes an evicted frame reproduces
identical output; eviction costs time, never correctness.
"""

from __future__ import annotations

import threading

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_POOL: dict[str, DataFrame] = {}
_LOCK = threading.Lock()


def _same_plan(a: DataFrame, b: DataFrame) -> bool:
    """True when the two frames' analyzed plans produce the same result —
    the condition under which Spark's CacheManager deduplicates them onto
    ONE cache entry."""
    if a is b:
        return True
    try:
        return bool(
            a._jdf.queryExecution()
            .analyzed()
            .sameResult(b._jdf.queryExecution().analyzed())
        )
    except Exception:
        return False


def _is_cached(df: DataFrame) -> bool:
    lvl = df.storageLevel
    return bool(lvl.useMemory or lvl.useDisk)


def _safe_unpersist(frame: DataFrame) -> None:
    """Unpersist ``frame`` ONLY if no frame still registered in the pool
    shares its CacheManager entry (same object or same plan) — two sites
    can legitimately hold same-plan frames (e.g. the substring scrub and
    its span-audit sibling over the same corpus), and Spark deduplicates
    them onto ONE cache entry; dropping it through one site would leave
    the other site's consumers silently recomputing."""
    with _LOCK:
        remaining = list(_POOL.values())
    if any(r is frame or _same_plan(r, frame) for r in remaining):
        return
    frame.unpersist(blocking=False)


def persist_bounded(
    site: str,
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist ``df`` and register it under ``site``, releasing the site's
    previous frame (if any). Swap happens atomically under the lock; the
    unpersist runs outside it so concurrent callers cannot double-release.

    Same-plan care — POOL-WIDE: Spark's CacheManager deduplicates persists
    by logical plan across call sites, so a new frame whose plan matches
    ANY pooled frame (same site on a repeated call, or a sibling operator
    over the same input) resolves to that frame's cache entry.
    Unpersisting such a shared entry through one site would leave every
    other holder silently recomputing the "cached" lineage (observed as a
    4-20× slowdown in benchmark loops). So: a same-plan still-cached frame
    anywhere in the pool is reused outright, and no frame is unpersisted
    while another pooled frame shares its entry."""
    with _LOCK:
        previous = _POOL.get(site)
        others = [f for s, f in _POOL.items() if s != site]
    for f in others:
        if _same_plan(f, df) and _is_cached(f):
            with _LOCK:
                _POOL[site] = f
            if previous is not None and previous is not f:
                _safe_unpersist(previous)
            return f  # share the sibling site's entry
    if previous is not None and _same_plan(previous, df):
        if _is_cached(previous):
            return previous  # one shared entry — nothing to swap
        df = previous  # re-persist the registered frame (entry was cleared)
    df = df.persist(level)
    with _LOCK:
        prev2 = _POOL.get(site)
        _POOL[site] = df
    if prev2 is not None and prev2 is not df:
        _safe_unpersist(prev2)
    return df


def release_persisted(site: str | None = None) -> None:
    """Drop the frame cached for ``site``, or every pooled frame when
    ``site`` is None. A frame whose cache entry another still-registered
    site shares (same plan) is deregistered but not unpersisted."""
    with _LOCK:
        if site is None:
            frames = list(_POOL.values())
            _POOL.clear()
        else:
            f = _POOL.pop(site, None)
            frames = [f] if f is not None else []
    for f in frames:
        _safe_unpersist(f)


def pooled_sites() -> list[str]:
    """Currently-cached site names (for tests / diagnostics)."""
    with _LOCK:
        return sorted(_POOL)
