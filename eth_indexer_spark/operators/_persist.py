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


def persist_bounded(
    site: str,
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist ``df`` and register it under ``site``, releasing the site's
    previous frame (if any). Swap happens atomically under the lock; the
    unpersist runs outside it so concurrent callers cannot double-release."""
    df = df.persist(level)
    with _LOCK:
        previous = _POOL.get(site)
        _POOL[site] = df
    # persist() returns self, so re-registering the SAME object must not
    # release it — the trailing unpersist would silently uncache the frame
    # the pool still holds
    if previous is not None and previous is not df:
        previous.unpersist(blocking=False)
    return df


def release_persisted(site: str | None = None) -> None:
    """Drop the frame cached for ``site``, or every pooled frame when
    ``site`` is None."""
    with _LOCK:
        if site is None:
            frames = list(_POOL.values())
            _POOL.clear()
        else:
            f = _POOL.pop(site, None)
            frames = [f] if f is not None else []
    for f in frames:
        f.unpersist(blocking=False)


def pooled_sites() -> list[str]:
    """Currently-cached site names (for tests / diagnostics)."""
    with _LOCK:
        return sorted(_POOL)
