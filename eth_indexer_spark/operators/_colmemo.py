"""Process-wide memo for expensive-to-BUILD Column expression trees.

Building a large Column tree costs one py4j round trip per Column API call
(~0.2-0.6 ms each): the Gopher rule battery is ~1200 round trips (~0.3 s of
driver time), the shingle kernels ~100-300 each — and the engine's query
functions rebuild those identical trees on EVERY query construction, which
the bench (and any real caller issuing repeated queries) pays per call.

A PySpark ``Column`` is an immutable wrapper over an UNRESOLVED JVM
expression tree: it references column NAMES, not a DataFrame or session, so
the same object can be reused across plans, queries and sessions within one
process (the py4j gateway — and with it the JVM expression objects — outlives
``SparkSession.stop()``; pyspark launches one JVM per driver process).
Memoizing the finished tree by its builder parameters turns every rebuild
after the first into a dict hit — the construction-time analog of a prepared
statement. Execution plans are bit-identical: the memo changes where the
tree is built, never its shape.

Only hashable, value-like keys are accepted; builders taking a live Column
input must bypass the memo (the tree then depends on an object identity).
"""

from __future__ import annotations

from typing import Callable, Hashable

from pyspark.sql import Column

_MEMO: dict[Hashable, object] = {}


def memo_col(key: Hashable, build: Callable[[], object]):
    """Return the memoized expression tree for ``key``, building it once.

    ``build`` may return a single Column or any picklable-shaped container
    of Columns (tuple/dict) — the caller treats the result as immutable.
    """
    hit = _MEMO.get(key)
    if hit is None:
        hit = _MEMO[key] = build()
    return hit


def clear_col_memo() -> None:
    """Drop every memoized tree (test hook; also the escape hatch if a
    caller ever kills the py4j gateway itself)."""
    _MEMO.clear()
