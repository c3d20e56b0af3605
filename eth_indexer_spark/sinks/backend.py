"""Store backend seam: the abstract contract between the engine and its
storage layer.

Everything above the sink — operators, plans, pipeline, streaming — talks to
the store through exactly this surface: six mutation entry points, a small
read surface, and the two consistency primitives (``snapshot`` /
``version_hold``). :class:`~eth_indexer_spark.sinks.store.ParquetStore` is
the local-FS implementation (bucket-partitioned parquet + manifest protocol
+ VERSION pointer); :class:`~eth_indexer_spark.sinks.logstore.LogStore` is
the MVCC implementation (commit-log over immutable files, the public Delta
Lake design) that supplies real snapshot isolation — closing the documented
reorg-rewind read race by prevention instead of detection, and replacing
the single-writer flock with optimistic multi-writer concurrency — without
touching a single operator: the ingest lifecycle tests run parametrized
over both backends (README "Deployment posture", SURVEY §known-deviations).

What is deliberately NOT here: parquet-layout extras (``bucket_values``,
``path``, ``compact``, ``buckets_needing_compaction``, ``delete_block_range``,
``append_blocks``) — maintenance and physical-layout concerns a lakehouse
backend replaces wholesale (OPTIMIZE, partition evolution, time travel).
Engine code outside the sink must not call them; ``tests/test_sink.py``
asserts the engine's call surface stays inside this contract.

Reference scope note: the reference's store interface is the Go ``Store``
per-table managers behind one ``store.Manager`` (store/store.go:30-113);
this seam is its engine-facing equivalent, with the DB transaction scope
re-expressed as ``snapshot``/``version_hold``.
"""

from __future__ import annotations

import abc
from typing import ContextManager, Iterable

from pyspark.sql import DataFrame


class StoreBackend(abc.ABC):
    """Abstract storage backend (see module docstring).

    Implementations must guarantee, in whatever mechanism fits the format:

    - **Atomic multi-table batches**: a ``write_blocks`` batch becomes
      visible to ``snapshot()`` readers all-or-nothing, in block order.
    - **Idempotent replay**: re-writing an already-committed batch (same
      block range) converges to the same state — crash recovery is replay.
    - **Monotone-except-retraction versioning**: ``read_version()`` is the
      committed batch boundary; ``retract_blocks`` moves it down before any
      retracted row disappears, everything else only moves it up.
    - **Delta appends are exactly-once by key**: ``append_dimension_delta``
      with an existing ``delta`` key is a no-op.
    """

    # -- read surface --------------------------------------------------------

    @abc.abstractmethod
    def exists(self, table: str) -> bool: ...

    @abc.abstractmethod
    def read(self, table: str) -> DataFrame: ...

    @abc.abstractmethod
    def read_range(
        self, table: str, lo: int | None = None, hi: int | None = None
    ) -> DataFrame:
        """Block-keyed slice ``lo <= block <= hi``; implementations must
        prune (partitions, files, or row groups) — this is the hot path."""

    @abc.abstractmethod
    def read_eq(self, table: str, number: int) -> DataFrame: ...

    @abc.abstractmethod
    def max_block(self, table: str) -> int | None: ...

    @abc.abstractmethod
    def read_deltas(self, table: str) -> DataFrame:
        """All delta partitions of a delta-append table, with the delta key
        as an ``ingest_delta`` column."""

    @abc.abstractmethod
    def read_version(self) -> int | None: ...

    @abc.abstractmethod
    def read_rewind_epoch(self) -> int:
        """Monotone count of boundary rewinds (reorg retractions) — a
        backend with real MVCC snapshots may return a constant 0, its
        readers can never observe a retraction mid-read."""

    @abc.abstractmethod
    def snapshot(self):
        """A read view pinned at the current committed boundary, exposing
        this same read surface plus ``check``/``guard``/``collect``."""

    # -- mutation entry points (the six) --------------------------------------

    @abc.abstractmethod
    def write_blocks(
        self,
        tables: dict[str, DataFrame],
        block_range: tuple[int, int] | None = None,
    ) -> None: ...

    @abc.abstractmethod
    def retract_blocks(
        self, lo: int, hi: int, tables: Iterable[str] | None = None
    ) -> None: ...

    @abc.abstractmethod
    def update_dimension(self, table: str, df: DataFrame) -> None: ...

    @abc.abstractmethod
    def update_dimensions(self, tables: dict[str, DataFrame]) -> None: ...

    @abc.abstractmethod
    def append_dimension(self, table: str, df: DataFrame) -> None: ...

    @abc.abstractmethod
    def append_dimension_delta(self, table: str, df: DataFrame, delta: str) -> None: ...

    # -- consistency grouping --------------------------------------------------

    @abc.abstractmethod
    def version_hold(self) -> ContextManager[None]:
        """Group several mutations into one snapshot transition."""
