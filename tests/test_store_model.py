"""Model-based randomized test of the store's visibility protocol.

A seeded random sequence of mutations (overwrite-by-range writes,
retractions, version_hold groups) runs against BOTH the real ParquetStore
and a trivial sequential Python model of the contract:

- visible rows after each op == model rows (overwrite-by-range semantics),
- read_version == the model's committed boundary (advance after batch,
  rewind before retraction, held advances deferred to clean hold exit),
- rewind epoch increments exactly when a PUBLISHED boundary rewinds,
- a snapshot pinned mid-sequence: guarded reads either return exactly the
  model state at pin time, or raise SnapshotRetractedError — iff a
  published rewind happened since the pin. Never a silent mix.

The scenario tests (test_sink.py) pin each mechanism individually; this
sweeps their interleavings, which is where protocol bugs live.
Reference scope: the MySQL transaction/isolation semantics this re-derives
are store/store.go:115-173 and the reorg delete path store/store.go:129-139.
"""

from __future__ import annotations

import random

import pytest

from eth_indexer_spark.sinks.store import SnapshotRetractedError

from tests.test_sink import headers_df


class StoreModel:
    """Sequential model of one block-keyed table + version/epoch pointer."""

    def __init__(self):
        self.blocks: set[int] = set()
        self.version: int | None = None
        self.epoch = 0
        self.hold_depth = 0
        self.pending: int | None = None
        self.hold_floor_active = False  # a VERSION_HOLD.json exists
        self.hold_floor: int | None = None

    def _rewind_below(self, lo: int) -> None:
        if self.version is not None and self.version >= lo:
            self.version = lo - 1
            self.epoch += 1
        if self.pending is not None and self.pending >= lo:
            self.pending = lo - 1
        if self.hold_depth > 0:
            if self.hold_floor is None or self.hold_floor >= lo:
                self.hold_floor = lo - 1

    def _advance(self, hi: int) -> None:
        if self.hold_depth > 0:
            self.pending = hi if self.pending is None else max(self.pending, hi)
            return
        if self.hold_floor_active and self.hold_floor is not None:
            hi = min(hi, self.hold_floor)
        if self.version is None or hi > self.version:
            self.version = hi

    def write(self, lo: int, hi: int) -> None:
        # marker-carrying batch: advances to max(pre-batch boundary, hi) —
        # a below-head overwrite restores the boundary once committed
        pre = self.version
        self._rewind_below(lo)
        self.blocks |= set(range(lo, hi + 1))
        self._advance(hi if pre is None else max(hi, pre))

    def delete(self, lo: int, hi: int) -> None:
        self._rewind_below(lo)
        self.blocks -= set(range(lo, hi + 1))

    def hold_enter(self) -> None:
        self.hold_depth += 1
        if self.hold_depth == 1:
            if not self.hold_floor_active:
                self.hold_floor = None
            self.hold_floor_active = True

    def hold_exit_clean(self) -> None:
        self.hold_depth -= 1
        if self.hold_depth == 0:
            pending = self.pending
            self.pending = None
            self.hold_floor_active = False
            self.hold_floor = None
            if pending is not None and (self.version is None or pending > self.version):
                self.version = pending


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_store_protocol_matches_model_under_random_interleavings(spark, tmp_path, seed):
    from eth_indexer_spark.sinks.store import ParquetStore

    rng = random.Random(seed)
    store = ParquetStore(spark, str(tmp_path / "store"), bucket_size=10)
    model = StoreModel()
    snap = None
    snap_state: tuple[set[int], int | None, int] | None = None

    def visible() -> set[int]:
        if not store.exists("block_headers"):
            return set()
        return {r["number"] for r in store.read("block_headers").collect()}

    # seed the store so ranges overlap interestingly
    store.write_blocks({"block_headers": headers_df(spark, range(100, 110))})
    model.write(100, 109)

    for step in range(14):
        op = rng.choice(["write", "write", "delete", "hold_write", "pin", "probe"])
        if op == "write":
            lo = rng.randrange(100, 125)
            hi = lo + rng.randrange(0, 6)
            store.write_blocks(
                {"block_headers": headers_df(spark, range(lo, hi + 1))},
                block_range=(lo, hi),
            )
            model.write(lo, hi)
        elif op == "delete":
            if not model.blocks:
                continue
            lo = rng.choice(sorted(model.blocks))
            hi = lo + rng.randrange(0, 4)
            store.delete_block_range("block_headers", lo, hi)
            model.delete(lo, hi)
        elif op == "hold_write":
            lo = rng.randrange(100, 120)
            hi = lo + rng.randrange(0, 4)
            with store.version_hold():
                model.hold_enter()
                store.write_blocks(
                    {"block_headers": headers_df(spark, range(lo, hi + 1))},
                    block_range=(lo, hi),
                )
                model.write(lo, hi)
            model.hold_exit_clean()
        elif op == "pin":
            snap = store.snapshot()
            snap_state = (set(model.blocks), model.version, model.epoch)
        elif op == "probe" and snap is not None:
            assert snap_state is not None
            pinned_blocks, pinned_version, pinned_epoch = snap_state
            try:
                rows = {
                    r["number"]
                    for r in snap.collect(snap.read("block_headers"))
                }
            except SnapshotRetractedError:
                assert model.epoch != pinned_epoch, (
                    f"step {step}: guard raised without a published rewind"
                )
            else:
                assert model.epoch == pinned_epoch, (
                    f"step {step}: rewind since pin but guarded read passed"
                )
                want = (
                    pinned_blocks
                    if pinned_version is None
                    else {b for b in pinned_blocks if b <= pinned_version}
                )
                assert rows == want, f"step {step}"

        # live invariants after every op
        assert visible() == model.blocks, f"step {step} ({op})"
        assert store.read_version() == model.version, f"step {step} ({op})"
        assert store.read_rewind_epoch() == model.epoch, f"step {step} ({op})"
