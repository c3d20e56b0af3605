#!/usr/bin/env python
"""Ingest-throughput benchmark: drive a synthetic chain through the full
EP1 lifecycle (source → reward/event/fee/balance/total pipeline → idempotent
partitioned sink) in 50-block micro-batches and report blocks/second.

The reference's implied throughput floor is head-following Ethereum mainnet:
~1 block / 13 s (BASELINE.md). This measures the same end-to-end unit —
block accepted, all derived tables committed — on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "ingest_blocks_per_sec", "value": N, "blocks": B, ...}

Not part of the driver's bench.py contract — run manually:
  python bench_ingest.py [n_blocks]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import shutil
import sys
import tempfile
import time
from datetime import datetime, timezone

import pandas as pd

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

_ap = argparse.ArgumentParser()
_ap.add_argument("n_blocks", nargs="?", type=int, default=500)
_ap.add_argument(
    "--preseed", type=int, default=0,
    help="ingest this many UNTIMED history blocks first (large batches), so "
    "the timed run starts against a store with pre-existing history — the "
    "write-path analog of the read side's decade proof: per-batch time must "
    "not depend on how much history the store already holds",
)
_ap.add_argument(
    "--preseed-batch", type=int, default=1000,
    help="micro-batch size for the preseed phase (large to amortize the "
    "fixed per-batch Spark overhead; the TIMED phase always uses the "
    "contract batch size)",
)
_ap.add_argument("--batch", type=int, default=50, help="timed micro-batch size")
_ap.add_argument(
    "--settle-every", type=int, default=0,
    help="System.gc() between batches every N batches (0 = never): drives "
    "the ContextCleaner so replaced per-batch localCheckpoint/persist "
    "blocks release deterministically — the idle time a head-following "
    "daemon gets for free between 13 s blocks, which this tight loop "
    "otherwise never yields",
)
_ap.add_argument(
    "--backend", choices=("parquet", "log"), default="parquet",
    help="store backend under test: 'parquet' = rename-protocol "
    "ParquetStore (bucket dirs + version pointer), 'log' = MVCC commit-log "
    "LogStore — the decade protocol must qualify BOTH (r8 verdict #1: the "
    "backend that closes the semantic deltas was correctness-proven but "
    "never timed)",
)
_ap.add_argument(
    "--maintain-every", type=int, default=0,
    help="every N timed batches, run the LogStore maintenance cadence "
    "(optimize the ingest tables + vacuum) INSIDE the loop — a deployment "
    "compacts micro-batch residue continuously, so its cost belongs in the "
    "measured blocks/s, not in a separate idealized run. Timed separately "
    "in maintain_secs; ignored on --backend parquet (bucket dirs don't "
    "accumulate commit-log residue)",
)
_ap.add_argument(
    "--gc-log", default="",
    help="write JVM unified GC logging (-Xlog:gc*) to this file — "
    "correlate major-GC timestamps against the batch_secs trace to "
    "attribute the bounded within-session transients (r8 open item)",
)
# parse the REAL argv only when run as a script: importers (ab_ingest_order,
# bench_store_queries reuse build_chain) have their own argv and flags
_args = _ap.parse_args() if __name__ == "__main__" else _ap.parse_args([])

N_BLOCKS = _args.n_blocks
BATCH = _args.batch
PRESEED = _args.preseed
PRESEED_BATCH = _args.preseed_batch
SETTLE_EVERY = _args.settle_every
BACKEND = _args.backend
MAINTAIN_EVERY = _args.maintain_every
GC_LOG = _args.gc_log
N_ADDRS = 200          # address universe
N_SUBS = 100           # subscribed addresses
TXS_PER_BLOCK = 4
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

# the tables the ingest loop writes every batch — the ones whose
# micro-batch file residue the maintenance cadence compacts. Single source
# of truth: scripts/ab_ingest_order.py and scripts/bench_store_queries.py
# import these, so adding an ingest table cannot silently leave one bench
# maintaining (and therefore measuring) a different table set.
MAINTAIN_TABLES = (
    "block_headers",
    "transactions",
    "receipts",
    "transfers",
    "balances",
    "total_balances",
)


def maintain_store(store) -> float:
    """One optimize+vacuum maintenance cadence over the ingest tables
    (LogStore backend); returns elapsed seconds."""
    tm = time.perf_counter()
    for t in MAINTAIN_TABLES:
        if store.exists(t):
            store.optimize(t)
    store.vacuum()
    return time.perf_counter() - tm


def build_chain(n_blocks: int, seed: int = 7):
    rng = random.Random(seed)
    addrs = [f"{i:040x}" for i in range(1, N_ADDRS + 1)]
    token = "ab" * 20
    now = datetime(2024, 1, 1, tzinfo=timezone.utc).replace(tzinfo=None)
    sig = "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"

    headers, txs, receipts, logs = [], [], [], []
    for n in range(1, n_blocks + 1):
        h = f"{n:064x}"
        headers.append({
            "hash": h, "parent_hash": f"{n-1:064x}", "uncle_hash": "00" * 32,
            "coinbase": rng.choice(addrs), "root": "11" * 32, "tx_hash": "22" * 32,
            "receipt_hash": "33" * 32, "difficulty": 100 + n % 50, "number": n,
            "gas_limit": 8_000_000, "gas_used": 21000 * TXS_PER_BLOCK,
            "time": 1_700_000_000 + 13 * n, "extra_data": b"", "mix_digest": "44" * 32,
            "nonce": f"{n:016x}",
            "uncle1_hash": "", "uncle1_coinbase": "", "uncle1_number": None,
            "uncle2_hash": "", "uncle2_coinbase": "", "uncle2_number": None,
            "created_at": now,
        })
        cum = 0
        for t in range(TXS_PER_BLOCK):
            th = f"{n:032x}{t:032x}"
            frm, to = rng.sample(addrs, 2)
            txs.append({
                "hash": th, "block_hash": h, "from": frm, "to": to, "nonce": t,
                "gas_price": rng.randint(1, 100), "gas_limit": 42000,
                "amount": str(rng.randint(0, 10**18)), "payload": b"", "block_number": n,
            })
            cum += 21000
            receipts.append({
                "root": "55" * 32, "status": 1, "cumulative_gas_used": cum,
                "bloom": b"\x00" * 8, "tx_hash": th, "contract_address": None,
                "gas_used": 21000, "block_number": n,
            })
            if t == 0:
                f2, t2 = rng.sample(addrs, 2)
                logs.append({
                    "tx_hash": th, "block_number": n, "contract_address": token,
                    "event_name": sig,
                    "topic1": f2.rjust(64, "0"), "topic2": t2.rjust(64, "0"),
                    "topic3": None, "data": rng.randint(1, 10**20).to_bytes(32, "big"),
                    "log_index": 0,
                })
    subs = pd.DataFrame([
        {"id": i, "block_number": 0, "group": i % 4, "address": a,
         "created_at": now, "updated_at": now}
        for i, a in enumerate(addrs[:N_SUBS])
    ])
    erc20 = pd.DataFrame([
        {"address": token, "block_number": 0, "total_supply": str(10**27),
         "decimals": 18, "name": "BenchToken"}
    ])
    return (
        pd.DataFrame(headers), pd.DataFrame(txs), pd.DataFrame(receipts),
        pd.DataFrame(logs), subs, erc20,
    )


def main() -> None:
    from eth_indexer_spark.schema import RAW_SCHEMAS
    from eth_indexer_spark.session import get_spark
    from eth_indexer_spark.sinks.logstore import LogStore
    from eth_indexer_spark.sinks.store import ParquetStore
    from eth_indexer_spark.sources.blocks import PandasBlockSource
    from eth_indexer_spark.streaming.ingest import BlockIngestor

    extra = (
        {"spark.driver.extraJavaOptions": f"-Xlog:gc*:file={GC_LOG}:time,uptime"}
        if GC_LOG
        else None
    )
    spark = get_spark("bench_ingest", cpus=CPUS, extra_conf=extra)
    hdrs, txs, rec, logs, subs, erc20 = build_chain(PRESEED + N_BLOCKS)
    workdir = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        backend_cls = LogStore if BACKEND == "log" else ParquetStore
        store = backend_cls(spark, os.path.join(workdir, "store"), bucket_size=1000)
        source = PandasBlockSource(spark, hdrs, txs, rec, logs)
        ing = BlockIngestor(
            spark,
            store,
            source,
            spark.createDataFrame(subs, RAW_SCHEMAS["subscriptions"]),
            spark.createDataFrame(erc20, RAW_SCHEMAS["erc20"]),
        )
        header_dicts = [r.to_dict() for _, r in hdrs.iterrows()]

        preseed_secs = 0.0
        if PRESEED:
            tp = time.perf_counter()
            for i in range(0, PRESEED, PRESEED_BATCH):
                ing.process_headers(header_dicts[i : i + PRESEED_BATCH])
            preseed_secs = time.perf_counter() - tp
            print(
                f"# preseed: {PRESEED} blocks in {preseed_secs:.1f}s "
                f"(batch={PRESEED_BATCH}); timed run starts against "
                f"{PRESEED}-block history",
                file=sys.stderr,
            )

        def maintain() -> float:
            return maintain_store(store)

        preseed_maintain_sec = 0.0
        if PRESEED and MAINTAIN_EVERY and BACKEND == "log":
            # maintain once after the preseed, UNTIMED: a deployment that
            # runs the cadence from day one never faces an unmaintained
            # backlog, so the timed loop should not pay the one-off
            # O(accumulated) compaction of preseed residue either (r9
            # verdict "What's wrong #2": first cadence 45.6 s vs 5-11 s
            # steady state). The cost is still reported for honesty.
            preseed_maintain_sec = maintain()
            print(
                f"# preseed maintenance: {preseed_maintain_sec:.1f}s "
                f"(untimed; compacts preseed micro-file residue)",
                file=sys.stderr,
            )

        timed = header_dicts[PRESEED:]
        batch_secs: list[float] = []
        batch_starts: list[float] = []  # epoch secs: aligns with GC-log stamps
        maintain_secs: list[float] = []
        t0 = time.perf_counter()
        for bi, i in enumerate(range(0, len(timed), BATCH)):
            if SETTLE_EVERY and bi and bi % SETTLE_EVERY == 0:
                spark.sparkContext._jvm.System.gc()
            if (
                MAINTAIN_EVERY
                and BACKEND == "log"
                and bi
                and bi % MAINTAIN_EVERY == 0
            ):
                maintain_secs.append(maintain())
            batch_starts.append(time.time())
            tb = time.perf_counter()
            ing.process_headers(timed[i : i + BATCH])
            batch_secs.append(time.perf_counter() - tb)
        elapsed = time.perf_counter() - t0
        # O(batch) evidence: per-batch time must stay FLAT as stored history
        # grows — an O(history) stage (state re-seed, index rebuild, version
        # bookkeeping) would show the last quarter's batches slower than the
        # first quarter's. Reported as a ratio; ~1.0 = flat.
        q = max(1, len(batch_secs) // 4)
        q1 = sum(batch_secs[:q]) / q
        q4 = sum(batch_secs[-q:]) / q

        n_rows = {
            t: store.read(t).count()
            for t in ("block_headers", "transfers", "balances", "total_balances")
        }
        assert n_rows["block_headers"] == PRESEED + N_BLOCKS
        print(
            json.dumps(
                {
                    "metric": "ingest_blocks_per_sec",
                    "value": round(N_BLOCKS / elapsed, 2),
                    "unit": "blocks/sec",
                    "blocks": N_BLOCKS,
                    "batch": BATCH,
                    "elapsed_sec": round(elapsed, 2),
                    "batch_sec_first_quarter": round(q1, 3),
                    "batch_sec_last_quarter": round(q4, 3),
                    # None rather than a crash when the first quarter is
                    # ~instant (tiny BATCH on a fast disk): the ratio is
                    # meaningless below timer resolution anyway
                    "flatness_q4_over_q1": (
                        round(q4 / q1, 3) if q1 > 1e-6 else None
                    ),
                    "rows": n_rows,
                    "preseed_blocks": PRESEED,
                    "settle_every": SETTLE_EVERY,
                    "backend": BACKEND,
                    "maintain_every": MAINTAIN_EVERY,
                    "maintain_secs": [round(s, 2) for s in maintain_secs],
                    "preseed_maintain_sec": round(preseed_maintain_sec, 2),
                    "batch_secs": [round(s, 2) for s in batch_secs],
                    "batch_starts_epoch": [round(s, 2) for s in batch_starts],
                    "gc_log": GC_LOG or None,
                    "cpus": CPUS,
                }
            )
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
