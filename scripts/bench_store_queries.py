#!/usr/bin/env python
"""EP3 registry-query timing over BOTH store backends (r8 verdict #1).

The ParquetStore's bucket-pruned point/range reads were qualified in earlier
rounds; the LogStore closes the semantic deltas but its READ surface had
zero performance evidence. This times the same StoreQueries calls over the
same ingested data on both backends, so the comparison is apples-to-apples:

  latest_header     T1: max_block + top-range read (log: zero-job stats)
  header_by_number  P2: stats/bucket-pruned point read
  headers_in_range  P2: pruned range scan
  find_account      as-of point lookup (range-pruned balances read)
  find_total_balance J2 as-of over total_balances

Each query is median of 5 (after a warm-up rep) to a driver-side action.
Run SOLO — concurrent Spark JVMs give 2-5x timing noise.

The per-backend `_ingest_sec` is reported for context only: the backends
ingest in a FIXED order here (parquet first), so the first leg carries the
session's JIT warm-up and the ranking is not interpretable. The
write-path ranking question is owned by `scripts/ab_ingest_order.py`
(order-counterbalanced, both leg orders — AB_INGEST_r10.json adjudicated
the backends equivalent within noise). The READ comparisons are unbiased:
every query is warmed before its reps, and STOREQ_r10 showed parquet
reads unchanged vs r9 (the same-session control) while log reads halved.

Prints ONE JSON line:
  {"metric": "store_queries_sec", "backends": {"parquet": {...}, "log": {...}},
   "blocks": N, ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_BLOCKS = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
INGEST_BATCH = 1000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def main() -> None:
    from bench_ingest import build_chain, maintain_store
    from eth_indexer_spark.plans.queries import StoreQueries
    from eth_indexer_spark.schema import ETH_TOKEN, RAW_SCHEMAS
    from eth_indexer_spark.session import get_spark
    from eth_indexer_spark.sinks.logstore import LogStore
    from eth_indexer_spark.sinks.store import ParquetStore
    from eth_indexer_spark.sources.blocks import PandasBlockSource
    from eth_indexer_spark.streaming.ingest import BlockIngestor

    spark = get_spark("bench_store_queries", cpus=CPUS)
    # host-drift probe (same constants as bench.py), so cross-session
    # STOREQ comparisons can be normalized instead of hand-adjudicated
    from bench import _calibration

    calibration = _calibration(spark)
    hdrs, txs, rec, logs, subs, erc20 = build_chain(N_BLOCKS)
    header_dicts = [r.to_dict() for _, r in hdrs.iterrows()]
    workdir = tempfile.mkdtemp(prefix="bench_storeq_")
    results: dict[str, dict[str, float]] = {}
    try:
        for name, cls in (("parquet", ParquetStore), ("log", LogStore)):
            store = cls(spark, os.path.join(workdir, name), bucket_size=1000)
            ing = BlockIngestor(
                spark,
                store,
                PandasBlockSource(spark, hdrs, txs, rec, logs),
                spark.createDataFrame(subs, RAW_SCHEMAS["subscriptions"]),
                spark.createDataFrame(erc20, RAW_SCHEMAS["erc20"]),
            )
            t_ing = time.perf_counter()
            for i in range(0, N_BLOCKS, INGEST_BATCH):
                ing.process_headers(header_dicts[i : i + INGEST_BATCH])
            ingest_sec = time.perf_counter() - t_ing
            # maintenance before the read pass on the log backend: a
            # deployment reads a compacted table, not 100 micro-batch files
            if name == "log":
                maintain_store(store)  # the ingest-table set bench_ingest owns

            q = StoreQueries(store)
            mid = N_BLOCKS // 2
            # a (token, address) pair guaranteed to hold a balance
            row = store.read("balances").select("token", "address").limit(1).collect()
            token = row[0]["token"] if row else ETH_TOKEN
            addr = row[0]["address"] if row else "00" * 20

            def run_cases() -> dict[str, float]:
                cases = {
                    "latest_header": lambda: q.latest_header().collect(),
                    "header_by_number": lambda: q.header_by_number(mid).collect(),
                    "headers_in_range": lambda: q.headers_in_range(
                        mid, mid + 99
                    ).count(),
                    "find_account": lambda: q.find_account(
                        token, addr, mid
                    ).collect(),
                    "find_total_balance": lambda: q.find_total_balance(
                        mid, ETH_TOKEN, 1
                    ).collect(),
                }
                out: dict[str, float] = {}
                for cname, fn in cases.items():
                    fn()  # warm (codegen/JIT; file listings stay real per rep)
                    samples = []
                    for _ in range(5):
                        t0 = time.perf_counter()
                        fn()
                        samples.append(time.perf_counter() - t0)
                    samples.sort()
                    out[cname] = round(samples[len(samples) // 2], 4)
                return out

            results[name] = run_cases()
            results[name]["_ingest_sec"] = round(ingest_sec, 1)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "store_queries_sec",
                "backends": results,
                "blocks": N_BLOCKS,
                "calibration": calibration,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
