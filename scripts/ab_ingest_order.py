#!/usr/bin/env python
"""Same-session, order-counterbalanced ingest A/B over both store backends
(r9 verdict "Next round #1" / "Missing #3").

Round 9 left the backend write-path ranking UNRECONCILED across artifacts:
STOREQ_r09's same-session ingests measured LogStore 36% FASTER (759 vs
1,189 s / 3,000 blocks, batch=1000) while the cross-session decade headlines
rank it slower (3.83 vs 4.39 blocks/s, batch=50) — and bench_store_queries
always ran parquet FIRST, handing parquet the JIT/codegen warm-up penalty.
Two confounds: session/host (different JVMs, possibly different host load)
and order (first leg pays one-time JIT).

This script removes both: ONE Spark session runs four ingest legs in an
ABBA sequence (parquet, log, log, parquet by default), each into a fresh
store root over the SAME prebuilt chain. Averaging the two legs per backend
cancels the order effect to first order; the session is shared so the host
is identical. The LogStore legs run the r9 decade maintenance cadence
(optimize+vacuum every --maintain-every batches) inside the timed loop —
that cost is part of owning the backend.

Per-batch cost is history-independent on both backends (r8/r9 decade runs,
flatness 0.82-0.92), so the legs run WITHOUT a preseed: the backend RANKING
at zero history is the ranking at any history depth.

Usage:
    python scripts/ab_ingest_order.py [n_blocks] [--batch 50] [--order ABBA]

Prints ONE JSON line with per-leg and per-backend results.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ap = argparse.ArgumentParser()
ap.add_argument("n_blocks", nargs="?", type=int, default=1000)
ap.add_argument("--batch", type=int, default=50)
ap.add_argument(
    "--order",
    default="ABBA",
    help="leg sequence, A=parquet B=log (ABBA counterbalances the "
    "first-leg JIT warm-up; BAAB swaps which backend pays it)",
)
ap.add_argument("--maintain-every", type=int, default=10)
args = ap.parse_args()
ORDER = args.order.strip().upper()
if not ORDER or set(ORDER) - {"A", "B"}:
    # anything but A/B must be LOUD: a stray char silently mapped to a log
    # leg would corrupt the per-backend means the A/B adjudication rests on
    ap.error(f"--order must be a non-empty string over {{A,B}}, got {args.order!r}")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def main() -> None:
    from bench_ingest import build_chain, maintain_store
    from eth_indexer_spark.schema import RAW_SCHEMAS
    from eth_indexer_spark.session import get_spark
    from eth_indexer_spark.sinks.logstore import LogStore
    from eth_indexer_spark.sinks.store import ParquetStore
    from eth_indexer_spark.sources.blocks import PandasBlockSource
    from eth_indexer_spark.streaming.ingest import BlockIngestor

    spark = get_spark("ab_ingest_order", cpus=CPUS)
    hdrs, txs, rec, logs, subs, erc20 = build_chain(args.n_blocks)
    header_dicts = [r.to_dict() for _, r in hdrs.iterrows()]
    source = PandasBlockSource(spark, hdrs, txs, rec, logs)
    subs_df = spark.createDataFrame(subs, RAW_SCHEMAS["subscriptions"])
    erc20_df = spark.createDataFrame(erc20, RAW_SCHEMAS["erc20"])
    workdir = tempfile.mkdtemp(prefix="ab_ingest_")
    legs = []
    try:
        for li, code in enumerate(ORDER):
            name, cls = (
                ("parquet", ParquetStore) if code == "A" else ("log", LogStore)
            )
            store = cls(
                spark, os.path.join(workdir, f"leg{li}_{name}"), bucket_size=1000
            )
            ing = BlockIngestor(spark, store, source, subs_df, erc20_df)
            batch_secs, maintain_secs = [], []
            t0 = time.perf_counter()
            for bi, i in enumerate(range(0, args.n_blocks, args.batch)):
                if (
                    name == "log"
                    and args.maintain_every
                    and bi
                    and bi % args.maintain_every == 0
                ):
                    maintain_secs.append(round(maintain_store(store), 2))
                tb = time.perf_counter()
                ing.process_headers(header_dicts[i : i + args.batch])
                batch_secs.append(time.perf_counter() - tb)
            elapsed = time.perf_counter() - t0
            assert store.read("block_headers").count() == args.n_blocks
            legs.append(
                {
                    "leg": li,
                    "backend": name,
                    "elapsed_sec": round(elapsed, 2),
                    "blocks_per_sec": round(args.n_blocks / elapsed, 2),
                    "batch_secs": [round(s, 2) for s in batch_secs],
                    "maintain_secs": maintain_secs,
                }
            )
            print(
                f"# leg {li} {name}: {elapsed:.1f}s "
                f"({args.n_blocks / elapsed:.2f} blocks/s)",
                file=sys.stderr,
            )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    by_backend: dict[str, dict] = {}
    for b in ("parquet", "log"):
        mine = [l for l in legs if l["backend"] == b]
        if mine:
            mean = sum(l["elapsed_sec"] for l in mine) / len(mine)
            by_backend[b] = {
                "legs": [l["leg"] for l in mine],
                "mean_elapsed_sec": round(mean, 2),
                "mean_blocks_per_sec": round(args.n_blocks / mean, 2),
            }
    print(
        json.dumps(
            {
                "metric": "ab_ingest_order",
                "blocks": args.n_blocks,
                "batch": args.batch,
                "order": ORDER,
                "maintain_every": args.maintain_every,
                "backends": by_backend,
                "legs": legs,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
